package graft.refine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fail-soft row-level error handling (SURVEY §4;
  * assets/processing/assets.py:223-263): one bad record must never kill a
  * stage. The reference try-wraps each file, logs the failure, and carries
  * per-partition failure counts in a status dict summed across partitions.
  *
  * Spark mapping: a try-wrapped kernel returns a (result, error) struct —
  * the error side-channel rides as a column; failures aggregate with a
  * plain groupBy (the reference's partial→final status roll-up is Spark's
  * partial/final agg for free).
  */
object FailSoft {

  /** Wrap a Scala kernel into a fail-soft (result, error) struct UDF. */
  def guarded[I](kernel: I => String): I => (String, String) = { in =>
    try (kernel(in), null)
    catch { case e: Exception => (null, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
  }

  /** Attach `outCol` and `outCol_error` from a guarded string kernel. */
  def withGuarded(df: DataFrame, in: Column, outCol: String,
      kernel: String => String): DataFrame = {
    val u = udf(guarded(kernel))
    df.withColumn("__g", u(in))
      .withColumn(outCol, col("__g._1"))
      .withColumn(s"${outCol}_error", col("__g._2"))
      .drop("__g")
  }

  /** Status roll-up: per-error-class counts + ok count (the reference's
    * summed status JSON, assets.py:240-263). */
  def statusRollup(df: DataFrame, errorCol: String): DataFrame =
    df.groupBy(coalesce(col(errorCol), lit("ok")).as("status"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("status"))
}
