package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive "elbow" cut of a ranked result list.
  *
  * Reference: resources/embedding/rag_search.py:77-119 — over ascending
  * distances, compute consecutive diffs; cut at the first step larger than
  * max(median_step * sensitivity, minStep); keep the prefix. Returns all
  * rows when no step exceeds the threshold.
  *
  * Relational formulation: rank window → lead-diff → exact median
  * (percentile) → running cut flag. The input is a top-k list (tiny), so
  * the single-partition windows here are deliberate and safe.
  */
object Elbow {

  val DefaultSensitivity = 2.5
  val DefaultMinStep = 0.05

  /** @param ranked DataFrame with a distance column, ascending = better.
    * @param dist   distance column
    * @param tieBreak deterministic tie-break column
    */
  def cut(ranked: DataFrame, dist: Column, tieBreak: Column,
      sensitivity: Double = DefaultSensitivity,
      minStep: Double = DefaultMinStep): DataFrame = {
    val wOrder = Window.orderBy(dist, tieBreak)
    // The input is a top-k list; it feeds three consumers below (threshold,
    // cut rank, final filter). Materialize once — otherwise the whole
    // upstream query (often a corpus scan) re-executes per consumer.
    val withStep = ranked
      .withColumn("__rk", row_number().over(wOrder))
      .withColumn("__step", lead(dist, 1).over(wOrder) - dist)
      .localCheckpoint(false)
    val thr = withStep.filter(col("__step").isNotNull)
      .agg(greatest(
        expr("percentile(__step, 0.5)") * sensitivity,
        lit(minStep)).as("__thr"))
    val cutRk = withStep.crossJoin(broadcast(thr))
      .filter(col("__step") > col("__thr"))
      .agg(min(col("__rk")).as("__cut"))
    withStep.crossJoin(broadcast(cutRk))
      .filter(col("__cut").isNull || col("__rk") <= col("__cut"))
      .drop("__step", "__cut")
      .withColumnRenamed("__rk", "rank")
  }
}
