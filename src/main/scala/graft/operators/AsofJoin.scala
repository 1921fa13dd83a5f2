package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: every left row picks the single latest right row
  * with `right.time <= left.time` in the same key group — the standard
  * time-series enrichment operator (market data, event attribution).
  *
  * Scale design: NOT implemented as a range join (which Spark would plan
  * as a broadcast-nested-loop or a cartesian-per-key explosion). Instead
  * the two sides are UNIONed, shuffled ONCE on the key, sorted within the
  * partition by (time, side), and the right payload is carried forward
  * with `last(ignoreNulls)` over a running window. Cost = one shuffle +
  * one sort — the same shape as a single windowed aggregate, which
  * survives 100 TB; right-side rows never multiply.
  *
  * Ties: a right row at exactly left.time IS visible (side ordering puts
  * right before left at equal times). Equal-time right rows within one key
  * are broken by `rightTieBreak` — the LARGEST wins (deterministic).
  */
object AsofJoin {

  /** @param left          left (probe) rows
    * @param right         right (reference) rows
    * @param key           equi-join key column name (both sides)
    * @param time          event-time column name (both sides, any ordered type)
    * @param rightPayload  right columns to carry onto matching left rows
    *                      (emitted as `asof_<name>`, null when no match)
    * @param rightTieBreak deterministic order among equal-time right rows
    */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.select(rightPayload.map(col): _*).schema.fields)
    val l = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tie"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(0).as("__side"),
      col(rightTieBreak).cast("long").as("__tie"),
      lit(null).cast(lType).as("__l"), struct(rightPayload.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      rightPayload.map(c => col(s"__match.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }

  /** Convenience: backward as-of with payload inferred as all right columns
    * except the key and time. */
  def backwardAll(left: DataFrame, right: DataFrame, key: String,
      time: String, rightTieBreak: String): DataFrame =
    backward(left, right, key, time,
      right.columns.filterNot(c => c == key || c == time).toSeq, rightTieBreak)
}
