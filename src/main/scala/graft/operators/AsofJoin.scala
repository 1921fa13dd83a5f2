package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: every left row picks a single right row from the same key
  * group by event-time proximity — the standard time-series enrichment
  * operator (market data, event attribution).
  *
  *  - [[backward]]: latest right with `right.time <= left.time`
  *  - [[forward]]:  earliest right with `right.time >= left.time`
  *  - both take an optional `tolerance`: a match farther than `tolerance`
  *    time units from the left row is nulled out (the "within N minutes"
  *    band every practical attribution query needs)
  *
  * Scale design: NOT implemented as a range join (which Spark would plan
  * as a broadcast-nested-loop or a cartesian-per-key explosion). Instead
  * the two sides are UNIONed, shuffled ONCE on the key, sorted within the
  * partition by (time, side), and the right payload is carried across
  * with `last`/`first(ignoreNulls)` over a running window. Cost = one
  * shuffle + one sort — the same shape as a single windowed aggregate,
  * which survives 100 TB; right-side rows never multiply. The tolerance
  * check is a post-projection on the carried timestamp — free.
  *
  * Ties: a right row at exactly left.time IS visible in both directions
  * (side ordering puts right on the inclusive side of the frame at equal
  * times). Equal-time right rows within one key are broken by
  * `rightTieBreak` — backward takes the LARGEST, forward the SMALLEST
  * (both deterministic).
  */
object AsofJoin {

  /** @param left          left (probe) rows
    * @param right         right (reference) rows
    * @param key           equi-join key column name (both sides)
    * @param time          event-time column name (both sides; integral if
    *                      `tolerance` is used)
    * @param rightPayload  right columns to carry onto matching left rows
    *                      (emitted as `asof_<name>`, null when no match)
    * @param rightTieBreak deterministic order among equal-time right rows
    * @param tolerance     max |right.time - left.time| for a match to count
    */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], rightTieBreak: String,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, key, time, rightPayload, rightTieBreak,
      forwardDir = false, tolerance)

  /** Earliest right with `right.time >= left.time` — see [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], rightTieBreak: String,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, key, time, rightPayload, rightTieBreak,
      forwardDir = true, tolerance)

  private def join(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], rightTieBreak: String,
      forwardDir: Boolean, tolerance: Option[Long]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(left.schema.fields)
    // the right struct carries the match's event time (head field) so the
    // tolerance band can be checked after the window pass
    val rPayloadCols = col(time).as("__rt") +: rightPayload.map(col)
    val rType = StructType(right.select(rPayloadCols: _*).schema.fields)
    // side ordering keeps an equal-time right row INSIDE the left row's
    // frame: backward frame ends at current row → right sorts before left;
    // forward frame starts at current row → right sorts after left
    val (leftSide, rightSide) = if (forwardDir) (0, 1) else (1, 0)
    val l = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(leftSide).as("__side"),
      lit(null).cast("long").as("__tie"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(rightSide).as("__side"),
      col(rightTieBreak).cast("long").as("__tie"),
      lit(null).cast(lType).as("__l"), struct(rPayloadCols: _*).as("__r"))
    val ordered = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
    val matched =
      if (forwardDir)
        l.unionByName(r).withColumn("__match",
          first(col("__r"), ignoreNulls = true).over(
            ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        l.unionByName(r).withColumn("__match",
          last(col("__r"), ignoreNulls = true).over(
            ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val valid = tolerance match {
      case Some(tol) =>
        val gap =
          if (forwardDir) col("__match.__rt") - col("__t")
          else col("__t") - col("__match.__rt")
        col("__match").isNotNull && gap <= tol
      case None => col("__match").isNotNull
    }
    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      rightPayload.map(c => when(valid, col(s"__match.$c")).as(s"asof_$c"))
    matched.filter(col("__side") === leftSide).select(out: _*)
  }

  /** Convenience: backward as-of with payload inferred as all right columns
    * except the key and time. */
  def backwardAll(left: DataFrame, right: DataFrame, key: String,
      time: String, rightTieBreak: String): DataFrame =
    backward(left, right, key, time,
      right.columns.filterNot(c => c == key || c == time).toSeq, rightTieBreak)
}
