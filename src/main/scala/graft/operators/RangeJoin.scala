package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval ("range") join: for each left row, aggregate the right
  * rows of the same key whose time lies in `[left.time - lookback,
  * left.time)` — the "activity in the last N minutes before the event"
  * enrichment (fraud features, error attribution, sliding context windows).
  *
  * Scale design: a naive formulation (`l JOIN r ON l.k = r.k AND r.t
  * BETWEEN l.t - W AND l.t`) gives Catalyst only the key equi-condition; a
  * hot key degenerates to an all-pairs comparison within the key. Instead
  * both sides are bucketed into fixed `lookback`-width time bands and
  * joined on `(key, band)`: any right row in `[l.t - lookback, l.t)` lies
  * in the left row's band or the one before it, so each left row probes
  * exactly TWO bands. Candidate fan-out is bounded by band population, the
  * join stays a hash equi-join (AQE can still split skewed bands), and the
  * exact range predicate is applied as the join residual. Cost = one
  * 2× left explode + one shuffle on (key, band) — survives 100 TB.
  */
object RangeJoin {

  /** @param left         probe rows (must carry a unique id column —
    *                     identical full rows would merge in the group-by)
    * @param right        reference rows
    * @param key          equi-join key column name (both sides)
    * @param time         integral time column name (both sides, same unit)
    * @param lookback     window width in `time` units, > 0
    * @param rightPayload right columns the aggregates read; exposed to
    *                     `aggs` as `r_<name>` (null when no match)
    * @param aggs         aggregate columns over the `r_*` payload, e.g.
    *                     `count(col("r_value"))`. Unmatched left rows reach
    *                     the aggregates with all-null payload, so
    *                     `count(r_*)` is 0 — left rows are never dropped.
    */
  def aggregateWithin(left: DataFrame, right: DataFrame, key: String,
      time: String, lookback: Long, rightPayload: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    require(lookback > 0, s"lookback must be positive, got $lookback")
    val leftCols = left.columns.toSeq
    val r = right.select(
      col(key).as("__rk") +: expr(s"$time DIV $lookback").as("__rband") +:
        col(time).as("__rt") +: rightPayload.map(c => col(c).as(s"r_$c")): _*)
    val probes = left
      .withColumn("__lband", expr(s"$time DIV $lookback"))
      .withColumn("__band", explode(array(col("__lband") - 1, col("__lband"))))
    // Hash equi-join on (key, band); the exact interval check is the
    // residual, so band-edge candidates from the neighbor band are dropped.
    val joined = probes.join(r,
      probes("__band") === r("__rband") && col(key) === col("__rk") &&
        col("__rt") >= col(time) - lit(lookback) && col("__rt") < col(time),
      "left_outer")
    joined.groupBy(leftCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
