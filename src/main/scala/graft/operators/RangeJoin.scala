package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval ("range") join: for each left row, aggregate the right rows of
  * the same key whose time lies in `[left.time - lookback, left.time)` —
  * the "activity in the last N minutes before the event" enrichment (fraud
  * features, error attribution, sliding context windows).
  *
  * Scale design: a naive formulation (`l JOIN r ON l.k = r.k AND r.t
  * BETWEEN l.t - W AND l.t`) gives Catalyst only the key equi-condition; a
  * hot key degenerates to an all-pairs comparison within the key. The
  * engine plans this shape as a CUSTOM PHYSICAL OPERATOR instead:
  * [[graft.plans.RangeJoinRewrite]] recognizes the authored join condition
  * and swaps in [[graft.plans.RangeJoinExec]] — a sort-merge interval join
  * (both sides hash-clustered on the key, sorted by (key, time), one
  * streaming pass with a sliding window buffer). One shuffle per side on
  * the key alone; memory bounded by a key's WINDOW population; the
  * aggregation that follows reuses the key partitioning with no further
  * exchange — survives 100 TB. If the rewrite is not installed the same
  * condition still executes as a plain left-outer join with identical
  * results (the exec is a physical-only optimization, pinned by spec).
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
    graft.plans.RangeJoinExec.ensureRegistered(left.sparkSession)
    val leftCols = left.columns.toSeq
    val probes = left.withColumn("__lt", col(time).cast("long"))
    val r = right.select(
      col(key).as("__rk") +: col(time).cast("long").as("__rt") +:
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
    // EXACTLY the shape RangeJoinRewrite recognizes: key equality + the
    // two band inequalities on 64-bit times, left-outer.
    val joined = probes.join(r,
      probes(key) === r("__rk") &&
        r("__rt") >= probes("__lt") - lit(lookback) && r("__rt") < probes("__lt"),
      "left_outer")
    joined.groupBy(leftCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
