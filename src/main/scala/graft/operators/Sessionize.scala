package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to the
  * same session while the gap to the previous event stays <= `maxGap`;
  * a larger gap opens a new session. The batch analog of
  * `session_window` in Structured Streaming, and the standard event-log
  * primitive (attribution, engagement, funnel prep).
  *
  * Scale design: ONE shuffle on the key; `lag` + running `sum` over the
  * same window spec share a single sort. Session aggregation afterwards is
  * a hash-agg on (key, session) with map-side partial combine. No
  * self-join, no range join.
  */
object Sessionize {

  /** Assign 1-based `session_idx` per key ordered by `time` (any ordered
    * numeric/timestamp type; gap arithmetic must be valid for it). */
  def withSessionIndex(df: DataFrame, key: Column, time: Column,
      maxGap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time)
    val run = Window.partitionBy(key).orderBy(time)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = time - lag(time, 1).over(w)
    val opens = when(gap.isNull || gap > maxGap, 1).otherwise(0)
    df.withColumn("session_idx", sum(opens).over(run))
  }

  /** Per-session rollup: (key, session_idx, n_events, duration) where
    * duration = last - first event time in the session's own unit. */
  def sessions(df: DataFrame, key: Column, time: Column,
      maxGap: Long): DataFrame =
    withSessionIndex(df, key, time, maxGap)
      .groupBy(key.as("key"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(time) - min(time)).as("duration"))
}
