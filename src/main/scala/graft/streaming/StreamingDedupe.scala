package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication — the reference's dedupe (SURVEY A1) carried into
  * the incremental world (§7.5).
  *
  * Two tiers, Spark-first:
  *  - [[exactOnce]]: Spark's built-in streaming `dropDuplicates` on the
  *    content hash — state-store-backed exactly-once emission of first
  *    occurrences. Use this when "drop repeats" is the whole requirement.
  *  - [[withDuplicateCounts]]: custom state via `flatMapGroupsWithState`
  *    (the KeyValueGroupedDataset custom-state surface) when the pipeline
  *    additionally needs per-key bookkeeping the built-in can't express —
  *    here the reference's status accounting (dedupe.py emits kept +
  *    duplicate counts): emits each first occurrence immediately and tracks
  *    how many duplicates each hash has absorbed.
  *
  * State is partitioned by the hash — the same shuffle key as the batch
  * dedupe, so scale behavior is identical (hash-partitioned state store,
  * no skew beyond the data's own duplicate skew).
  */
object StreamingDedupe {

  /** Built-in tier: first occurrence per hash survives, state bounded by
    * the optional watermark the caller sets upstream. */
  def exactOnce(df: DataFrame, hashCol: String): DataFrame =
    df.dropDuplicates(hashCol)

  /** Watermark-bounded tier: duplicates are dropped only within the
    * watermark horizon and each key's state is EVICTED once the watermark
    * passes it — the variant that runs indefinitely at 100 TB/day
    * ([[exactOnce]]'s state grows with distinct keys forever). A repeat
    * arriving after the horizon re-emits: bounded state trades away global
    * uniqueness, which the downstream batch dedupe (q07) reconciles — the
    * standard stream-dedupe + batch-compaction split. Caller must set the
    * watermark on `df` first. */
  def withinWatermark(df: DataFrame, hashCol: String): DataFrame =
    df.dropDuplicatesWithinWatermark(hashCol)

  final case class DedupeState(dupCount: Long)
  final case class DedupeEvent(hash: String, id: Long, firstSeen: Boolean,
      dupsSoFar: Long)

  /** Custom-state tier: (hash, id) stream → one event per arrival with
    * first-seen flag and the running duplicate count for its hash. */
  def withDuplicateCounts(spark: SparkSession,
      df: Dataset[(String, Long)]): Dataset[DedupeEvent] = {
    import spark.implicits._
    df.groupByKey(_._1)
      .flatMapGroupsWithState[DedupeState, DedupeEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (hash, rows, state: GroupState[DedupeState]) =>
          val arrivals = rows.toSeq.sortBy(_._2)
          val prior = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[DedupeEvent]
          var dups = prior.map(_.dupCount).getOrElse(0L)
          var seen = prior.isDefined
          for ((_, id) <- arrivals) {
            if (!seen) { out += DedupeEvent(hash, id, firstSeen = true, dups); seen = true }
            else { dups += 1; out += DedupeEvent(hash, id, firstSeen = false, dups) }
          }
          state.update(DedupeState(dups))
          out.iterator
      }
  }
}
