package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Event-time tumbling-window aggregation with a watermark — the standard
  * Structured Streaming analytics shape (the reference is batch-only; this
  * is the streaming analog of Q2's histogram for a continuously-landing
  * event log).
  *
  * Semantics: counts + value sums per (window, event_type); late events
  * beyond `lateness` are dropped; `append` output emits a window only once
  * it is FINAL (watermark passed its end), so downstream consumers never
  * see a partial window — at 100 TB/day that finality contract is what
  * makes incremental downstream joins safe. State is bounded by the
  * watermark (old windows evicted), so the job runs forever without state
  * growth.
  *
  * `Trigger.AvailableNow` + checkpoint = the same incremental-batch posture
  * as [[FileStreamRefine]]: each invocation drains new files and stops.
  */
object EventWindowCounts {

  /** @param landing parquet dir with the events schema (`ts` = raw
    *                TIMESTAMP(NANOS) longs under nanosAsLong)
    * @param windowDur e.g. "1 minute"; lateness e.g. "30 seconds" */
  def run(spark: SparkSession, landing: String, schema: StructType,
      outDir: String, checkpoint: String,
      windowDur: String = "1 minute", lateness: String = "30 seconds"): StreamingQuery = {
    val counts = spark.readStream.schema(schema).parquet(landing)
      .withColumn("event_time", (col("ts") / lit(1e9)).cast("timestamp"))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("total_value"))
    counts.writeStream
      .outputMode("append") // only FINAL windows — requires the watermark
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .start(outDir)
  }
}
