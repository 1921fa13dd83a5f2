package graft

import graft.streaming.StreamParity
import org.apache.spark.sql.functions._

/** The q67 claim made testable: the foreachBatch upsert's (+, greatest)
  * merge algebra is associative-commutative, so ANY batch split must
  * reach the same target as the one-pass batch aggregate.
  */
class StreamCdcSpec extends SparkSpec {

  private def result(nFiles: Int): Array[(Long, Long, Long, String)] =
    StreamParity.cdcMergeUpserts(spark, sf() + "/events.parquet", nFiles)
      .select(col("user_id"), col("n_ops"), expr("m.ts DIV 1000").as("us"),
        col("m.event_type"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("cdc upsert reaches the same fixpoint for 1-batch and 5-batch splits") {
    assert(result(1).sameElements(result(5)))
  }

  test("cdc upsert target equals the one-pass batch LWW aggregate") {
    val streamed = result(3)
    val batch = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ops"),
        max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("n_ops"), expr("m.ts DIV 1000"), col("m.event_type"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(streamed.sameElements(batch))
  }
}
