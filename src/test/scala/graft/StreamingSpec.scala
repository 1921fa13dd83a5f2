package graft

import graft.streaming.FileStreamRefine
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("AvailableNow file stream: drains backlog, resumes incrementally") {
    import spark.implicits._
    val base = Files.createTempDirectory("graftstream")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val mk = (id: Long, len: Int) => (id, "w " * len)
    Seq(mk(1, 150), mk(2, 10)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema

    // run 1: only doc 1 passes the length gate
    FileStreamRefine.run(spark, landing, schema, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 1)

    // new file lands; run 2 processes ONLY the new file (checkpoint ledger)
    Seq(mk(3, 200)).toDF("doc_id", "text").write.mode("append").parquet(landing)
    FileStreamRefine.run(spark, landing, schema, out, ckpt).awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    val ids = rows.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    // enrichment columns present
    assert(rows.columns.contains("identifier") && rows.columns.contains("token_count"))
  }

  test("event-time window agg: append emits only watermark-final windows") {
    import spark.implicits._
    import graft.streaming.EventWindowCounts
    val base = Files.createTempDirectory("graftwin")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def ev(id: Long, sec: Long, typ: String, v: Double) =
      (id, sec * 1000L * 1000 * 1000, typ, v) // ts as raw nanos

    // run 1: two events inside [0,60) and one at 70s. Watermark only
    // advances at batch end, so NOTHING is final yet -> no append output.
    Seq(ev(1, 10, "click", 1.0), ev(2, 20, "click", 2.0), ev(3, 70, "view", 5.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    EventWindowCounts.run(spark, landing, schema, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 0,
      "no window may emit before the watermark passes it")

    // run 2: a much later event pushes the watermark past the early
    // windows -> they finalize and emit exactly once.
    Seq(ev(4, 600, "view", 1.0)).toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(landing)
    EventWindowCounts.run(spark, landing, schema, out, ckpt).awaitTermination()
    val rows = spark.read.parquet(out)
      .select("window_start", "event_type", "cnt", "total_value").collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set((0L, "click", 2L, 3.0), (60L, "view", 1L, 5.0)), rows)
  }

  test("stream/batch parity: AvailableNow windows == batch agg before the watermark") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamParity
    val path = sf() + "/events.parquet"
    val streamed = StreamParity.finalWindowCounts(spark, path)
      .collect().map(_.toSeq).toSet

    val ev = graft.core.Tables.tsNanos(spark.read.parquet(path))
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val wm = ev.agg(max(col("event_time"))).head.getTimestamp(0).toInstant
      .minusSeconds(30 * 60)
    val batch = ev
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .filter(col("window.end") <= lit(java.sql.Timestamp.from(wm)))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("cnt"), col("min_value"), col("max_value"))
      .collect().map(_.toSeq).toSet

    assert(streamed.nonEmpty, "no final windows emitted")
    assert(streamed == batch,
      s"streamed-batch diff: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }
}
