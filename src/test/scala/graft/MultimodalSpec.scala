package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("withDecodedMeta attaches the fixed meta schema, preserves columns and rows") {
    import spark.implicits._
    val df = Seq((1L, "abc".getBytes("UTF-8")), (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val out = Multimodal.withDecodedMeta(df, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "meta"))
    assert(out.schema("meta").dataType == Multimodal.MetaSchema)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    val m1 = rows(0).getStruct(2)
    assert(m1.getInt(0) == 3) // n_bytes
    assert(m1.getInt(1) == 3 % 640)
    assert(m1.getInt(2) == (3 * 7) % 480)
  }

  test("decode is a narrow transformation: no shuffle in the plan") {
    import spark.implicits._
    val df = Seq((1L, "xyz".getBytes("UTF-8"))).toDF("id", "payload")
    val plan = Multimodal.withDecodedMeta(df, "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("decodeBytes stub is deterministic and null-safe") {
    assert(Multimodal.decodeBytes(null) == ((0, 0, 0, 0)))
    assert(Multimodal.decodeBytes("abcd".getBytes) == Multimodal.decodeBytes("abcd".getBytes))
  }

  test("withResized: batched partition map, stable output size, no shuffle") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, Array.fill(100)(i.toByte))).toDF("id", "payload")
    val out = Multimodal.withResized(df, "payload", 64, 64, batchSize = 4)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Array[Byte]]("resized").length == 16))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("explodeSampledFrames: one row per sampled frame, stride respected") {
    import spark.implicits._
    // payload of 25 bytes -> n_frames = 25 % 30 = 25; stride 10 -> frames 0,10,20
    val df = Seq((1L, Array.fill(25)(1.toByte))).toDF("id", "payload")
    val out = Multimodal.explodeSampledFrames(df, "payload", stride = 10)
    assert(out.select("frame_idx").collect().map(_.getInt(0)).toSeq == Seq(0, 10, 20))
    // empty payload -> no rows (not a null row)
    val empty = Seq((2L, Array.emptyByteArray)).toDF("id", "payload")
    assert(Multimodal.explodeSampledFrames(empty, "payload", 10).count() == 0)
  }
}
