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
}
