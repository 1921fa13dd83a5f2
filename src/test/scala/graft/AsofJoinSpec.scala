package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def mk() = {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "c", 9L))
      .toDF("lid", "k", "t")
    val right = Seq(
      (100L, "a", 8L, 1.0), (101L, "a", 15L, 2.0), (102L, "a", 20L, 3.0),
      (103L, "b", 6L, 4.0))
      .toDF("rid", "k", "t", "v")
    (left, right)
  }

  test("backward picks latest right row with t <= left.t; equal time inclusive") {
    val (left, right) = mk()
    val out = AsofJoin.backward(left, right, "k", "t", Seq("rid", "v"), "rid")
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(out == Seq(
      1L -> Some(100L), // t=10: latest a-row at 8
      2L -> Some(102L), // t=20: the equal-time row IS visible
      3L -> None,       // t=5: earliest b-row is at 6 — no match
      4L -> None))      // key c absent on the right
  }

  test("left columns and payload nulls survive; no row multiplication") {
    val (left, right) = mk()
    val out = AsofJoin.backward(left, right, "k", "t", Seq("rid", "v"), "rid")
    assert(out.count() == 4) // exactly one output row per left row
    assert(out.columns.toSeq == Seq("lid", "k", "t", "asof_rid", "asof_v"))
  }

  test("equal-time right duplicates break ties to the largest tie-break") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("lid", "k", "t")
    val right = Seq((7L, "a", 10L, 1.0), (9L, "a", 10L, 2.0), (8L, "a", 10L, 3.0))
      .toDF("rid", "k", "t", "v")
    val got = AsofJoin.backward(left, right, "k", "t", Seq("rid"), "rid")
      .collect().map(_.getLong(3)).toSeq
    assert(got == Seq(9L))
  }

  test("backwardAll carries every non-key/time right column") {
    val (left, right) = mk()
    val out = AsofJoin.backwardAll(left, right, "k", "t", "rid")
    assert(out.columns.toSeq == Seq("lid", "k", "t", "asof_rid", "asof_v"))
  }
}
