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

  test("forward picks earliest right row with t >= left.t; equal time inclusive") {
    val (left, right) = mk()
    val out = AsofJoin.forward(left, right, "k", "t", Seq("rid", "v"), "rid")
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(out == Seq(
      1L -> Some(101L), // t=10: earliest a-row at-or-after is 15
      2L -> Some(102L), // t=20: the equal-time row IS visible
      3L -> Some(103L), // t=5: b-row at 6
      4L -> None))      // key c absent on the right
  }

  test("forward equal-time duplicates break ties to the SMALLEST tie-break") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("lid", "k", "t")
    val right = Seq((9L, "a", 10L, 1.0), (7L, "a", 10L, 2.0), (8L, "a", 10L, 3.0))
      .toDF("rid", "k", "t", "v")
    val got = AsofJoin.forward(left, right, "k", "t", Seq("rid"), "rid")
      .collect().map(_.getLong(3)).toSeq
    assert(got == Seq(7L))
  }

  test("tolerance nulls out matches beyond the band, keeps those inside") {
    val (left, right) = mk()
    // lid=1 at t=10 matches rid=100 at t=8 (gap 2); tolerance 1 kills it
    val strict = AsofJoin.backward(left, right, "k", "t", Seq("rid"), "rid",
        tolerance = Some(1L))
      .orderBy("lid").collect().map(r => Option(r.get(3))).toSeq
    assert(strict == Seq(None, Some(102L), None, None))
    // tolerance 2 readmits it
    val loose = AsofJoin.backward(left, right, "k", "t", Seq("rid"), "rid",
        tolerance = Some(2L))
      .orderBy("lid").collect().map(r => Option(r.get(3))).toSeq
    assert(loose == Seq(Some(100L), Some(102L), None, None))
    // forward band: lid=1 at t=10 -> rid=101 at t=15 (gap 5)
    val fwd = AsofJoin.forward(left, right, "k", "t", Seq("rid"), "rid",
        tolerance = Some(4L))
      .orderBy("lid").collect().map(r => Option(r.get(3))).toSeq
    assert(fwd == Seq(None, Some(102L), Some(103L), None))
  }
}
