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

  test("randomized: both directions equal brute force, with and without tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lefts = (1L to 50L).map(id => (id, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
    val rights = (1000L to 1200L).map(rid =>
      (rid, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, rnd.nextDouble()))
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("rid", "k", "t", "v")
    for (tol <- Seq(None, Some(30L)); fwd <- Seq(false, true)) {
      val expected = lefts.map { case (id, k, t) =>
        val cand = rights.filter(rr => rr._2 == k &&
          (if (fwd) rr._3 >= t else rr._3 <= t) &&
          tol.forall(x => math.abs(rr._3 - t) <= x))
        val pick =
          if (cand.isEmpty) None
          // backward: latest t, largest rid; forward: earliest t, smallest rid
          else if (fwd) Some(cand.minBy(rr => (rr._3, rr._1))._1)
          else Some(cand.maxBy(rr => (rr._3, rr._1))._1)
        id -> pick
      }.toMap
      val op = if (fwd) AsofJoin.forward _ else AsofJoin.backward _
      val got = op(l, r, "k", "t", Seq("rid"), "rid", tol)
        .collect().map(row => row.getLong(0) ->
          Option(row.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got == expected, s"fwd=$fwd tol=$tol")
    }
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
