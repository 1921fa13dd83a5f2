package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  test("gap > maxGap opens a new session; first event always opens one") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L), (1L, 150L), (1L, 400L), (1L, 420L), // gap 250 > 200 splits
      (2L, 10L))
      .toDF("uid", "t")
    val got = Sessionize.withSessionIndex(df, col("uid"), col("t"), maxGap = 200L)
      .orderBy("uid", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 100L, 1L), (1L, 150L, 1L), (1L, 400L, 2L),
      (1L, 420L, 2L), (2L, 10L, 1L)))
  }

  test("gap exactly maxGap stays in the session (inclusive boundary)") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 200L)).toDF("uid", "t")
    val got = Sessionize.withSessionIndex(df, col("uid"), col("t"), maxGap = 200L)
      .collect().map(_.getLong(2)).toSet
    assert(got == Set(1L))
  }

  test("sessions rollup: event count and duration per session") {
    import spark.implicits._
    val df = Seq((1L, 100L), (1L, 150L), (1L, 400L)).toDF("uid", "t")
    val got = Sessionize.sessions(df, col("uid"), col("t"), maxGap = 200L)
      .orderBy("key", "session_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 50L), (2L, 1L, 0L)))
  }
}
