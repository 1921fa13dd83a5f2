package graft

import graft.queries.{AnalyticsQueries, CoreQueries, LlmQueries}

/** Semantics pins for q50 (pigeonhole-blocked linkage), q51 (gap-fill /
  * gaps-and-islands), t17 (positional phrase search) on handcrafted
  * fixtures where every answer is known by construction.
  */
class LinkPhraseGapSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lpgspec").toString

  test("q50: one-substitution pairs found wherever the differing char sits") {
    val dir = tmp()
    Seq(
      (1L, "Customer#000000001", 7), // base
      (2L, "Customer#000000002", 7), // differs at digit pos 18 (odd mask slot)
      (3L, "Customer#000010001", 7), // differs at digit pos 14 (even mask slot)
      (4L, "Xustomer#000000001", 7), // differs OUTSIDE the digit region
      (5L, "Customer#000000001", 3), // identical name, different nation → excluded
      (6L, "Customer#000000099", 7), // distance 2 → excluded
      (7L, "Customer#0000000011", 7) // longer name → excluded (length key)
    ).toDF("c_custkey", "c_name", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = CoreQueries.q50FuzzyLink(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2-3, 2-4, 3-4 each differ in TWO chars → excluded
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L)), s"got $got")
  }

  test("q51: spine length, gap days, and longest gap run are exact") {
    val dir = tmp()
    val us = 86400L * 1000000 // one day in micros
    def ts(day: Int): Long = day * us * 1000 // nanos
    // user 1: active days 0,1,2 → no gaps. user 2: active 0, 4 → 3-day gap.
    // user 3: active 0, 2, 3, 7 → gaps {1} and {4,5,6} → max run 3.
    val rows = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)),
      (2L, ts(0)), (2L, ts(4)),
      (3L, ts(0)), (3L, ts(2)), (3L, ts(3)), (3L, ts(7)))
      .map { case (u, t) => (u * 1000, t, u) } // event_id, ts, user_id
    rows.toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.q51GapFill(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) == ((3L, 3L, 0L, 0L)), got(1L).toString)
    assert(got(2L) == ((5L, 2L, 3L, 3L)), got(2L).toString)
    assert(got(3L) == ((8L, 4L, 4L, 3L)), got(3L).toString)
  }

  test("q53: latest op wins; tombstoned keys vanish; ties impossible by event_id") {
    val dir = tmp()
    // user 1: insert → update (survives with value 2.0)
    // user 2: insert → delete tombstone (vanishes)
    // user 3: delete → re-insert (survives — resurrection after tombstone)
    Seq(
      (10L, 1000L, 1L, "view", 1.0), (11L, 2000L, 1L, "click", 2.0),
      (20L, 1000L, 2L, "view", 9.0), (21L, 2000L, 2L, "error", 0.0),
      (30L, 1000L, 3L, "error", 0.0), (31L, 2000L, 3L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.q53CdcMerge(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((2L, "click", 2.0)))
    assert(got(3L) == ((2L, "purchase", 7.0)))
  }

  test("t17: most frequent bigram wins and per-doc hits count every position") {
    val dir = tmp()
    Seq(
      (1L, "red fox red fox red fox"), // "red fox" ×3, "fox red" ×2
      (2L, "red fox jumps"),           // "red fox" ×1
      (3L, "nothing here at all")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.t17PhraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "red fox", 3L), (2L, "red fox", 1L)), got.mkString(","))
  }
}
