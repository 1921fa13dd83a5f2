package graft

import graft.operators.ThemeTagger
import org.apache.spark.sql.functions._

/** Ports the reference classifier's behavioral pins
  * (tests/resources/test_eu_theme_classifier.py:9-39) onto the
  * deterministic vector formulation: multi-label above threshold, empty
  * result below it, the top-3 cap, and score-then-label ordering —
  * eu_theme_classifier.py:23-47 semantics without the live model
  * (documented divergence: FIXTURES.md §B.13). */
class ThemeTaggerSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned theme vectors make cosine scores exact and readable
  private val themes = Seq(
    ("TRAN", Seq(1f, 0f, 0f, 0f)),
    ("ENVI", Seq(0f, 1f, 0f, 0f)),
    ("ENER", Seq(0f, 0f, 1f, 0f)),
    ("AGRI", Seq(0f, 0f, 0f, 1f))).toDF("label", "tv")

  private def tagOf(docs: org.apache.spark.sql.DataFrame) =
    ThemeTagger.tag(docs, col("doc_id"), col("dv"), themes, col("label"), col("tv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("single dominant theme tags one label (warehousing -> TRAN analogue)") {
    val docs = Seq((1L, Seq(0.9f, 0.1f, 0f, 0f))).toDF("doc_id", "dv")
    assert(tagOf(docs)(1L) == Seq("TRAN"))
  }

  test("two themes above threshold, ordered by score (GHG -> ENVI,ENER analogue)") {
    val docs = Seq((2L, Seq(0f, 0.7f, 0.6f, 0f))).toDF("doc_id", "dv")
    assert(tagOf(docs)(2L) == Seq("ENVI", "ENER"))
  }

  test("nothing above threshold tags nothing (noise -> [] analogue)") {
    // zero vector: cosine 0 vs every theme — below the 0.3 threshold, so
    // the doc is ABSENT from the output (inner semantics, the reference's
    // empty-list verdict)
    val zero = Seq((4L, Seq(0f, 0f, 0f, 0f))).toDF("doc_id", "dv")
    assert(!tagOf(zero).contains(4L), "no-signal doc must be absent (inner semantics)")
  }

  test("top-3 cap with deterministic label tie-break") {
    // all four axes tie at cosine 0.5: keep 3, ordered by label asc
    val docs = Seq((5L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("doc_id", "dv")
    assert(tagOf(docs)(5L) == Seq("AGRI", "ENER", "ENVI"))
  }
}
