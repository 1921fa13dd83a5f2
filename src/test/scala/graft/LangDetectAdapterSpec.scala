package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangDetectAdapter, TextAnalysis}

/** The seeded-langdetect drop-in seam (r12 verdict item 7): the library
  * is env-blocked here, so what CAN be pinned is (a) the resolution
  * order — absent jar → the engine's own classifier, (b) scalar/Column
  * classifier equivalence on a recorded fixture, and (c) a parity block
  * that ACTIVATES when the jar lands (guarded, not skipped silently —
  * the fixture rows carry the unambiguous-text expectation the seeded
  * library must agree with).
  */
class LangDetectAdapterSpec extends SparkSpec {

  // recorded fixture: unambiguous single-language texts + the engine
  // classifier's green-contract codes. The guarded parity block below
  // requires seeded langdetect to AGREE on these when it activates
  // (they are long and single-script — the regime where langdetect is
  // deterministic-stable under any seed).
  private val fixture = Seq(
    ("the quick brown fox jumps over the lazy dog and that is that", "en"),
    ("der schnelle braune fuchs springt über den faulen hund und das ist gut", "de"),
    ("le renard brun rapide saute par dessus le chien paresseux et les autres", "fr"),
    ("el zorro marrón rápido salta sobre el perro perezoso y los que son", "es"),
    ("これは日本語のテキストです", "ja"),
    ("이것은 한국어 텍스트입니다", "ko"),
    ("这是中文文本", "zh"),
    ("zxqwv bbnmpl qqrst", "und"))

  test("resolution order: jar absent -> bestDetect IS the stopword classifier") {
    // this container cannot resolve the langdetect artifact (offline
    // coursier cache) — if this ever flips, the parity block below runs
    assert(!LangDetectAdapter.available)
    fixture.foreach { case (text, _) =>
      assert(LangDetectAdapter.bestDetect(text)
        == LangDetectAdapter.stopwordDetect(text))
    }
    assert(LangDetectAdapter.detect(fixture.head._1).isEmpty)
  }

  test("scalar classifier mirrors the Column languageId on the fixture") {
    import spark.implicits._
    val df = fixture.map(_._1).toDF("text")
    val col_ = df.select(TextAnalysis.languageId(col("text"))).collect()
      .map(_.getString(0)).toSeq
    val scalar = fixture.map { case (t, _) => LangDetectAdapter.stopwordDetect(t) }
    assert(col_ == scalar)
    assert(scalar == fixture.map(_._2))
  }

  test("seeded-langdetect parity on unambiguous fixture rows (activates on jar drop)") {
    if (LangDetectAdapter.available) {
      // the contract the swap must honor: agreement on long unambiguous
      // single-script texts; "und" rows are classifier-specific and
      // excluded (langdetect throws / guesses on gibberish)
      fixture.filter(_._2 != "und").foreach { case (text, expected) =>
        assert(LangDetectAdapter.detect(text).contains(expected),
          s"seeded langdetect disagrees on unambiguous text: $text")
      }
    } else {
      info("langdetect jar absent (env-blocked) — parity block dormant; " +
        "drop the jar + SPARK_GRAFT_LANGDETECT_PROFILES to activate")
    }
  }
}
