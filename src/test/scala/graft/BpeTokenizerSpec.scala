package graft

import graft.functions.BpeTokenizer
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {

  test("reference determinism contract: 'Hello, world!' == 4") {
    // tests/resources/test_token_counter.py:21 pins this exact count
    assert(BpeTokenizer.countTokens("Hello, world!") == 4)
    assert(BpeTokenizer.tokenizeWord("Hello,") == Seq("Hello", ","))
    assert(BpeTokenizer.tokenizeWord("world!") == Seq("world", "!"))
  }

  test("0 on null/empty/whitespace-only, >= 0 always") {
    assert(BpeTokenizer.countTokens(null) == 0)
    assert(BpeTokenizer.countTokens("") == 0)
    assert(BpeTokenizer.countTokens("   \t\n") == 0)
  }

  test("merges build common words into single tokens") {
    assert(BpeTokenizer.tokenizeWord("the") == Seq("the"))
    assert(BpeTokenizer.tokenizeWord("that") == Seq("that"))
    assert(BpeTokenizer.tokenizeWord("with") == Seq("with"))
    assert(BpeTokenizer.tokenizeWord("for") == Seq("for"))
    assert(BpeTokenizer.tokenizeWord("and") == Seq("and"))
  }

  test("adjacent repeats of one merge are caught by the second pass") {
    // (a,n) applies twice back-to-back inside "banana"
    assert(BpeTokenizer.tokenizeWord("banana") == Seq("b", "an", "an", "a"))
  }

  test("deterministic across calls; unknown scripts fall back to codepoints") {
    val w = "Straße"
    assert(BpeTokenizer.tokenizeWord(w) == BpeTokenizer.tokenizeWord(w))
    assert(BpeTokenizer.countTokens("世界") == 2) // two CJK codepoints, no merges
  }

  test("separator bytes in input are stripped, not counted") {
    assert(BpeTokenizer.countTokens("a\u001fb") == BpeTokenizer.countTokens("ab"))
  }

  test("UDF surface matches the plain kernel over a DataFrame") {
    import spark.implicits._
    val df = Seq("Hello, world!", "", "the cat sat").toDF("s")
    val got = df.select(BpeTokenizer.bpeTokenCount(col("s"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(4, 0,
      BpeTokenizer.countTokens("the cat sat")))
  }

  test("tier boundary: rank 84, and the documented divergence corpus") {
    // The tier-2 boundary IS the table size — growing the table must
    // update the scaladoc contract and these pins together.
    assert(BpeTokenizer.Merges.size == 84)

    // TIER 1 — exact cl100k parity: the reference's pinned case and the
    // covered function words are single tokens (tested above too).
    assert(BpeTokenizer.countTokens("Hello, world!") == 4)

    // TIER 2 — the table's reach stops at rank 84: mid-frequency words
    // split into the learned fragments below; cl100k's 100k-entry vocab
    // would emit 1-3 tokens for each. The splits are golden-pinned so any
    // table change surfaces here as an explicit contract change.
    assert(BpeTokenizer.tokenizeWord("information") ==
      Seq("in", "for", "m", "at", "ion"))
    assert(BpeTokenizer.tokenizeWord("understanding") ==
      Seq("u", "nd", "er", "st", "and", "ing"))
    assert(BpeTokenizer.tokenizeWord("tokenization") ==
      Seq("to", "k", "en", "i", "z", "at", "ion"))

    // BEYOND THE TABLE — never merged: rare letters, uppercase outside
    // the few capitalized ranks, non-ASCII codepoints.
    assert(BpeTokenizer.tokenizeWord("jazz") == Seq("j", "a", "z", "z"))
    assert(BpeTokenizer.tokenizeWord("HELLO") ==
      Seq("H", "E", "L", "L", "O"))

    // Divergence direction is a deterministic OVERCOUNT (fewer merges can
    // only split more), so tier-2 counts upper-bound cl100k counts —
    // the property that keeps budget/length gates safe.
    for (w <- Seq("information", "understanding", "tokenization", "jazz"))
      assert(BpeTokenizer.countTokens(w) >= 1 &&
        BpeTokenizer.countTokens(w) == BpeTokenizer.tokenizeWord(w).size)
  }
}
