package graft

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def eval1(c: org.apache.spark.sql.Column, input: (String, String)*): Seq[Any] = {
    import spark.implicits._
    input.toSeq.toDF("s", "tag").select(c).collect().map(_.get(0)).toSeq
  }

  test("wordCount matches python str.split semantics") {
    val got = eval1(TextFunctions.wordCount(col("s")),
      ("hello world", ""), ("  padded   out  ", ""), ("", ""), ("   ", ""), ("one", ""))
    assert(got == Seq(2, 2, 0, 0, 1))
  }

  test("wordCount is 0 on null") {
    import spark.implicits._
    val got = Seq(Tuple1(null.asInstanceOf[String])).toDF("s")
      .select(TextFunctions.wordCount(col("s"))).collect().map(_.get(0)).toSeq
    assert(got == Seq(0))
  }

  test("normalizeWhitespace collapses runs, strips NBSP, trims") {
    val got = eval1(TextFunctions.normalizeWhitespace(col("s")),
      ("  a   b\n\nc\t d  ", ""))
    assert(got == Seq("a b c d"))
  }

  test("nullifyTokens maps the reference null-token set to null") {
    val got = eval1(TextFunctions.nullifyTokens(col("s")),
      ("NA", ""), ("n/a", ""), ("-", ""), ("", ""), ("ok", ""), (" NULL ", ""))
    assert(got == Seq(null, null, null, null, "ok", null))
  }

  test("numericClean strips currency, separators, percent") {
    val got = eval1(TextFunctions.numericClean(col("s")),
      (" 166,012,276 ", ""), ("£4,000", ""), ("12.5%", ""), ("$ 1 234", ""), ("€9", ""))
    assert(got == Seq("166012276", "4000", "12.5", "1234", "9"))
  }

  test("safeName sanitizes to filesystem-safe form") {
    val got = eval1(TextFunctions.safeName(col("s")),
      ("My File/Name v2", ""), ("weird***chars!!", ""), ("UPPER lower", ""),
      ("__.dotted name._", ""))
    assert(got == Seq("my_file_name_v2", "weird_chars", "upper_lower", "dotted_name"))
  }

  test("licenseNormalize maps known keys, defaults missing to OGL") {
    import spark.implicits._
    val df = Seq("ogl", "OGL", "cc-by", "cc-zero", "unknown-xyz").toDF("lic")
    val got = df.select(TextFunctions.licenseNormalize(col("lic"))).collect().map(_.get(0)).toSeq
    assert(got == Seq("OGL-UK-3.0", "OGL-UK-3.0", "CC BY", "CC0", null))
    val nullIn = Seq(Tuple1(null.asInstanceOf[String])).toDF("lic")
      .select(TextFunctions.licenseNormalize(col("lic"))).collect().map(_.get(0)).toSeq
    assert(nullIn == Seq("OGL-UK-3.0"))
  }

  test("tokenCount: deterministic, >= 0, 0 on null/empty, word+punct granularity") {
    val got = eval1(TextAnalysis.tokenCount(col("s")),
      ("Hello, world!", ""), ("", ""), ("abc123", ""), ("a b", ""))
    // "hello" "," "world" "!" = 4 — matches the reference token_counter contract
    assert(got == Seq(4, 0, 2, 2))
  }

  test("languageId picks stopword-dominant language, und on no hits, zh on CJK") {
    val got = eval1(TextAnalysis.languageId(col("s")),
      ("the cat and the dog is in a house that", ""),
      ("el perro y la casa de los gatos en un", ""),
      ("zzz qqq xxx", ""),
      ("中文文本", ""))
    assert(got == Seq("en", "es", "und", "zh"))
  }

  test("languageId discriminates 13 Latin-script languages + ja/ko scripts") {
    val cases = Seq(
      ("der hund ist nicht in das haus und zu", "de"),
      ("le chien et les chats des maisons une est", "fr"),
      ("il gatto che non sono una con per di", "it"),
      ("não uma os do da em por como", "pt"),
      ("het een van ik dat niet met de", "nl"),
      ("och att det som på är av den", "sv"),
      ("og at en til af den det er", "da"),
      ("ikke jeg og er på som av det", "no"),
      ("nie się na do to jest z czy", "pl"),
      ("și de la cu este nu pentru care", "ro"),
      ("ve bir bu için ile olarak ama", "tr"),
      ("ひらがなとカタカナの文章", "ja"),
      ("한국어 문장 입니다", "ko"))
    val got = eval1(TextAnalysis.languageId(col("s")), cases.map(c => (c._1, "")): _*)
    assert(got == cases.map(_._2))
  }

  test("repetitionSignals: dup-word and top-bigram fractions, zero-safe") {
    import spark.implicits._
    val df = Seq((1L, "a a a a"), (2L, "x y"), (3L, ""), (4L, "solo"),
      (5L, "the cat and the dog and the fox")).toDF("id", "text")
    val got = TextAnalysis.repetitionSignals(df, col("id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got(0) == ((4L, 0.75, 1.0)))     // "a a" 3 of 3 bigrams
    assert(got(1) == ((2L, 0.0, 1.0)))      // one bigram of one
    assert(got(2) == ((0L, 0.0, 0.0)))
    assert(got(3) == ((1L, 0.0, 0.0)))
    // 8 words, distinct {the,cat,and,dog,fox}=5 -> dup 3/8; "and the" x2 of 7
    assert(got(4) == ((8L, 3.0 / 8.0, 2.0 / 7.0)))
  }

  test("c4LineGates: terminal-line fraction, words-per-line, boilerplate flags") {
    import spark.implicits._
    val df = Seq(
      (1L, "Good line.\nAnother one!\nno punct here\n\n"),
      (2L, "var x = { a: 1 }"),
      (3L, "Lorem Ipsum dolor sit."),
      (4L, "")).toDF("id", "text")
    val g = TextAnalysis.c4LineGates(col("text"))
    val got = df.select(col("id"), g("n_lines"), g("frac_lines_terminal"),
        g("mean_words_per_line"), g("has_curly"), g("has_lorem"))
      .orderBy("id").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getInt(5))).toSeq
    assert(got(0) == ((3, 2.0 / 3.0, 8.0 / 3.0, 0, 0))) // blank line dropped
    assert(got(1) == ((1, 0.0, 7.0, 1, 0)))
    assert(got(2) == ((1, 1.0, 4.0, 0, 1)))             // case-insensitive lorem
    assert(got(3) == ((0, 0.0, 0.0, 0, 0)))             // empty text is zero-safe
  }

  test("piiCounts: email and phone spans counted, clean text zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail Alice@Example.COM and bob@test.org, call +44 20 7946 0958"),
      (2L, "no pii in sight"),
      (3L, "order 123 costs 45")).toDF("id", "text")
    val p = TextAnalysis.piiCounts(col("text"))
    val got = df.select(col("id"), p("n_emails"), p("n_phones"))
      .orderBy("id").collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((2, 1), (0, 0), (0, 0)))
  }

  test("fingerprint is whitespace/case-insensitive stable identity") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world", "HELLO WORLD").toDF("s")
    val fps = df.select(TextAnalysis.fingerprint(col("s"))).collect().map(_.getString(0)).toSeq
    assert(fps.distinct.size == 1)
    assert(fps.head.length == 32)
  }
}
