package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis kernels for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All pure Column
  * expressions (codegen'd, deterministic, oracle-expressible).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram-free heuristic.
    * 13 Latin-script languages; CJK scripts are handled by codepoint-range
    * checks in [[languageId]] (the reference's langdetect covers 55
    * languages — assets/processing/assets.py:318-327; this profile covers
    * the high-traffic subset with the same deterministic contract).
    */
  val StopwordSets: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "it" -> Seq("il", "che", "di", "per", "non", "sono", "una", "con"),
    "pt" -> Seq("não", "uma", "os", "do", "da", "em", "por", "como"),
    "nl" -> Seq("de", "het", "een", "van", "ik", "dat", "niet", "met"),
    "sv" -> Seq("och", "att", "det", "som", "på", "av", "är", "den"),
    "da" -> Seq("og", "at", "det", "en", "til", "er", "den", "af"),
    "no" -> Seq("og", "det", "er", "på", "som", "av", "ikke", "jeg"),
    "pl" -> Seq("nie", "się", "na", "do", "to", "jest", "z", "czy"),
    "ro" -> Seq("și", "de", "la", "cu", "este", "nu", "pentru", "care"),
    "tr" -> Seq("ve", "bir", "bu", "için", "ile", "olarak", "da", "ama"))

  /** Heuristic language ID: count distinct stopword hits per language over
    * the word set; pick the best score (ties broken by language code,
    * alphabetically first wins — deterministic, mirrored in the DuckDB
    * oracle's CASE order); script-range checks force ja/ko/zh (kana first:
    * Japanese text contains kanji too); no hits → "und".
    */
  def languageId(text: Column): Column = {
    val ws = array_distinct(split(trim(lower(text)), "\\s+"))
    // one struct per language, max by (score, -index): each of the 13
    // intersects is evaluated exactly ONCE — the earlier greatest+when-chain
    // formulation spelled every intersect twice (best + pick) and leaned on
    // codegen CSE to dedupe them. -index makes ties resolve to the
    // alphabetically FIRST language (struct comparison is field-ordered),
    // mirroring the oracle's CASE order.
    val scored = StopwordSets.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, stops), idx) =>
        struct(
          size(array_intersect(ws, array(stops.map(lit): _*))).as("sc"),
          lit(-idx).as("nidx"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    val pick = when(best.getField("sc") > 0, best.getField("lang"))
      .otherwise(lit("und"))
    when(text.rlike("[\\u3040-\\u30ff]"), lit("ja"))
      .when(text.rlike("[\\uac00-\\ud7af]"), lit("ko"))
      .when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .otherwise(pick)
  }

  /** Quality scoring features: char length, word count, mean word length,
    * punctuation ratio, stopword ratio, uppercase ratio — the standard
    * cheap quality gates (cf. Gopher/C4 filtering rules).
    */
  def qualityFeatures(text: Column): Map[String, Column] = {
    val nChars = length(text)
    val wc = TextFunctions.wordCount(text)
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    val upper = length(regexp_replace(text, "[^A-Z]", ""))
    val stops = array(StopwordSets("en").map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(split(trim(lower(text)), "\\s+")), stops))
    Map(
      "n_chars" -> nChars,
      "word_count" -> wc,
      "mean_word_len" -> when(wc > 0,
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") / wc.cast("double"))
        .otherwise(lit(0.0)),
      "punct_ratio" -> when(nChars > 0, punct.cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0)),
      "upper_ratio" -> when(nChars > 0, upper.cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0)),
      "stopword_hits" -> stopHits)
  }

  /** BPE-ish token count: runs of letters, runs of digits, or runs of other
    * non-space symbols each count as one token — a deterministic regex
    * approximation of byte-pair tokenizer granularity
    * (reference contract: resources/token_counter.py:12-37 — deterministic
    * int >= 0, 0 on null/empty).
    */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(text) === 0, lit(0))
      .otherwise(size(call_function("regexp_extract_all",
        lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))

  /** Gopher-style repetition signals (cf. Rae et al. 2021 §A1.1 repetition
    * filters): per-doc duplicate-word fraction and most-frequent-bigram
    * fraction — the cheap gates that drop boilerplate/templated docs before
    * expensive dedupe.
    *
    * Scale design: computed relationally — explode words once, two
    * hash-aggregates (map-side partial combine), join back tiny per-doc
    * stat rows. NOT per-row higher-order lambdas: counting the modal
    * bigram inside a lambda is O(words²) per document and interpreted,
    * which dies on 10k-word docs at 100 TB.
    *
    * @return (id, n_words, dup_word_frac, top_bigram_frac)
    */
  def repetitionSignals(df: DataFrame, id: Column, text: Column): DataFrame = {
    val ws = filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)
    val base = df.select(id.as("id"), ws.as("w"))
    val wordStats = base.select(col("id"), explode(col("w")).as("word"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_words"),
        count_distinct(col("word")).as("n_distinct"))
    val bigram = base
      .filter(size(col("w")) >= 2)
      .select(col("id"), explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id")).agg(max(col("cnt")).as("top_bg"))
    df.select(id.as("id"))
      .join(wordStats, Seq("id"), "left")
      .join(bigram, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          (col("n_words") - col("n_distinct")).cast("double") / col("n_words").cast("double"))
          .otherwise(lit(0.0)).as("dup_word_frac"),
        when(coalesce(col("n_words"), lit(0L)) >= 2,
          coalesce(col("top_bg"), lit(0L)).cast("double") / (col("n_words") - 1).cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** C4-style line-level quality gates (cf. Raffel et al. 2020 §2.2): the
    * heuristics C4 applies per LINE rather than per document — fraction of
    * lines ending in terminal punctuation, mean words per line, and the
    * bracket/lorem-ipsum boilerplate flags. Pure Column expressions over a
    * single line-split (narrow, no shuffle); ratios are single divisions so
    * the doubles hash-match the oracle.
    */
  def c4LineGates(text: Column): Map[String, Column] = {
    val lines = filter(
      transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    val nLines = size(lines)
    val terminal = size(filter(lines, l => l.rlike("[.!?\"]$")))
    Map(
      "n_lines" -> nLines,
      "frac_lines_terminal" -> when(nLines > 0,
        terminal.cast("double") / nLines.cast("double")).otherwise(lit(0.0)),
      "mean_words_per_line" -> when(nLines > 0,
        TextFunctions.wordCount(text).cast("double") / nLines.cast("double"))
        .otherwise(lit(0.0)),
      "has_curly" -> text.contains("{").cast("int"),
      "has_lorem" -> lower(text).contains("lorem ipsum").cast("int"))
  }

  /** PII surface counts — how many email / phone-shaped spans a document
    * carries (the detection side of the anonymizer M4; at corpus scale the
    * counts drive routing: only flagged docs pay the rewrite). Patterns are
    * deliberately RE2-safe (no lookarounds) so Java regex and the oracle's
    * RE2 agree span-for-span.
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 -]{7,}[0-9]"

  def piiCounts(text: Column): Map[String, Column] = Map(
    // contains("@") guard: the email pattern requires a literal '@', so
    // rows without one skip the regex entirely (lossless short-circuit —
    // the dq01 discipline; most corpus rows take the cheap branch).
    "n_emails" -> when(text.isNull || !text.contains("@"), lit(0)).otherwise(
      size(call_function("regexp_extract_all", lower(text), lit(EmailPattern), lit(0)))),
    "n_phones" -> when(text.isNull, lit(0)).otherwise(
      size(call_function("regexp_extract_all", text, lit(PhonePattern), lit(0)))))

  /** Document fingerprint: md5 of the whitespace-normalized lower-cased
    * text — a stable content identity for shard-level dedupe bookkeeping.
    */
  def fingerprint(text: Column): Column =
    md5(TextFunctions.normalizeWhitespace(lower(text)))

  /** 2-char fingerprint prefix — a 256-way bucketing key (reference's
    * HF dir sharding uses UUID[0:2]; assets/processing/assets.py:354-361).
    */
  def fingerprintBucket(text: Column): Column =
    substring(fingerprint(text), 1, 2)
}
