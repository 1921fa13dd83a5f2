package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis kernels for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All pure Column
  * expressions (codegen'd, deterministic, oracle-expressible).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram-free heuristic. */
  val StopwordSets: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"))

  /** Heuristic language ID: count distinct stopword hits per language over
    * the word set; pick the best score (ties broken by language code); CJK
    * codepoints force "zh"; no hits → "und".
    */
  def languageId(text: Column): Column = {
    val ws = array_distinct(split(trim(lower(text)), "\\s+"))
    val scores = StopwordSets.toSeq.sortBy(_._1).map { case (lang, stops) =>
      (lang, size(array_intersect(ws, array(stops.map(lit): _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && sc > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
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
