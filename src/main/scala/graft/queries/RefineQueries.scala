package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import graft.refine.{Anonymizer, RefinePipeline}

/** Refine-lifecycle declared queries: PII anonymization (M4), the full §3.1
  * processing pipeline, and conversation explode (M6) + ordered-unique
  * speakers (U4). Every kernel here is SQL-expressible → full DuckDB oracle.
  */
object RefineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** r01 — PII anonymization over documents (SURVEY M4). Narrow projection:
    * no shuffle, fully codegen'd regex replace. */
  def r01Anonymize(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Anonymizer.anonymize(col("text")).as("anon"))
      .orderBy(col("doc_id"))

  /** r02 — the §3.1 lifecycle end-to-end: dedupe → length gate → enrich →
    * tag merge-back. One window shuffle + one broadcast join total. */
  def r02RefinePipeline(s: SparkSession, d: String): DataFrame = {
    val licKey = when(col("source").isin("src0", "src3"), "ogl")
      .when(col("source") === "src1", "cc-by")
      .when(col("source") === "src2", "cc-zero")
      .otherwise(lit(null).cast("string"))
    val deduped = RefinePipeline.dedupe(documents(s, d), col("text"), col("doc_id"))
    val enriched = RefinePipeline.enrich(deduped, col("text"), col("lang"), licKey)
    val preds = embeddings(s, d).filter(col("label") % 2 === 0)
      .select(col("vec_id").as("key"), concat(lit("label_"), col("label")).as("pred"))
    RefinePipeline.mergeTags(enriched, col("doc_id"), col("source"), preds)
      .select(col("doc_id"), substring(col("identifier"), 1, 16).as("identifier"),
        col("word_count"), col("token_count"), col("license"), col("lang_final"),
        col("tags"))
      .orderBy(col("doc_id"))
  }

  /** r03 — conversation explode with metadata inheritance (SURVEY M6):
    * 1 doc → N sentence-ish segments, title suffixed ` conversation_{i}`,
    * length-gated. */
  def r03ConversationExplode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), "\\. ")))
      .withColumnRenamed("pos", "conv_idx")
      .filter(length(col("col")) >= 40)
      .select(col("doc_id"), col("conv_idx"),
        concat(col("source"), lit(" conversation_"), col("conv_idx")).as("conv_title"),
        length(col("col")).as("seg_len"))
      .orderBy(col("doc_id"), col("conv_idx"))

  /** r04 — ordered-unique collection (SURVEY U4: speakers list preserves
    * first-encounter order, no dups). Deterministic under parallel agg via
    * sort_array-of-structs before distinct. Serialized to a '|' string so
    * the driver's pandas comparator can hash it (mirrored in the oracle). */
  def r04OrderedDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(array_join(array_distinct(transform(
        sort_array(collect_list(struct(col("event_id"), col("event_type")))),
        x => x.getField("event_type"))), "|").as("types_in_order"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** c01 — the S4 type-inference converter end-to-end: stringify five
    * lineitem columns (as a CSV read would produce), run the two-pass
    * profile+cast, and return the typed values. Decisions exercised:
    * integral-double → long, decimal → double, date → ISO string,
    * low-parse-rate → string. */
  def c01TypeInference(s: SparkSession, d: String): DataFrame = {
    import graft.refine.CsvTypeInference
    val raw = lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0) // keep the profiling pass cheap
      .select(
        col("l_orderkey").cast("string").as("okey"),
        col("l_quantity").cast("string").as("qty"),
        col("l_extendedprice").cast("string").as("price"),
        col("l_returnflag").as("flag"),
        col("l_shipdate").cast("string").as("ship"))
    CsvTypeInference.convert(raw)
      .orderBy(col("okey"), col("qty"), col("price"), col("flag"), col("ship"))
  }

  val queries: Map[String, Q] = Map(
    "c01_type_inference" -> c01TypeInference,
    "r01_anonymize" -> r01Anonymize,
    "r02_refine_pipeline" -> r02RefinePipeline,
    "r03_conversation_explode" -> r03ConversationExplode,
    "r04_ordered_distinct" -> r04OrderedDistinct)

  private val emailSql = Anonymizer.EmailRegex
  private val phoneSql = Anonymizer.PhoneRegex
  private val anonSql =
    s"""CASE WHEN text IS NULL OR length(text) >= ${Anonymizer.MaxTextLength} THEN text
        ELSE regexp_replace(regexp_replace(text, '$emailSql', 'xxx@xxx.xx', 'g'),
                            '$phoneSql', 'xx-xxxx-xxxx', 'g') END"""

  private val tokenSql = (c: String) =>
    s"""CASE WHEN $c IS NULL OR length($c) = 0 THEN 0
        ELSE len(regexp_extract_all(lower($c), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) END"""

  val oracle: Map[String, String] = Map(
    "c01_type_inference" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS okey,
                CAST(l_quantity AS BIGINT) AS qty,
                CAST(l_extendedprice AS DOUBLE) AS price,
                l_returnflag AS flag,
                strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS ship
         FROM lineitem WHERE l_orderkey % 100 = 0
         ORDER BY okey, qty, price, flag, ship""",
    "r01_anonymize" ->
      s"SELECT doc_id, $anonSql AS anon FROM documents ORDER BY doc_id",
    "r02_refine_pipeline" ->
      s"""WITH deduped AS (
            SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
              FROM documents) t WHERE rn = 1
          ), enriched AS (
            SELECT doc_id, source, lang, text,
                   substr(sha256(text), 1, 16) AS identifier,
                   CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                        ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) END AS word_count,
                   CAST(${tokenSql("text")} AS INTEGER) AS token_count,
                   CASE WHEN source IN ('src0','src3') THEN 'OGL-UK-3.0'
                        WHEN source = 'src1' THEN 'CC BY'
                        WHEN source = 'src2' THEN 'CC0'
                        ELSE 'OGL-UK-3.0' END AS license,
                   coalesce(CASE WHEN length(lang) = 0 THEN NULL ELSE lang END, 'en') AS lang_final
            FROM deduped WHERE length(text) >= ${RefinePipeline.MinTextLength}
          )
          SELECT e.doc_id, e.identifier, e.word_count, e.token_count, e.license, e.lang_final,
                 coalesce('label_' || CAST(p.label AS VARCHAR), e.source) AS tags
          FROM enriched e
          LEFT JOIN (SELECT vec_id, label FROM embeddings WHERE label % 2 = 0) p
            ON e.doc_id = p.vec_id
          ORDER BY e.doc_id""",
    "r03_conversation_explode" ->
      """SELECT doc_id, CAST(g.i - 1 AS INTEGER) AS conv_idx,
                source || ' conversation_' || CAST(g.i - 1 AS VARCHAR) AS conv_title,
                CAST(length(parts[g.i]) AS INTEGER) AS seg_len
         FROM (SELECT doc_id, source, string_split(text, '. ') AS parts FROM documents) t,
              LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) g
         WHERE length(parts[g.i]) >= 40
         ORDER BY doc_id, conv_idx""",
    "r04_ordered_distinct" ->
      """WITH firsts AS (
           SELECT user_id, event_type, min(event_id) AS first_id
           FROM events GROUP BY user_id, event_type
         ), totals AS (
           SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
         )
         SELECT f.user_id,
                string_agg(f.event_type, '|' ORDER BY f.first_id) AS types_in_order,
                any_value(t.n_events) AS n_events
         FROM firsts f JOIN totals t ON f.user_id = t.user_id
         GROUP BY f.user_id ORDER BY f.user_id""")
}
