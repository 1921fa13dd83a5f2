package graft.convert

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.refine.CsvTypeInference

/** JSON payload → typed DataFrame (SURVEY S5/S6;
  * resources/convertors/json_to_parquet.py:37-149).
  *
  * Shape normalization semantics preserved exactly:
  *  - list of records → as-is;
  *  - `{data|results|rows|items: [...]}` wrappers → the wrapped list;
  *  - columnar dict of equal-length lists → transposed to records;
  *  - any other single object → one record;
  *  - API error payloads (`{"error": ...}`) → None (file skipped);
  *  - invalid JSON → None.
  *
  * Flattening mirrors `pd.json_normalize`: nested objects become dot-joined
  * columns; residual lists/objects are serialized to JSON strings
  * (json_to_parquet.py:78-92). Typing then reuses the CSV inference pass
  * (null tokens, 90 % numeric, 50 % ISO-date thresholds).
  *
  * Scale shape: the shape dispatch runs per file (small payloads, driver or
  * executor side via flatMap over a corpus of JSON strings); the inference
  * aggregate runs distributed over the union.
  */
object JsonConverter {

  private val mapper = new ObjectMapper()

  private val WrapperKeys = Seq("data", "results", "rows", "items")

  /** Normalize a parsed JSON tree to records. None = error payload. */
  private[convert] def normalizeToRecords(root: JsonNode): Option[Seq[JsonNode]] = {
    if (root == null) return None
    if (root.isArray) return Some(root.elements.asScala.toSeq)
    if (root.isObject) {
      if (root.has("error")) return None
      for (k <- WrapperKeys)
        if (root.has(k) && root.get(k).isArray)
          return Some(root.get(k).elements.asScala.toSeq)
      val fields = root.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
      if (fields.nonEmpty && fields.forall(_._2.isArray)) {
        val lengths = fields.map(_._2.size).distinct
        if (lengths.size == 1) {
          // columnar dict → transpose
          val n = lengths.head
          return Some((0 until n).map { i =>
            val rec = mapper.createObjectNode()
            fields.foreach { case (k, v) => rec.set[JsonNode](k, v.get(i)) }
            rec
          })
        }
      }
      return Some(Seq(root))
    }
    Some(Seq.empty)
  }

  /** pd.json_normalize-style flattening: nested objects dot-joined, lists
    * and leftover objects serialized to JSON strings, scalars stringified
    * (typing happens later in the inference pass). */
  private[convert] def flatten(node: JsonNode, prefix: String = ""): Seq[(String, String)] =
    if (node.isObject) {
      node.properties().asScala.toSeq.flatMap { e =>
        val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        val v = e.getValue
        if (v.isObject) flatten(v, key)
        else if (v.isArray) Seq(key -> mapper.writeValueAsString(v))
        else if (v.isNull) Seq(key -> null)
        else Seq(key -> v.asText())
      }
    } else Seq(prefix -> mapper.writeValueAsString(node))

  /** One JSON document string → flat all-string records. None = error
    * payload or invalid JSON (the reference skips such files). */
  def toRecords(json: String): Option[Seq[Map[String, String]]] = {
    val root = try mapper.readTree(json) catch { case _: Exception => return None }
    normalizeToRecords(root).map(_.map(n => flatten(n).toMap))
  }

  /** Build a typed DataFrame from JSON document strings: union of all
    * records (columns = union of keys, in first-encounter order), then the
    * shared inference pass. */
  def convert(spark: SparkSession, jsons: Seq[String]): DataFrame = {
    val recs = jsons.flatMap(toRecords).flatten
    val cols = recs.foldLeft(Vector.empty[String]) { (acc, r) =>
      acc ++ r.keys.filterNot(acc.contains)
    }
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    val rows = recs.map(r => Row.fromSeq(cols.map(c => r.getOrElse(c, null))))
    val raw = spark.createDataFrame(rows.asJava, schema)
    CsvTypeInference.convert(raw)
  }
}
