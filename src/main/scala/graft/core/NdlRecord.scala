package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** The reference's canonical record schema (SURVEY §1.2;
  * assets/processing/assets.py:276-296) as a typed Dataset row.
  *
  * Field semantics preserved: dates stay ISO-8601 STRINGS (the reference
  * never uses native timestamps for record dates); `identifier` is a
  * content hash instead of uuid4 so records are reproducible (SURVEY §7.6);
  * `extra_metadata` carries leftover metadata as a JSON string queried via
  * `get_json_object`.
  */
final case class NdlRecord(
    identifier: String,
    title: String,
    description: String,
    source: String,
    date: String,
    collection_time: String,
    open_type: String,
    license: String,
    tags: Seq[String],
    language: String,
    format: String,
    text: String,
    word_count: Int,
    token_count: Int,
    data_file: String,
    extra_metadata: String)

object NdlRecord {

  val DefaultOpenType = "Open Government"

  /** Build the canonical record frame from raw text rows.
    *
    * @param collectionTime injected clock value (the reference stamps
    *        wall-clock now; determinism requires injection, SURVEY §7.6)
    */
  def fromRaw(df: DataFrame, textCol: String, titleCol: String,
      sourceCol: String, langCol: String, dataFileCol: String,
      collectionTime: String): DataFrame = {
    val text = col(textCol)
    df.select(
      sha2(text, 256).as("identifier"),
      col(titleCol).as("title"),
      substring(text, 1, 200).as("description"),
      col(sourceCol).as("source"),
      lit(null).cast("string").as("date"),
      lit(collectionTime).as("collection_time"),
      lit(DefaultOpenType).as("open_type"),
      TextFunctions.licenseNormalize(lit(null)).as("license"),
      array().cast("array<string>").as("tags"),
      coalesce(when(length(col(langCol)) === 0, lit(null)).otherwise(col(langCol)),
        lit("en")).as("language"),
      lit("text").as("format"),
      text.as("text"),
      TextFunctions.wordCount(text).as("word_count"),
      TextAnalysis.tokenCount(text).as("token_count"),
      col(dataFileCol).as("data_file"),
      lit("{}").as("extra_metadata"))
  }

  /** Typed view. */
  def dataset(spark: SparkSession, df: DataFrame): Dataset[NdlRecord] = {
    import spark.implicits._
    df.as[NdlRecord]
  }
}
