package graft.convert

import java.nio.charset.{Charset, StandardCharsets}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.refine.CsvTypeInference

/** CSV → typed DataFrame (SURVEY S3/S4;
  * resources/convertors/csv_to_parquet.py:52-109).
  *
  * The reference reads every column as string (`dtype=str`,
  * `keep_default_na=False`) after charset sniffing, then runs per-column
  * inference. Spark mapping: `inferSchema=false` header read (all columns
  * land as nullable strings, exactly the reference's raw frame) + the shared
  * two-pass inference. Charset: Spark's csv reader takes an `encoding`
  * option per load; [[sniffCharset]] provides a BOM/UTF-8-validity heuristic
  * for callers that need per-file detection (the reference uses
  * charset_normalizer; we preserve the contract — bytes in, charset name
  * out — with a deterministic JVM heuristic).
  */
object CsvConverter {

  /** BOM + UTF-8 validity charset sniff. Returns a charset name usable as
    * the Spark csv `encoding` option. */
  def sniffCharset(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte
      && bytes(2) == 0xBF.toByte) return "UTF-8"
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return "UTF-16LE"
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return "UTF-16BE"
    val decoder = StandardCharsets.UTF_8.newDecoder()
    try { decoder.decode(java.nio.ByteBuffer.wrap(bytes)); "UTF-8" }
    catch { case _: Exception => "ISO-8859-1" }
  }

  /** All-string CSV read (the reference's raw frame). */
  def readRaw(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("encoding", encoding)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Full converter: all-string read → two-pass inference → typed frame. */
  def convert(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): DataFrame =
    CsvTypeInference.convert(readRaw(spark, path, encoding))

  /** Charset helper on a file path (reads the first 64 KiB). */
  def sniffCharsetOfFile(path: String): String = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try sniffCharset(in.readNBytes(65536)) finally in.close()
  }
}
