package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus scan operators (SURVEY S16/S17, P4/J2):
  * recursive binary scan, sidecar-metadata association, extension histogram.
  *
  * Reference: resources/refine/dedupe.py:69 (rglob skipping .DS_Store),
  * assets/processing/assets.py:330-346 (metadata `X_metadata.json` probing
  * `X.{ext}`), resources/count_extensions.py:47-73 (extension histogram
  * ignoring metadata files).
  *
  * Scale shape: `binaryFile` scans parallelize listing and reading across
  * executors; the metadata↔data association is an equi-join on (dir, stem)
  * — a hash join, never a per-file probe loop.
  */
object FileCorpus {

  /** Recursive binary scan: (path, length, content), `.DS_Store` skipped. */
  def scan(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .filter(!col("path").endsWith(".DS_Store"))
      .select(col("path"), col("length"), col("content"))

  /** Listing-only scan (no content read — column pruning drops the bytes). */
  def listing(spark: SparkSession, dir: String): DataFrame =
    scan(spark, dir).select(col("path"), col("length"))

  private def fileName(c: org.apache.spark.sql.Column) =
    element_at(split(c, "/"), -1)

  /** Lower-cased extension ("" when none). */
  def extension(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val name = fileName(c)
    when(name.contains("."), lower(element_at(split(name, "\\."), -1)))
      .otherwise(lit(""))
  }

  /** `*_metadata.json` sidecar predicate (dedupe.py:69). */
  def isMetadataFile(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    fileName(c).endsWith("_metadata.json")

  /** Extension histogram, metadata sidecars excluded, count-desc with
    * extension tie-break (SURVEY S17/A2/Q2). */
  def extensionHistogram(files: DataFrame): DataFrame =
    files.filter(!isMetadataFile(col("path")))
      .groupBy(extension(col("path")).as("extension"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("extension"))

  /** Metadata↔data association (SURVEY J2): for each `X_metadata.json`, the
    * sibling `X.{ext}` rows with ext in `supported`. Returns
    * (meta_path, data_path, ext). */
  def associateMetadata(files: DataFrame, supported: Seq[String]): DataFrame = {
    val dir = expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)))")
    val metas = files.filter(isMetadataFile(col("path")))
      .select(col("path").as("meta_path"), dir.as("dir"),
        regexp_replace(fileName(col("path")), "_metadata\\.json$", "").as("stem"))
    val data = files.filter(!isMetadataFile(col("path")))
      .select(col("path").as("data_path"), dir.as("dir"),
        regexp_replace(fileName(col("path")), "\\.[^.]*$", "").as("stem"),
        extension(col("path")).as("ext"))
      .filter(col("ext").isin(supported: _*))
    metas.join(data, Seq("dir", "stem"))
      .select(col("meta_path"), col("data_path"), col("ext"))
  }

  /** Standalone-JSON filter (SURVEY P4): among `.json` paths, drop any whose
    * stem has a sibling `X_metadata.json` (keeps true metadata docs). */
  def standaloneJsons(files: DataFrame): DataFrame = {
    val dir = expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)))")
    val jsons = files.filter(extension(col("path")) === "json" && !isMetadataFile(col("path")))
      .select(col("path"), dir.as("dir"),
        regexp_replace(fileName(col("path")), "\\.json$", "").as("stem"))
    val metaStems = files.filter(isMetadataFile(col("path")))
      .select(dir.as("dir"),
        regexp_replace(fileName(col("path")), "_metadata\\.json$", "").as("stem"))
    jsons.join(metaStems, Seq("dir", "stem"), "left_anti").select(col("path"))
  }
}
