package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text kernels as pure Column expressions (codegen'd, no UDFs).
  *
  * Each kernel re-expresses a reference behavior:
  *  - wordCount:      assets/processing/assets.py:291 (`len(text.split())`)
  *  - normalizeWhitespace: resources/convertors/html_extractor.py:28-52
  *  - numericClean:   resources/convertors/csv_to_parquet.py:33-49,128-130
  *  - safeName:       resources/convertors/spreadsheet_to_parquet.py:46-61
  *  - licenseNormalize: assets/processing/assets.py:299-315
  *  - nullifyTokens:  csv_to_parquet.py:30 (null token set)
  */
object TextFunctions {

  /** Python-`str.split()` word count: 0 on null/blank, else count of
    * whitespace-separated runs after trimming.
    */
  def wordCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Collapse internal whitespace runs to single spaces, strip NBSP, trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, " ", " "), "\\s+", " "))

  /** Null-token set from the reference's CSV converter. */
  val NullTokens: Seq[String] =
    Seq("NA", "N/A", "NULL", "null", "na", "n/a", "None", "NONE", "-", "")

  /** Map the reference's null tokens to SQL null. */
  def nullifyTokens(c: Column): Column =
    when(trim(c).isin(NullTokens: _*), lit(null)).otherwise(c)

  /** Strip whitespace/thousands separators, currency symbols and `%` so the
    * remainder can be cast numeric.
    */
  def numericClean(c: Column): Column =
    regexp_replace(regexp_replace(trim(c), "[\\s,]", ""), "[£$€%]", "")

  /** Filesystem-safe name: non-alphanumerics → `_`, collapse runs, strip
    * leading/trailing `_`/`.`, truncate to 200 chars.
    */
  def safeName(c: Column): Column =
    substring(
      regexp_replace(
        regexp_replace(regexp_replace(lower(c), "[^a-z0-9._-]+", "_"), "_+", "_"),
        "^[_.]+|[_.]+$", ""),
      1, 200)

  /** License-string normalization map (reference keeps a 12-entry lookup;
    * missing license defaults to OGL, unknown stays null).
    */
  val LicenseMap: Map[String, String] = Map(
    "ogl" -> "OGL-UK-3.0", "ogl-uk-3.0" -> "OGL-UK-3.0",
    "uk-ogl" -> "OGL-UK-3.0", "cc-by" -> "CC BY", "cc-by-4.0" -> "CC BY 4.0",
    "cc-zero" -> "CC0", "cc0" -> "CC0", "odbl" -> "ODbL",
    "mit" -> "MIT", "apache-2.0" -> "Apache-2.0")

  def licenseNormalize(license: Column): Column = {
    val key = lower(coalesce(license, lit("ogl-uk-3.0")))
    LicenseMap.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(key === k, lit(v)).otherwise(acc)
    }
  }
}
