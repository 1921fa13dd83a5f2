package graft.refine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII anonymization with the reference's exact replacement literals
  * (resources/refine/anonymizer.py:13-44, pinned by
  * tests/resources/test_anonymizer.py:6-26):
  *
  *  - EMAIL_ADDRESS → `xxx@xxx.xx`
  *  - PHONE_NUMBER  → `xx-xxxx-xxxx`
  *  - texts of >= 1,000,000 chars are skipped (presidio guard,
  *    anonymizer.py:29-31)
  *  - identity on clean text
  *
  * Implemented as a pure `regexp_replace` chain — codegen'd, SQL-expressible
  * (so it carries a DuckDB oracle), and trivially parallel at 100 TB: a
  * narrow projection with no shuffle. The reference's presidio NLP
  * recognizers are replicated as regex recognizers for emails and UK/intl
  * phone shapes; the contract (the two replacement literals + skip guard) is
  * what the reference's own tests pin.
  */
object Anonymizer {

  val MaxTextLength = 1000000

  /** Email recognizer. */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone recognizer: international `+CC nnnn...` (9-13 further digits) or
    * UK 0-prefixed 10/11-digit numbers, with optional space/dash separators.
    * Anchored to those prefixes so digit runs in ordinary text (dates, ids,
    * "2025-01-27") are never touched. */
  val PhoneRegex =
    "(\\+\\d{1,3}(?:[ -]?\\d){8,12})|(\\b0(?:[ -]?\\d){9,10}\\b)"

  def anonymizeEmails(text: Column): Column =
    regexp_replace(text, EmailRegex, "xxx@xxx.xx")

  def anonymizePhones(text: Column): Column =
    regexp_replace(text, PhoneRegex, "xx-xxxx-xxxx")

  /** Full anonymization with the size guard: texts at or above
    * `MaxTextLength` chars pass through untouched. */
  def anonymize(text: Column): Column =
    when(text.isNull || length(text) >= MaxTextLength, text)
      .otherwise(anonymizePhones(anonymizeEmails(text)))
}
