package graft.functions

import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ISO-8601 normalization with the reference's exact semantics
  * (resources/time_utils.py:30-79, pinned by
  * tests/resources/test_time_utils.py:17-69):
  *
  *  - trailing `Z` is an alias for `+00:00`;
  *  - ISO strings parse with `T` or space separator, with or without offset
  *    and fractional seconds; naive times are treated as UTC;
  *  - fallback English formats: `d MMM yyyy`, `d MMMM yyyy` (each optionally
  *    with ` HH:mm:ss`), `d/M/yyyy`, `d-M-yyyy`, `yyyy-M-d`;
  *  - output is `yyyy-MM-ddTHH:mm:ss[.fraction]+00:00` with the fractional
  *    part trimmed of trailing zeros and omitted when zero;
  *  - empty input → empty output; unparseable → None (the reference raises —
  *    our relational surface uses null so one bad row never kills a stage,
  *    SURVEY §4 fail-soft).
  */
object TimeFunctions {

  private val englishFormats: Seq[DateTimeFormatter] = Seq(
    "d MMM yyyy HH:mm:ss", "d MMMM yyyy HH:mm:ss")
    .map(p => DateTimeFormatter.ofPattern(p, java.util.Locale.ENGLISH))
  private val englishDateFormats: Seq[DateTimeFormatter] = Seq(
    "d MMM yyyy", "d MMMM yyyy", "d/M/yyyy", "d-M-yyyy", "yyyy-M-d")
    .map(p => DateTimeFormatter.ofPattern(p, java.util.Locale.ENGLISH))

  /** Format with UTC offset, microsecond precision, trailing zeros trimmed. */
  private def fmt(odt: OffsetDateTime): String = {
    val utc = odt.withOffsetSameInstant(ZoneOffset.UTC)
    val base = utc.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val micro = utc.getNano / 1000
    if (micro == 0) s"$base+00:00"
    else {
      val frac = f"$micro%06d".reverse.dropWhile(_ == '0').reverse
      s"$base.$frac+00:00"
    }
  }

  /** Scala port of `parse_to_iso8601_utc`. Some(iso) on success, Some("")
    * on empty, None on unparseable. */
  def parseToIso8601Utc(s: String): Option[String] = {
    if (s == null) return None
    if (s.isEmpty) return Some("")
    val str = if (s.endsWith("Z")) s.dropRight(1) + "+00:00" else s
    val isoCandidate = // fromisoformat accepts ' ' as the separator too
      if (str.length > 10 && str.charAt(10) == ' ') str.updated(10, 'T') else str

    def tryParse[A](f: => A): Option[A] =
      try Some(f) catch { case _: Exception => None }

    tryParse(OffsetDateTime.parse(isoCandidate)).map(fmt)
      .orElse(tryParse(LocalDateTime.parse(isoCandidate))
        .map(ldt => fmt(ldt.atOffset(ZoneOffset.UTC))))
      .orElse(tryParse(LocalDate.parse(isoCandidate))
        .map(ld => fmt(ld.atStartOfDay.atOffset(ZoneOffset.UTC))))
      .orElse(englishFormats.view.flatMap(f =>
        tryParse(LocalDateTime.parse(s, f))).headOption
        .map(ldt => fmt(ldt.atOffset(ZoneOffset.UTC))))
      .orElse(englishDateFormats.view.flatMap(f =>
        tryParse(LocalDate.parse(s, f))).headOption
        .map(ld => fmt(ld.atStartOfDay.atOffset(ZoneOffset.UTC))))
  }

  private val lenientExtraFormats: Seq[DateTimeFormatter] = Seq(
    "M/d/yyyy", "M-d-yyyy", "MMM d, yyyy", "MMMM d, yyyy", "yyyy/M/d")
    .map(p => DateTimeFormatter.ofPattern(p, java.util.Locale.ENGLISH))

  /** Inference-path date parsing (csv_to_parquet.py's `pd.to_datetime`):
    * pandas resolves ambiguous numeric dates MONTH-FIRST ("01/02/2020" →
    * Jan 2) and accepts "Jan 27, 2025"-style forms, so those take precedence
    * here; anything else falls back to [[parseToIso8601Utc]] (which keeps
    * the day-first `%d/%m/%Y` semantics of time_utils for forms month-first
    * can't parse, e.g. "25/12/2020"). */
  def parseDateLenientToIso(s: String): Option[String] = {
    if (s == null || s.isEmpty) return None
    val monthFirst = lenientExtraFormats.view.flatMap { f =>
      try Some(fmt(LocalDate.parse(s.trim, f).atStartOfDay.atOffset(ZoneOffset.UTC)))
      catch { case _: Exception => None }
    }.headOption
    monthFirst.orElse(parseToIso8601Utc(s).filter(_.nonEmpty))
  }

  private val isoNormalizeUdf =
    udf((s: String) => parseToIso8601Utc(s).filter(_.nonEmpty).orNull)

  private val lenientDateUdf =
    udf((s: String) => parseDateLenientToIso(s).orNull)

  /** Column form of [[parseDateLenientToIso]] — the S4 inference date path. */
  def lenientDateNormalize(c: Column): Column = lenientDateUdf(c)

  /** Column form: normalized ISO string, null on empty/unparseable/null.
    * (A deterministic scalar; registered as a UDF — the date-parse fallback
    * chain has no loss-free built-in equivalent.) */
  def isoNormalize(c: Column): Column = isoNormalizeUdf(c)

  /** `now_iso8601_utc` (time_utils.py:4-6). Wall-clock — excluded from all
    * oracle queries; pipelines should prefer an injected clock (SURVEY §7.6). */
  def nowIso8601Utc(): String =
    fmt(java.time.OffsetDateTime.now(ZoneOffset.UTC))
}
