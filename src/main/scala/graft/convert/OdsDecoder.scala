package graft.convert

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import scala.collection.mutable

/** Pure-JVM ODS (OpenDocument Spreadsheet) decoder — ZIP + `content.xml`,
  * no SODS/POI. The OpenDocument counterpart of [[XlsxDecoder]], feeding
  * the same all-strings [[SpreadsheetConverter.Sheet]] contract
  * (SURVEY S7; resources/convertors/spreadsheet_to_parquet.py:108-186).
  *
  * Rendering matches the XLSX decoder's conventions so the downstream
  * inference treats both formats identically:
  *  - `date` cells: `yyyy-MM-dd` (date-only) or `yyyy-MM-dd HH:mm:ss`
  *    (with a time part) — the ISO normalizer picks these up;
  *  - `time` cells (ISO-8601 durations like `PT10H30M00S`): `HH:mm:ss` —
  *    which the inference's time-only guard deliberately does NOT ISO-ify;
  *  - `boolean`: `TRUE`/`FALSE`; `float`/`percentage`/`currency`: the raw
  *    `office:value` text; `string`: the `text:p` content.
  *
  * ODS quirks handled: `table:number-columns-repeated` /
  * `table:number-rows-repeated` expansion (LibreOffice pads rows to 16k
  * columns with one repeated empty cell — trailing empties are dropped,
  * and empty-cell repeats are capped so a pathological file cannot blow
  * up memory), covered cells from merges, and multi-paragraph text.
  */
object OdsDecoder {

  /** Cap on expanding REPEATED EMPTY cells/rows (content-bearing repeats
    * expand fully; the cap only stops the 16384-column padding idiom). */
  private val MaxEmptyRepeat = 64

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private val TableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  private val OfficeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

  /** Does this (already-ZIP) payload carry an OpenDocument spreadsheet? */
  def looksLikeOds(zipEntries: collection.Map[String, Array[Byte]]): Boolean =
    zipEntries.get("mimetype")
      .map(b => new String(b, "UTF-8").trim)
      .map(_ == "application/vnd.oasis.opendocument.spreadsheet")
      .getOrElse(zipEntries.contains("content.xml") &&
        !zipEntries.contains("xl/workbook.xml"))

  def readZip(payload: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(payload))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName.stripPrefix("/")) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def childElemsNS(parent: Element, ns: String, local: String): Seq[Element] = {
    val nl = parent.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case e: Element if e.getLocalName == local &&
        (e.getNamespaceURI == ns || ns == "*") => e
    }
  }

  /** `PT10H30M5S`-style duration → `HH:mm:ss` (the Time-column shape). */
  def renderDuration(dur: String): String =
    try {
      val d = java.time.Duration.parse(dur)
      f"${d.toHours}%02d:${d.toMinutesPart}%02d:${d.toSecondsPart}%02d"
    } catch { case _: Exception => dur }

  /** `2023-03-01` stays; `2023-03-01T10:00:00` → `2023-03-01 10:00:00`. */
  def renderDate(iso: String): String =
    if (iso.contains('T')) {
      val Array(dpart, tpart) = iso.split("T", 2)
      val t = tpart.takeWhile(c => c.isDigit || c == ':')
      val padded = t.split(":").toSeq.padTo(3, "00").map(s => f"${s.toInt}%02d")
      s"$dpart ${padded.mkString(":")}"
    } else iso

  private def cellValue(cell: Element): Option[String] = {
    def attr(ns: String, n: String): Option[String] =
      Option(cell.getAttributeNS(ns, n)).filter(_.nonEmpty)
    val vt = attr(OfficeNs, "value-type").getOrElse("")
    vt match {
      case "date" => attr(OfficeNs, "date-value").map(renderDate)
      case "time" => attr(OfficeNs, "time-value").map(renderDuration)
      case "boolean" =>
        attr(OfficeNs, "boolean-value").map(b => if (b == "true") "TRUE" else "FALSE")
      case "float" | "percentage" | "currency" =>
        attr(OfficeNs, "value")
      case _ => // string (or untyped): paragraph text, \n-joined
        val ps = childElemsNS(cell, "*", "p").map(_.getTextContent)
        if (ps.isEmpty) None else Some(ps.mkString("\n"))
    }
  }

  private def decodeRow(row: Element): Seq[Option[String]] = {
    val out = mutable.ArrayBuffer.empty[Option[String]]
    childElemsNS(row, TableNs, "table-cell").foreach { cell =>
      val repeat = Option(cell.getAttributeNS(TableNs, "number-columns-repeated"))
        .filter(_.nonEmpty).map(_.toInt).getOrElse(1)
      val v = cellValue(cell)
      val n = if (v.isEmpty) math.min(repeat, MaxEmptyRepeat) else repeat
      (0 until n).foreach(_ => out += v)
    }
    // drop the trailing padding LibreOffice writes out to the sheet width
    out.toSeq.reverse.dropWhile(_.isEmpty).reverse
  }

  /** Decode an ODS payload into ordered sheets of string cells; header =
    * first row, extra unnamed columns `unnamed_i` — identical contract to
    * [[XlsxDecoder.decode]]. Empty on anything that doesn't parse. */
  def decode(payload: Array[Byte]): Seq[SpreadsheetConverter.Sheet] = {
    val parts = readZip(payload)
    val content = parts.get("content.xml").getOrElse(return Seq.empty)
    val doc = parseXml(content)
    val tables = doc.getElementsByTagNameNS(TableNs, "table")
    (0 until tables.getLength).map(tables.item(_).asInstanceOf[Element]).map { t =>
      val name = Option(t.getAttributeNS(TableNs, "name")).filter(_.nonEmpty)
        .getOrElse("sheet")
      val rows = mutable.ArrayBuffer.empty[Seq[Option[String]]]
      childElemsNS(t, TableNs, "table-row").foreach { r =>
        val repeat = Option(r.getAttributeNS(TableNs, "number-rows-repeated"))
          .filter(_.nonEmpty).map(_.toInt).getOrElse(1)
        val decoded = decodeRow(r)
        val n = if (decoded.isEmpty) math.min(repeat, MaxEmptyRepeat) else repeat
        (0 until n).foreach(_ => rows += decoded)
      }
      // drop trailing all-empty rows (the row-repeat padding idiom)
      val trimmed = rows.toSeq.reverse.dropWhile(_.forall(_.isEmpty)).reverse
      val width = trimmed.foldLeft(0)((m, r) => math.max(m, r.length))
      val header0 = trimmed.headOption.getOrElse(Seq.empty)
      val header = (0 until width).map(j =>
        header0.lift(j).flatten.getOrElse(s"unnamed_$j"))
      val data = trimmed.drop(1).map(r => (0 until width).map(j => r.lift(j).flatten.orNull))
      SpreadsheetConverter.Sheet(name, header, data)
    }
  }
}
