package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF text extraction with OCR fallback (SURVEY S8;
  * resources/convertors/pdf_extractor.py:15-101).
  *
  * Reference semantics preserved:
  *  - per-page text extraction, pages joined;
  *  - when the extracted text is shorter than OCR_THRESHOLD (= 200) chars,
  *    OCR runs over the page images and its output replaces the text IF
  *    longer (pdf_extractor.py:56-101);
  *  - extraction failure → empty text, row survives (fail-soft).
  *
  * The byte-level decoders (PDFBox / tesseract) are NOT available in this
  * container, so [[decodePdfText]] and [[ocrPages]] are clearly-marked
  * deterministic stubs; the real part — the threshold orchestration and the
  * Spark plumbing (binaryFile scan → narrow per-row decode, no shuffle) —
  * is tested. Swap the two stub bodies for PDFBox/tesseract calls in
  * production; nothing else changes.
  */
object PdfExtractor {

  val OcrThreshold = 200

  /** PDF text decoder. Real %PDF payloads go through [[PdfTextParser]] — a
    * pure-JVM content-stream reader (FlateDecode inflate + Tj/TJ/quote text
    * operators) that covers the text-first PDFs the reference's extractor
    * sees; image-only pages yield no text and flow to the OCR fallback
    * below, exactly as in the reference. Non-PDF bytes keep the marked
    * deterministic fake (printable ASCII) so plumbing tests are stable
    * without fixture files. */
  def decodePdfText(payload: Array[Byte]): Seq[String] = {
    if (payload == null || payload.isEmpty) return Seq.empty
    if (PdfTextParser.looksLikePdf(payload))
      return try PdfTextParser.pageTexts(payload) catch { case _: Exception => Seq.empty }
    val printable = payload.iterator.filter(b => b >= 32 && b < 127)
      .map(_.toChar).mkString
    if (printable.isEmpty) Seq.empty else Seq(printable)
  }

  /** STUB OCR — production body: tesseract over rendered page images.
    * Deterministic fake: hex digest prefix as "recognized" text. */
  def ocrPages(payload: Array[Byte]): String = {
    if (payload == null || payload.isEmpty) return ""
    s"[ocr:${java.util.UUID.nameUUIDFromBytes(payload).toString.take(8)}]"
  }

  /** Threshold orchestration — the reference's real control flow. */
  def extractWithOcrFallback(payload: Array[Byte]): String = {
    val text = try decodePdfText(payload).mkString("\n").trim
    catch { case _: Exception => "" }
    if (text.length < OcrThreshold) {
      val ocr = try ocrPages(payload) catch { case _: Exception => "" }
      if (ocr.length > text.length) ocr else text
    } else text
  }

  private val extractUdf = udf((b: Array[Byte]) => extractWithOcrFallback(b))

  /** Attach extracted text to a binary-content DataFrame. Narrow projection:
    * pipelines with the binaryFile scan, never shuffles. */
  def withExtractedText(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("text", extractUdf(col(contentCol)))
}
