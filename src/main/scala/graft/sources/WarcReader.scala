package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pure-JVM WARC (Web ARChive, ISO 28500) record reader — the Common
  * Crawl ingestion source every 100 TB text-corpus pipeline starts from.
  * The reference crawls REST/Atom catalogs record-by-record
  * (assets/connect — CrawlDriver's world); at LLM-corpus scale the crawl
  * is ALREADY DONE and shipped as `.warc.gz` / WET files, so the missing
  * verb is "turn a directory of WARC files into (uri, date, status,
  * body) rows" — this operator, feeding the exact same downstream the
  * reference's crawl feeds (HtmlExtractor → refine → dedupe).
  *
  * Format (WARC/1.0 and 1.1): per record a `WARC/1.x\r\n` version line,
  * `Name: value` header lines, a blank line, exactly `Content-Length`
  * bytes of block, then `\r\n\r\n`. `application/http` response records
  * nest an HTTP message in the block (status line + headers + payload);
  * WET "conversion" records carry extracted `text/plain`. Common Crawl
  * gzips records as CONCATENATED MEMBERS (one per record) so a reader
  * with a byte index can split a 1 GiB file; `java.util.zip.GZIPInputStream`
  * reads concatenated members natively, which is what [[gunzipAll]]
  * leans on.
  *
  * Fail-soft contract (the XlsDecoder/JpegDecoder discipline): garbage,
  * truncation mid-record, a missing/invalid Content-Length, or a
  * corrupted gzip tail yield the records parsed SO FAR — never a throw,
  * never a hang (every loop advances by at least one byte or returns).
  * A bad file costs its tail, not an executor.
  *
  * Scale shape: `binaryFile` hands ONE file per task (Common Crawl
  * segments are ~1 GiB — sized for exactly this one-task granularity), the
  * parse is a single forward pass over the bytes with no allocation
  * beyond the records themselves, and everything downstream is ordinary
  * columnar work. Record-level splitting of one file needs the sidecar
  * cdx index (seek to a member offset) — out of scope here, and unneeded
  * when the unit of parallelism is the file, as it is for Common Crawl's
  * 64k-file crawls.
  */
object WarcReader {

  /** One parsed WARC record; `http_status`/`http_content_type` are null
    * for non-HTTP records (warcinfo, request, conversion/WET, metadata);
    * `body` is the HTTP payload for response records, the raw block
    * otherwise. */
  final case class WarcRow(
      path: String,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_type: String,
      http_status: Option[Int],
      http_content_type: String,
      body: Array[Byte])

  def looksLikeGzip(b: Array[Byte]): Boolean =
    b != null && b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate ALL concatenated gzip members; a corrupt/truncated tail
    * yields the bytes decoded so far (fail-soft). */
  def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: Exception => () }
    out.toByteArray
  }

  /** Parse every well-formed record from (possibly gzipped) WARC bytes. */
  def parse(payload: Array[Byte]): Seq[WarcRow] = parse("", payload)

  def parse(path: String, payloadIn: Array[Byte]): Seq[WarcRow] = {
    if (payloadIn == null || payloadIn.isEmpty) return Seq.empty
    val payload = if (looksLikeGzip(payloadIn)) gunzipAll(payloadIn) else payloadIn
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var i = 0
    while (i < payload.length) {
      parseOne(path, payload, i) match {
        case Some((row, next)) =>
          out += row
          i = math.max(next, i + 1) // monotone progress even on a framing bug
        case None =>
          // not a record start here: resync to the next "WARC/" or stop
          val next = indexOf(payload, "WARC/".getBytes("US-ASCII"), i + 1)
          if (next < 0) i = payload.length else i = next
      }
    }
    out.toSeq
  }

  /** One record at `start`; Some((row, indexAfterRecord)) or None. */
  private def parseOne(path: String, b: Array[Byte], start: Int): Option[(WarcRow, Int)] = {
    val headEnd = indexOf(b, "\r\n\r\n".getBytes("US-ASCII"), start)
    if (headEnd < 0) return None
    val head = new String(b, start, headEnd - start, "ISO-8859-1")
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val h = headers(lines.drop(1))
    val len =
      try h.getOrElse("content-length", return None).trim.toLong
      catch { case _: NumberFormatException => return None }
    val blockStart = headEnd + 4
    if (len < 0 || len > Int.MaxValue || blockStart + len > b.length) return None // truncated
    val block = java.util.Arrays.copyOfRange(b, blockStart, blockStart + len.toInt)
    val contentType = h.getOrElse("content-type", "")
    val (status, httpCt, body) =
      if (contentType.toLowerCase.startsWith("application/http")) parseHttp(block)
      else (None, null, block)
    val row = WarcRow(path,
      h.getOrElse("warc-type", ""),
      stripAngles(h.getOrElse("warc-target-uri", "")),
      h.getOrElse("warc-date", ""),
      stripAngles(h.getOrElse("warc-record-id", "")),
      contentType, status, httpCt, body)
    Some((row, blockStart + len.toInt + 4)) // + the \r\n\r\n record separator
  }

  /** HTTP message inside a response/request record: (status, content-type,
    * payload). A malformed message keeps the whole block as body. */
  private def parseHttp(block: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    val sep = indexOf(block, "\r\n\r\n".getBytes("US-ASCII"), 0)
    if (sep < 0) return (None, null, block)
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ").lift(1)).flatMap(s => scala.util.Try(s.toInt).toOption)
    val ct = headers(lines.drop(1)).get("content-type").orNull
    (status, ct, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def headers(lines: Array[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
    }.toMap

  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.head == '<' && s.last == '>') s.substring(1, s.length - 1) else s

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------ Spark

  /** Explode a binaryFile frame (path, content) into WARC-record rows —
    * one task per file, the Common Crawl granularity (see the scaladoc).
    * Narrow: no shuffle; downstream filters/projections prune as usual. */
  def records(files: DataFrame): Dataset[WarcRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parse(p, bytes) }
  }

  /** Scan `dir` for WARC files and return the record frame. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*.warc*"): Dataset[WarcRow] =
    records(FileCorpus.scan(spark, dir, glob))
}
