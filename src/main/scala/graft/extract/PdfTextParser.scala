package graft.extract

import java.util.zip.Inflater
import scala.collection.mutable

/** Minimal pure-JVM PDF text parser (no PDFBox): finds `stream ...
  * endstream` objects, inflates `/FlateDecode` ones, and replays the text
  * operators (`Tj`, `TJ`, `'`, `"`) of each content stream, honoring
  * literal-string escapes and hex strings. Positioning operators
  * (`Td`/`TD`/`T*`) become newlines.
  *
  * Covers the text-first PDFs the reference's pdf_extractor handles with
  * PDFPlumber before its OCR branch (resources/convertors/pdf_extractor.py:
  * 56-76): simple encodings (WinAnsi/Latin-1 byte strings), uncompressed or
  * Flate-compressed content. CID/Type0 composite fonts render as their raw
  * bytes and will usually fail the OCR-threshold length check, which is the
  * behavior the reference shows on scanned/complex PDFs too.
  */
object PdfTextParser {

  def looksLikePdf(payload: Array[Byte]): Boolean =
    payload != null && payload.length > 4 &&
      new String(payload.take(5), "ISO-8859-1") == "%PDF-"

  /** One string per content stream that produced text, in document order. */
  def pageTexts(payload: Array[Byte]): Seq[String] = {
    val doc = new String(payload, "ISO-8859-1")
    streams(doc, payload).flatMap { case (dict, data) =>
      val bytes =
        if (dict.contains("/FlateDecode")) inflate(data).getOrElse(Array.emptyByteArray)
        else data
      val content = new String(bytes, "ISO-8859-1")
      if (content.contains("BT")) {
        val t = runTextOperators(content).trim
        if (t.nonEmpty) Some(t) else None
      } else None
    }
  }

  /** (dict-prefix, raw stream bytes) for every stream object. */
  private def streams(doc: String, payload: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var from = 0
    while (from < doc.length) {
      val s = doc.indexOf("stream", from)
      if (s < 0) return out.toSeq
      val e = doc.indexOf("endstream", s)
      if (e < 0) return out.toSeq
      // dict = text between the enclosing "<<" and "stream"
      val dictStart = doc.lastIndexOf("<<", s)
      val dict = if (dictStart >= 0) doc.substring(dictStart, s) else ""
      // data begins after "stream" + EOL (CRLF or LF per spec)
      var dataStart = s + "stream".length
      if (dataStart < doc.length && doc.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
      var dataEnd = e
      // strip the EOL that precedes "endstream"
      if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\n') dataEnd -= 1
      if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\r') dataEnd -= 1
      if (dataEnd > dataStart)
        out += dict -> java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
      from = e + "endstream".length
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return Some(out.toByteArray)
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Replay the content stream's text operators into extracted text. */
  private[graft] def runTextOperators(content: String): String = {
    val text = new StringBuilder
    val pending = mutable.ArrayBuffer.empty[String]
    var i = 0
    def flushAsShow(): Unit = { pending.foreach(text ++= _); pending.clear() }
    def newline(): Unit =
      if (text.nonEmpty && !text.endsWith("\n")) text += '\n'
    while (i < content.length) {
      content.charAt(i) match {
        case '(' =>
          val (s, next) = literalString(content, i)
          pending += s; i = next
        case '<' if i + 1 < content.length && content.charAt(i + 1) != '<' =>
          val end = content.indexOf('>', i)
          if (end < 0) i = content.length
          else {
            val hex = content.substring(i + 1, end).filterNot(_.isWhitespace)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            pending += padded.grouped(2)
              .map(h => Integer.parseInt(h, 16).toChar).mkString
            i = end + 1
          }
        case '\'' => flushAsShow(); i += 1
        case '"' => flushAsShow(); i += 1
        case c if c.isLetter || c == '*' =>
          var j = i
          while (j < content.length &&
            (content.charAt(j).isLetter || content.charAt(j) == '*')) j += 1
          content.substring(i, j) match {
            case "Tj" | "TJ" => flushAsShow()
            case "Td" | "TD" | "T*" => newline()
            case "ET" => newline(); pending.clear()
            case _ => pending.clear() // strings consumed by a non-show op
          }
          i = j
        case _ => i += 1
      }
    }
    text.toString
  }

  /** Parse a PDF literal string starting at `(`; returns (text, nextIndex). */
  private def literalString(content: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < content.length && depth > 0) {
      content.charAt(i) match {
        case '\\' if i + 1 < content.length =>
          content.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '(' => sb += '('; i += 2
            case ')' => sb += ')'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '\n' => i += 2 // line continuation
            case d if d.isDigit => // octal, up to 3 digits
              var j = i + 1
              while (j < content.length && j < i + 4 && content.charAt(j).isDigit) j += 1
              sb += Integer.parseInt(content.substring(i + 1, j), 8).toChar
              i = j
            case other => sb += other; i += 2
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb += ')'
          i += 1
        case c => sb += c; i += 1
      }
    }
    (sb.toString, i)
  }
}
