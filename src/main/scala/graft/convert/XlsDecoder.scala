package graft.convert

import scala.collection.mutable

/** Pure-JVM legacy binary XLS (BIFF8) workbook decoder — no POI.
  *
  * Completes the spreadsheet trio next to [[XlsxDecoder]] (ZIP+XML) and
  * [[OdsDecoder]]: pre-2007 workbooks arrive as OLE2 Compound File Binary
  * containers (MS-CFB) holding a `Workbook` stream of BIFF8 records
  * (MS-XLS) — both formats publicly specified. The reference converts
  * them through pandas/xlrd (resources/convertors/
  * spreadsheet_to_parquet.py:108-186); the semantics preserved here are
  * the same ones the XLSX path pins: every cell as a string, date-styled
  * serials rendered as dates, datetime-styled as date+time, time-styled
  * as `HH:mm:ss` (which downstream inference deliberately does NOT
  * ISO-ify).
  *
  * Scope (documented): BIFF8 (Excel 97+) cell records — LABELSST, LABEL,
  * NUMBER, RK, MULRK, BOOLERR, FORMULA (cached numeric/string results) —
  * with styles via XF + FORMAT + builtin ids; both regular-sector and
  * mini-stream CFB layouts; SST tables spilling into CONTINUE records,
  * including the mid-string split that restarts with a fresh grbit byte
  * (MS-XLS ContinuedString — any real workbook with a non-trivial string
  * table needs this). Malformed tails yield fewer shared strings, never
  * a throw; encrypted workbooks (FILEPASS) return empty.
  * Decoding is driver-free and bounded: one pass over the container, one
  * pass over each sheet sub-stream; the corpus converter parallelizes
  * across FILES, so a single workbook never needs to split.
  */
object XlsDecoder {

  /** OLE2/CFB magic — cheap "is this a legacy xls container" probe. */
  def looksLikeCfb(payload: Array[Byte]): Boolean =
    payload != null && payload.length > 8 &&
      (payload(0) & 0xFF) == 0xD0 && (payload(1) & 0xFF) == 0xCF &&
      (payload(2) & 0xFF) == 0x11 && (payload(3) & 0xFF) == 0xE0

  // ------------------------------------------------------- little-endian io

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u8(b, o) | (u8(b, o + 1) << 8) | (u8(b, o + 2) << 16) | (u8(b, o + 3) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ------------------------------------------------------------- CFB reader

  private val FreeSect = -1 // 0xFFFFFFFF
  private val EndOfChain = -2 // 0xFFFFFFFE

  /** Extract a named stream ("Workbook"/"Book") from a CFB container.
    * Handles the regular FAT chain and the root mini-stream (streams
    * smaller than the 4096-byte cutoff live in 64-byte mini sectors). */
  private[convert] def readStream(payload: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
    if (!looksLikeCfb(payload) || payload.length < 512) return None
    val sectorShift = u16(payload, 30)
    val sectorSize = 1 << sectorShift
    val miniShift = u16(payload, 32)
    val miniSize = 1 << miniShift
    val nFat = i32(payload, 44)
    val firstDir = i32(payload, 48)
    val miniCutoff = i32(payload, 56)
    val firstMiniFat = i32(payload, 60)
    val nMiniFat = i32(payload, 64)
    val firstDifat = i32(payload, 68)
    val nDifat = i32(payload, 72)

    def sectorAt(id: Int): Int = 512 + id * sectorSize

    // DIFAT: 109 entries in the header, then chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && i < nFat + 16) {
      val s = i32(payload, 76 + i * 4)
      if (s >= 0) fatSectors += s
      i += 1
    }
    var difat = firstDifat
    var guard = 0
    while (difat >= 0 && guard < nDifat + 4) {
      val base = sectorAt(difat)
      if (base + sectorSize > payload.length) return None
      var j = 0
      while (j < sectorSize / 4 - 1) {
        val s = i32(payload, base + j * 4)
        if (s >= 0) fatSectors += s
        j += 1
      }
      difat = i32(payload, base + sectorSize - 4)
      guard += 1
    }

    // FAT: concatenated entries of the FAT sectors
    val fat = mutable.ArrayBuffer.empty[Int]
    fatSectors.foreach { fs =>
      val base = sectorAt(fs)
      if (base + sectorSize > payload.length) return None
      var j = 0
      while (j < sectorSize / 4) { fat += i32(payload, base + j * 4); j += 1 }
    }

    def chain(start: Int, limit: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start
      var g = 0
      while (s >= 0 && g < limit) {
        out += s
        if (s >= fat.length) return out.toSeq
        s = fat(s)
        g += 1
      }
      out.toSeq
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start, (payload.length / sectorSize) + 2).foreach { s =>
        val base = sectorAt(s)
        if (base + sectorSize <= payload.length)
          out.write(payload, base, sectorSize)
      }
      val all = out.toByteArray
      all.take(math.min(size, all.length.toLong).toInt)
    }

    // directory entries: 128 bytes each across the directory chain
    val dirBytes = readChain(firstDir, Long.MaxValue)
    final case class Dir(name: String, typ: Int, startSect: Int, size: Long)
    val dirs = (0 until dirBytes.length / 128).map { d =>
      val o = d * 128
      val nameLen = u16(dirBytes, o + 64)
      val name = if (nameLen >= 2)
        new String(dirBytes, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Dir(name, u8(dirBytes, o + 66), i32(dirBytes, o + 116),
        i32(dirBytes, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = dirs.find(_.typ == 5)
    val entry = dirs.find(d => d.typ == 2 && names(d.name))
    entry.flatMap { e =>
      if (e.size >= miniCutoff) Some(readChain(e.startSect, e.size))
      else root.map { r =>
        // mini-stream: 64-byte sectors carved out of the root entry's
        // regular chain, addressed through the miniFAT
        val miniStream = readChain(r.startSect, r.size)
        val miniFatBytes = readChain(firstMiniFat, nMiniFat.toLong * sectorSize)
        val miniFat = (0 until miniFatBytes.length / 4).map(j => i32(miniFatBytes, j * 4))
        val out = new java.io.ByteArrayOutputStream()
        var s = e.startSect
        var g = 0
        while (s >= 0 && g < miniFat.length + 2) {
          val off = s * miniSize
          if (off + miniSize <= miniStream.length) out.write(miniStream, off, miniSize)
          s = if (s < miniFat.length) miniFat(s) else EndOfChain
          g += 1
        }
        out.toByteArray.take(math.min(e.size, Int.MaxValue.toLong).toInt)
      }
    }
  }

  // ------------------------------------------------------------ BIFF records

  private val RkMask = 0xFFFFFFFCL

  /** RK-encoded number: 30-bit int or truncated double, optionally /100. */
  def decodeRk(rk: Int): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & RkMask) << 32)
    if (div100) v / 100.0 else v
  }

  /** XLUnicodeRichExtendedString at `o`; returns (string, bytesConsumed).
    * Rich-text runs and phonetic blocks are skipped over, not rendered. */
  private def readUnicodeString(b: Array[Byte], o: Int): (String, Int) = {
    val cch = u16(b, o)
    val grbit = u8(b, o + 2)
    var p = o + 3
    val fHighByte = (grbit & 1) != 0
    val fExtSt = (grbit & 4) != 0
    val fRichSt = (grbit & 8) != 0
    val cRun = if (fRichSt) { val r = u16(b, p); p += 2; r } else 0
    val cbExt = if (fExtSt) { val r = i32(b, p); p += 4; r } else 0
    val s =
      if (fHighByte) {
        val str = new String(b, p, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
        p += cch * 2; str
      } else {
        val str = new String(b, p, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
        p += cch; str
      }
    p += cRun * 4 + cbExt
    (s, p - o)
  }

  /** Cursor over the SST record's payload segments (the SST record plus
    * its CONTINUE records). Fixed fields read byte-wise across segment
    * boundaries; CHARACTER data observes the BIFF8 continuation rule —
    * a split inside a string's characters restarts the next segment with
    * a fresh grbit byte that may CHANGE the encoding of the remaining
    * characters (MS-XLS §2.5.293 ContinuedString). */
  private final class SegReader(b: Array[Byte], segs: Seq[(Int, Int)]) {
    private var si = 0
    private var pos = if (segs.nonEmpty) segs.head._1 else 0
    private def segEnd = segs(si)._2
    private def advanceIfNeeded(): Boolean = {
      while (si < segs.length && pos >= segEnd) {
        si += 1
        if (si < segs.length) pos = segs(si)._1
      }
      si < segs.length
    }
    def hasMore(n: Int): Boolean = {
      var left = n
      var s = si; var p = pos
      while (left > 0 && s < segs.length) {
        val take = math.min(left, segs(s)._2 - p)
        left -= math.max(take, 0)
        s += 1; if (s < segs.length) p = segs(s)._1
      }
      left <= 0
    }
    def u8(): Int = {
      if (!advanceIfNeeded()) return -1
      val v = b(pos) & 0xFF; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); val hi = u8(); if (lo < 0 || hi < 0) -1 else lo | (hi << 8) }
    def i32(): Int = { val a = u16(); val c = u16(); if (a < 0 || c < 0) -1 else a | (c << 16) }
    def skip(n: Long): Unit = { var k = 0L; while (k < n && u8() >= 0) k += 1 }
    /** Read `cch` characters honoring the re-grbit rule at boundaries. */
    def chars(cch: Int, highByteAtStart: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var high = highByteAtStart
      var k = 0
      while (k < cch) {
        if (!advanceIfNeeded()) return sb.toString
        if (pos == segs(si)._1 && si > 0) {
          // first byte of a continuation segment reached mid-characters:
          // a fresh grbit byte precedes the continued character data
          val g = u8()
          if (g < 0) return sb.toString
          high = (g & 1) != 0
        }
        if (high) {
          val lo = u8(); val hi = u8()
          if (lo < 0 || hi < 0) return sb.toString
          sb.append((lo | (hi << 8)).toChar)
        } else {
          val c = u8()
          if (c < 0) return sb.toString
          sb.append(c.toChar)
        }
        k += 1
      }
      sb.toString
    }
  }

  /** One XLUnicodeRichExtendedString via the segment cursor. */
  private def readSstString(r: SegReader): Option[String] = {
    val cch = r.u16()
    if (cch < 0) return None
    val grbit = r.u8()
    if (grbit < 0) return None
    val fHighByte = (grbit & 1) != 0
    val fExtSt = (grbit & 4) != 0
    val fRichSt = (grbit & 8) != 0
    val cRun = if (fRichSt) r.u16() else 0
    val cbExt = if (fExtSt) r.i32() else 0
    if (cRun < 0 || cbExt < 0) return None
    val s = r.chars(cch, fHighByte)
    r.skip(cRun.toLong * 4 + cbExt.toLong)
    Some(s)
  }

  /** Short (8-bit length) string used by BOUNDSHEET sheet names. */
  private def readShortString(b: Array[Byte], o: Int): String = {
    val cch = u8(b, o)
    val grbit = u8(b, o + 1)
    if ((grbit & 1) != 0)
      new String(b, o + 2, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(b, o + 2, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private final case class Rec(id: Int, at: Int, len: Int)

  private def records(stream: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var p = from
      def hasNext: Boolean = p + 4 <= stream.length
      def next(): Rec = {
        val id = u16(stream, p)
        val len = u16(stream, p + 2)
        val r = Rec(id, p + 4, math.min(len, stream.length - p - 4))
        p += 4 + len
        r
      }
    }

  /** Decode a legacy xls payload into ordered sheets of string cells.
    * Returns empty on anything that doesn't parse as a BIFF8 workbook. */
  def decode(payload: Array[Byte]): Seq[SpreadsheetConverter.Sheet] = try {
    val streamOpt = readStream(payload, Set("Workbook", "Book"))
    if (streamOpt.isEmpty) return Seq.empty
    val wb = streamOpt.get
    if (wb.length < 8 || u16(wb, 0) != 0x0809) return Seq.empty

    // ---- workbook globals: SST, XF -> numFmtId, FORMAT codes, BOUNDSHEETs
    val sst = mutable.ArrayBuffer.empty[String]
    val xfFmt = mutable.ArrayBuffer.empty[Int]
    val customFmts = mutable.Map.empty[Int, String]
    final case class Bound(name: String, offset: Int)
    val bounds = mutable.ArrayBuffer.empty[Bound]
    val globals = records(wb, 0)
    var done = false
    while (globals.hasNext && !done) {
      val r = globals.next()
      r.id match {
        case 0x000A => done = true // EOF of the globals sub-stream
        case 0x002F => return Seq.empty // FILEPASS: encrypted workbook
        case 0x0085 => // BOUNDSHEET
          bounds += Bound(readShortString(wb, r.at + 6), i32(wb, r.at))
        case 0x00FC => // SST: cstTotal(4) cstUnique(4) then strings, possibly
          // spilling into CONTINUE records (0x003C) — real workbooks cross
          // the 8224-byte record cap as soon as the shared-string table is
          // non-trivial, so CONTINUE handling is required, not optional
          val unique = i32(wb, r.at + 4)
          val segs = mutable.ArrayBuffer((r.at + 8, r.at + r.len))
          val ahead = records(wb, r.at + r.len)
          var more = true
          while (more && ahead.hasNext) {
            val nr = ahead.next()
            if (nr.id == 0x003C) segs += ((nr.at, nr.at + nr.len)) else more = false
          }
          val reader = new SegReader(wb, segs.toSeq)
          var k = 0
          while (k < unique && reader.hasMore(3)) {
            readSstString(reader).foreach(sst += _)
            k += 1
          }
        case 0x00E0 => xfFmt += u16(wb, r.at + 2) // XF: ifmt at offset 2
        case 0x041E => // FORMAT: ifmt(2) + unicode code string
          val id = u16(wb, r.at)
          customFmts(id) = readUnicodeString(wb, r.at + 2)._1
        case _ =>
      }
    }

    def styleOf(xf: Int): XlsxDecoder.CellStyle = {
      val fmt = if (xf >= 0 && xf < xfFmt.length) xfFmt(xf) else 0
      XlsxDecoder.classifyFormat(fmt, customFmts.toMap)
    }
    def renderNum(v: Double, xf: Int): String = styleOf(xf) match {
      case XlsxDecoder.PlainStyle =>
        if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
      case st => XlsxDecoder.renderSerial(v, st)
    }

    // ---- each sheet sub-stream: cells keyed by (row, col)
    bounds.toSeq.map { bd =>
      val cells = mutable.Map.empty[(Int, Int), String]
      var maxRow = -1
      var maxCol = -1
      def put(row: Int, colI: Int, v: String): Unit = {
        cells((row, colI)) = v
        if (row > maxRow) maxRow = row
        if (colI > maxCol) maxCol = colI
      }
      val it = records(wb, bd.offset)
      var end = false
      var sawBof = false
      while (it.hasNext && !end) {
        val r = it.next()
        r.id match {
          case 0x0809 =>
            if (sawBof) end = true else sawBof = true // next sub-stream BOF
          case 0x000A => end = true
          case 0x00FD => // LABELSST: rw col ixfe isst
            val idx = i32(wb, r.at + 6)
            put(u16(wb, r.at), u16(wb, r.at + 2),
              if (idx >= 0 && idx < sst.length) sst(idx) else "")
          case 0x0204 => // LABEL: rw col ixfe cch grbit str (inline)
            put(u16(wb, r.at), u16(wb, r.at + 2), readUnicodeString(wb, r.at + 6)._1)
          case 0x0203 => // NUMBER: rw col ixfe xnum
            put(u16(wb, r.at), u16(wb, r.at + 2),
              renderNum(f64(wb, r.at + 6), u16(wb, r.at + 4)))
          case 0x027E => // RK: rw col ixfe rk
            put(u16(wb, r.at), u16(wb, r.at + 2),
              renderNum(decodeRk(i32(wb, r.at + 6)), u16(wb, r.at + 4)))
          case 0x00BD => // MULRK: rw colFirst [ixfe rk]... colLast
            val row = u16(wb, r.at)
            val colFirst = u16(wb, r.at + 2)
            val n = (r.len - 6) / 6
            var k = 0
            while (k < n) {
              val o = r.at + 4 + k * 6
              put(row, colFirst + k, renderNum(decodeRk(i32(wb, o + 2)), u16(wb, o)))
              k += 1
            }
          case 0x0205 => // BOOLERR: bool rendered True/False, errors blank
            val isErr = u8(wb, r.at + 7) != 0
            if (!isErr)
              put(u16(wb, r.at), u16(wb, r.at + 2),
                if (u8(wb, r.at + 6) != 0) "True" else "False")
          case 0x0006 => // FORMULA: cached result in bytes 6..13
            val row = u16(wb, r.at); val colI = u16(wb, r.at + 2)
            val xf = u16(wb, r.at + 4)
            if (u16(wb, r.at + 12) == 0xFFFF) {
              // non-numeric cache: 0=string (value in a following STRING
              // record), 1=bool, 2=error; handle bool inline
              u8(wb, r.at + 6) match {
                case 1 => put(row, colI, if (u8(wb, r.at + 8) != 0) "True" else "False")
                case 0 => // STRING record follows
                  var found = false
                  val ahead = records(wb, r.at + r.len)
                  while (!found && ahead.hasNext) {
                    val nr = ahead.next()
                    if (nr.id == 0x0207) {
                      put(row, colI, readUnicodeString(wb, nr.at)._1); found = true
                    } else if (nr.id != 0x003C) found = true // give up politely
                  }
                case _ =>
              }
            } else put(row, colI, renderNum(f64(wb, r.at + 6), xf))
          case _ =>
        }
      }
      val header = (0 to maxCol).map(c => cells.getOrElse((0, c), ""))
      val rows = (1 to maxRow).map(rr => (0 to maxCol).map(c => cells.getOrElse((rr, c), "")))
      SpreadsheetConverter.Sheet(bd.name, header, rows)
    }.filter(s => s.header.nonEmpty || s.rows.nonEmpty)
  } catch { case _: Exception => Seq.empty }
}
