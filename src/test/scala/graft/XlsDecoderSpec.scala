package graft

import graft.convert.{SpreadsheetConverter, XlsDecoder}
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Legacy binary XLS (BIFF8) decode — the fixture workbook is hand-built
  * from the public MS-CFB / MS-XLS layouts (header, FAT, directory,
  * mini-stream; BOF/BOUNDSHEET/SST/XF/FORMAT + cell records), so the
  * generator and decoder can only agree by both following the spec.
  * Covers: two sheets, shared strings (compressed AND UTF-16), NUMBER,
  * RK (int, /100, float), MULRK, inline LABEL, BOOLERR, date/time styled
  * cells through the shared XLSX style classifier, and both CFB stream
  * layouts (mini-stream for < 4096 bytes, regular sectors above). */
class XlsDecoderSpec extends SparkSpec {

  // ----------------------------------------------------------- BIFF writing

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def f64le(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray
  }
  private def rec(id: Int, body: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(body.length) ++ body

  private def bof(typ: Int): Array[Byte] =
    rec(0x0809, le16(0x0600) ++ le16(typ) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
  private def eof: Array[Byte] = rec(0x000A, Array.empty)

  /** Compressed (8-bit) XLUnicodeRichExtendedString. */
  private def ustr8(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes(StandardCharsets.ISO_8859_1)
  /** UTF-16 variant (fHighByte set). */
  private def ustr16(s: String): Array[Byte] =
    le16(s.length) ++ Array(1.toByte) ++ s.getBytes(StandardCharsets.UTF_16LE)

  private def boundsheet(name: String, offset: Int): Array[Byte] =
    rec(0x0085, le32(offset) ++ le16(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes(StandardCharsets.ISO_8859_1))

  private def sst(strings: Seq[Array[Byte]]): Array[Byte] =
    rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++ strings.flatten.toArray)

  private def xf(ifmt: Int): Array[Byte] =
    rec(0x00E0, le16(0) ++ le16(ifmt) ++ Array.fill[Byte](16)(0))
  private def format(id: Int, code: String): Array[Byte] =
    rec(0x041E, le16(id) ++ ustr8(code))

  private def labelSst(row: Int, col: Int, xfi: Int, isst: Int): Array[Byte] =
    rec(0x00FD, le16(row) ++ le16(col) ++ le16(xfi) ++ le32(isst))
  private def number(row: Int, col: Int, xfi: Int, v: Double): Array[Byte] =
    rec(0x0203, le16(row) ++ le16(col) ++ le16(xfi) ++ f64le(v))
  private def rk(row: Int, col: Int, xfi: Int, rkv: Int): Array[Byte] =
    rec(0x027E, le16(row) ++ le16(col) ++ le16(xfi) ++ le32(rkv))
  private def mulrk(row: Int, colFirst: Int, cells: Seq[(Int, Int)]): Array[Byte] =
    rec(0x00BD, le16(row) ++ le16(colFirst) ++
      cells.flatMap { case (xfi, rkv) => le16(xfi) ++ le32(rkv) }.toArray ++
      le16(colFirst + cells.length - 1))
  private def label(row: Int, col: Int, xfi: Int, s: String): Array[Byte] =
    rec(0x0204, le16(row) ++ le16(col) ++ le16(xfi) ++ ustr16(s))
  private def boolerr(row: Int, col: Int, xfi: Int, b: Boolean): Array[Byte] =
    rec(0x0205, le16(row) ++ le16(col) ++ le16(xfi) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))

  /** The workbook stream: globals (SST with both encodings, XF table with
    * plain/date/time/custom-datetime styles, one custom FORMAT,
    * two BOUNDSHEETs) + two sheet sub-streams. */
  private def workbookStream(): Array[Byte] = {
    // XF 0..3: plain, builtin date (14), builtin time (20), custom 164
    val xfs = xf(0) ++ xf(14) ++ xf(20) ++ xf(164)
    val fmts = format(164, "yyyy-mm-dd hh:mm")
    val sharedStrings = sst(Seq(ustr8("Name"), ustr8("Score"), ustr16("Ünïcode")))

    val sheet1 = bof(0x0010) ++
      labelSst(0, 0, 0, 0) ++ labelSst(0, 1, 0, 1) ++ label(0, 2, 0, "When") ++
      labelSst(1, 0, 0, 2) ++ number(1, 1, 0, 42.5) ++
      number(1, 2, 3, 45108.5) ++ // 2023-07-01 12:00 custom datetime
      rk(2, 0, 0, (123 << 2) | 2) ++ // int RK: 123
      rk(2, 1, 0, ((12345 << 2) | 2) | 1) ++ // /100 int RK: 123.45
      number(2, 2, 1, 45017.0) ++ // date-styled serial -> 2023-04-01
      eof
    val sheet2 = bof(0x0010) ++
      label(0, 0, 0, "t") ++ label(0, 1, 0, "flag") ++
      number(1, 0, 2, 0.625) ++ // time-styled 15:00
      boolerr(1, 1, 0, b = true) ++
      mulrk(2, 0, Seq((0, (7 << 2) | 2), (0, (9 << 2) | 2))) ++
      eof

    // globals size depends on boundsheet offsets — fixed-point in 2 passes
    def globals(off1: Int, off2: Int): Array[Byte] =
      bof(0x0005) ++ boundsheet("Data", off1) ++ boundsheet("Shift Times", off2) ++
        fmts ++ xfs ++ sharedStrings ++ eof
    val g0 = globals(0, 0)
    val off1 = g0.length
    val off2 = off1 + sheet1.length
    globals(off1, off2) ++ sheet1 ++ sheet2
  }

  // ------------------------------------------------------------ CFB writing

  private val SectorSize = 512
  private val FreeSect = 0xFFFFFFFF
  private val EndChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def dirEntry(name: String, typ: Int, startSect: Int, size: Int,
      color: Int = 1, child: Int = -1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val n16 = name.getBytes(StandardCharsets.UTF_16LE)
    out.write(n16); out.write(new Array[Byte](64 - n16.length))
    out.write(le16(n16.length + 2))
    out.write(Array(typ.toByte, color.toByte))
    out.write(le32(-1)); out.write(le32(-1)); out.write(le32(child)) // siblings/child
    out.write(new Array[Byte](36)) // clsid + state + times
    out.write(le32(startSect)); out.write(le32(size)); out.write(le32(0))
    out.toByteArray
  }

  /** Minimal single-FAT-sector CFB file holding one stream. `forceMini`
    * stores it in the root mini-stream (the < 4096 path); otherwise the
    * stream is padded and written in regular sectors. */
  private def cfb(streamName: String, stream: Array[Byte], forceMini: Boolean): Array[Byte] = {
    require(stream.length < 3000, "fixture generator supports small streams")
    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      b ++ new Array[Byte]((unit - b.length % unit) % unit)

    if (forceMini) {
      require(stream.length < 4096)
      val mini = pad(stream, 64)
      val nMini = mini.length / 64
      // sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=mini-stream data
      val miniDataSectors = pad(mini, SectorSize).length / SectorSize
      val fat = new ByteArrayOutputStream()
      fat.write(le32(FatSect)) // sector 0: the FAT itself
      fat.write(le32(EndChain)) // 1: directory
      fat.write(le32(EndChain)) // 2: miniFAT
      for (s <- 0 until miniDataSectors) // 3..: root mini-stream chain
        fat.write(le32(if (s == miniDataSectors - 1) EndChain else 4 + s))
      while (fat.size() < SectorSize) fat.write(le32(FreeSect))

      val dir = dirEntry("Root Entry", 5, 3, mini.length, child = 1) ++
        dirEntry(streamName, 2, 0, stream.length) ++
        new Array[Byte](128 * 2)
      val miniFat = new ByteArrayOutputStream()
      for (s <- 0 until nMini)
        miniFat.write(le32(if (s == nMini - 1) EndChain else s + 1))
      while (miniFat.size() < SectorSize) miniFat.write(le32(FreeSect))

      header(firstDir = 1, nFat = 1, firstMiniFat = 2, nMiniFat = 1, fatSector0 = 0) ++
        fat.toByteArray ++ pad(dir, SectorSize) ++ miniFat.toByteArray ++ pad(mini, SectorSize)
    } else {
      val data = pad(stream ++ new Array[Byte](math.max(0, 4096 - stream.length)), SectorSize)
      val nData = data.length / SectorSize
      // sectors: 0=FAT, 1=directory, 2..=stream data
      val fat = new ByteArrayOutputStream()
      fat.write(le32(FatSect))
      fat.write(le32(EndChain)) // directory
      for (s <- 0 until nData)
        fat.write(le32(if (s == nData - 1) EndChain else 3 + s))
      while (fat.size() < SectorSize) fat.write(le32(FreeSect))
      val dir = dirEntry("Root Entry", 5, EndChain.toInt, 0, child = 1) ++
        dirEntry(streamName, 2, 2, stream.length + math.max(0, 4096 - stream.length)) ++
        new Array[Byte](128 * 2)
      header(firstDir = 1, nFat = 1, firstMiniFat = EndChain.toInt, nMiniFat = 0, fatSector0 = 0) ++
        fat.toByteArray ++ pad(dir, SectorSize) ++ data
    }
  }

  private def header(firstDir: Int, nFat: Int, firstMiniFat: Int, nMiniFat: Int,
      fatSector0: Int): Array[Byte] = {
    val h = new ByteArrayOutputStream()
    h.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.write(new Array[Byte](16)) // clsid
    h.write(le16(0x003E)); h.write(le16(0x0003)) // minor/major
    h.write(le16(0xFFFE)) // little-endian
    h.write(le16(9)) // sector shift: 512
    h.write(le16(6)) // mini shift: 64
    h.write(new Array[Byte](6))
    h.write(le32(0)) // directory sector count (v3: 0)
    h.write(le32(nFat))
    h.write(le32(firstDir))
    h.write(le32(0)) // transaction
    h.write(le32(4096)) // mini cutoff
    h.write(le32(firstMiniFat))
    h.write(le32(nMiniFat))
    h.write(le32(EndChain.toInt)) // first DIFAT sector
    h.write(le32(0)) // DIFAT sector count
    h.write(le32(fatSector0))
    while (h.size() < SectorSize) h.write(le32(FreeSect))
    h.toByteArray
  }

  // ------------------------------------------------------------------ tests

  private def decodeAll(forceMini: Boolean) =
    XlsDecoder.decode(cfb("Workbook", workbookStream(), forceMini))

  for (mini <- Seq(true, false)) {
    val layout = if (mini) "mini-stream" else "regular sectors"

    test(s"biff8 workbook decodes: sheets, strings, numbers ($layout)") {
      val sheets = decodeAll(mini)
      assert(sheets.map(_.name) == Seq("Data", "Shift Times"))
      val d = sheets.head
      assert(d.header == Seq("Name", "Score", "When"))
      assert(d.rows(0)(0) == "Ünïcode") // UTF-16 shared string
      assert(d.rows(0)(1) == "42.5")
      assert(d.rows(1)(0) == "123") // int RK
      assert(d.rows(1)(1) == "123.45") // /100 RK
    }

    test(s"date/datetime-styled serials render; time-styled stays HH:mm:ss ($layout)") {
      val sheets = decodeAll(mini)
      val d = sheets.head
      assert(d.rows(1)(2) == "2023-04-01") // builtin date fmt 14
      assert(d.rows(0)(2) == "2023-07-01 12:00:00") // custom datetime fmt 164
      val s2 = sheets(1)
      assert(s2.rows(0)(0) == "15:00:00") // builtin time fmt 20 — NOT a date
      assert(s2.rows(0)(1) == "True")
      assert(s2.rows(1)(0) == "7" && s2.rows(1)(1) == "9") // MULRK pair
    }
  }

  test("xls path flows through the full converter with type inference") {
    val out = SpreadsheetConverter.convert(spark, cfb("Workbook", workbookStream(), forceMini = true))
    assert(out.map(_._1) == Seq("data", "shift_times"))
    val shift = out.find(_._1 == "shift_times").get._2
    // the Time column must survive inference un-ISO-ified (the reference's
    // Water Level Readings pin, test_spreadsheet_to_parquet.py:35-78)
    val t = shift.select("t").collect().map(_.getString(0)).toSeq
    assert(t.contains("15:00:00") && !t.exists(_.startsWith("20")),
      s"time column must stay HH:mm:ss, got $t")
  }

  test("garbage and encrypted-looking payloads decode to empty, never throw") {
    assert(XlsDecoder.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(XlsDecoder.decode(new Array[Byte](600)).isEmpty)
    // truncated container: valid magic, nothing else
    val junk = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte) ++
      new Array[Byte](700)
    assert(XlsDecoder.decode(junk).isEmpty)
  }

  test("SST spilling into CONTINUE records: mid-string split re-reads grbit") {
    // BIFF8 string table across a record boundary (MS-XLS ContinuedString):
    // "alpha" whole in the SST record; "splitme_0123456789" split after 7
    // characters — the CONTINUE record restarts with a fresh grbit byte —
    // and a UTF-16 string entirely inside the continuation
    val s2 = "splitme_0123456789"
    val sstBody = le32(3) ++ le32(3) ++
      ustr8("alpha") ++
      (le16(s2.length) ++ Array(0.toByte) ++
        s2.take(7).getBytes(StandardCharsets.ISO_8859_1))
    val contBody = Array(0.toByte) ++ // re-grbit: continued chars stay 8-bit
      s2.drop(7).getBytes(StandardCharsets.ISO_8859_1) ++
      ustr16("Ωmega")
    val sheet = bof(0x0010) ++
      labelSst(0, 0, 0, 0) ++ labelSst(0, 1, 0, 1) ++ labelSst(0, 2, 0, 2) ++
      labelSst(1, 0, 0, 2) ++ labelSst(1, 1, 0, 0) ++ labelSst(1, 2, 0, 1) ++
      eof
    def globals(off: Int): Array[Byte] =
      bof(0x0005) ++ boundsheet("S", off) ++ xf(0) ++
        rec(0x00FC, sstBody) ++ rec(0x003C, contBody) ++ eof
    val stream = globals(globals(0).length) ++ sheet
    val sheets = XlsDecoder.decode(cfb("Workbook", stream, forceMini = true))
    assert(sheets.size == 1)
    val sh = sheets.head
    assert(sh.header == Seq("alpha", s2, "Ωmega"),
      s"continued SST mis-parsed: ${sh.header}")
    assert(sh.rows(0) == Seq("Ωmega", "alpha", s2))
  }

  test("seeded mutation fuzz: corrupted containers never throw") {
    val base = cfb("Workbook", workbookStream(), forceMini = true)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(8)) {
        val i = rnd.nextInt(mutated.length)
        mutated(i) = rnd.nextInt(256).toByte
      }
      val truncated = mutated.take(rnd.nextInt(mutated.length + 1))
      // any result is fine — sheets or empty — as long as it returns
      XlsDecoder.decode(mutated)
      XlsDecoder.decode(truncated)
    }
  }

  test("rk decoding covers all four encodings") {
    assert(XlsDecoder.decodeRk((123 << 2) | 2) == 123.0)
    assert(XlsDecoder.decodeRk(((12345 << 2) | 2) | 1) == 123.45)
    val bits = java.lang.Double.doubleToLongBits(2.5)
    val rkFloat = ((bits >> 32) & 0xFFFFFFFCL).toInt
    assert(XlsDecoder.decodeRk(rkFloat) == 2.5)
    assert(XlsDecoder.decodeRk(rkFloat | 1) == 0.025)
  }
}
