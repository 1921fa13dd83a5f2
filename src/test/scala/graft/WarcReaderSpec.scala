package graft

import graft.sources.WarcReader
import org.apache.spark.sql.functions._

/** WARC source (SURVEY S22): record framing, HTTP-response nesting,
  * WET conversion records, Common Crawl's per-record concatenated gzip
  * members, and the fail-soft contract on garbage/truncation. Fixtures
  * are synthesized byte-exactly from the WARC/1.0 grammar so every
  * Content-Length is computed, not hand-typed. */
class WarcReaderSpec extends SparkSpec {

  private def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => head ++= s"$k: $v\r\n" }
    head ++= s"Content-Length: ${block.length}\r\n\r\n"
    head.toString.getBytes("ISO-8859-1") ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpBlock(status: String, ct: String, payload: String): Array[Byte] =
    (s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n\r\n" + payload).getBytes("ISO-8859-1")

  private val html = "<html><body><p>Hello corpus world</p></body></html>"

  private def fixture(): Array[Byte] =
    record(Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:aaa>",
        "WARC-Date" -> "2026-08-16T00:00:00Z",
        "Content-Type" -> "application/warc-fields"),
      "software: graft-spec\r\n".getBytes("ISO-8859-1")) ++
    record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "<https://example.org/a>",
        "WARC-Record-ID" -> "<urn:uuid:bbb>",
        "WARC-Date" -> "2026-08-16T00:00:01Z",
        "Content-Type" -> "application/http; msgtype=response"),
      httpBlock("200 OK", "text/html; charset=UTF-8", html)) ++
    record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.org/missing",
        "WARC-Record-ID" -> "<urn:uuid:ccc>",
        "WARC-Date" -> "2026-08-16T00:00:02Z",
        "Content-Type" -> "application/http; msgtype=response"),
      httpBlock("404 Not Found", "text/html", "<html>gone</html>")) ++
    record(Seq("WARC-Type" -> "conversion", // the WET shape
        "WARC-Target-URI" -> "https://example.org/a",
        "WARC-Record-ID" -> "<urn:uuid:ddd>",
        "WARC-Date" -> "2026-08-16T00:00:03Z",
        "Content-Type" -> "text/plain"),
      "Hello corpus world".getBytes("ISO-8859-1"))

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("plain WARC: all four records framed, headers and bodies exact") {
    val rows = WarcReader.parse(fixture())
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "response", "conversion"))
    val resp = rows(1)
    assert(resp.target_uri == "https://example.org/a") // angles stripped
    assert(resp.record_id == "urn:uuid:bbb")
    assert(resp.http_status.contains(200))
    assert(resp.http_content_type == "text/html; charset=UTF-8")
    assert(new String(resp.body, "ISO-8859-1") == html)
    assert(rows(2).http_status.contains(404))
    val wet = rows(3)
    assert(wet.http_status.isEmpty && wet.content_type == "text/plain")
    assert(new String(wet.body, "ISO-8859-1") == "Hello corpus world")
  }

  test("Common Crawl layout: one gzip member PER RECORD, concatenated") {
    val singles = {
      // re-frame each record separately by parsing offsets from the plain
      // fixture: members must each hold exactly one record
      val all = fixture()
      val starts = Iterator.iterate(0)(i =>
        new String(all, "ISO-8859-1").indexOf("WARC/1.0", i + 1))
        .takeWhile(_ >= 0).toSeq
      (starts :+ all.length).sliding(2).map { case Seq(a, b) =>
        java.util.Arrays.copyOfRange(all, a, b)
      }.toSeq
    }
    assert(singles.size == 4)
    val gz = singles.map(gzipMember).reduce(_ ++ _)
    assert(WarcReader.looksLikeGzip(gz))
    val rows = WarcReader.parse(gz)
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "response", "conversion"))
    assert(rows(1).http_status.contains(200))
  }

  test("fail-soft: garbage, truncation and a corrupt gzip tail keep the parsed prefix") {
    assert(WarcReader.parse(Array.emptyByteArray).isEmpty)
    assert(WarcReader.parse("not a warc at all".getBytes).isEmpty)
    // truncated mid-block: first record survives, second is dropped
    val all = fixture()
    val cut = java.util.Arrays.copyOfRange(all, 0, all.length - 60)
    val rows = WarcReader.parse(cut)
    assert(rows.nonEmpty && rows.size < 4)
    // bad Content-Length resyncs to the next record instead of throwing
    val bad = new String(fixture(), "ISO-8859-1")
      .replaceFirst("Content-Length: \\d+", "Content-Length: oops")
      .getBytes("ISO-8859-1")
    val resynced = WarcReader.parse(bad)
    assert(resynced.map(_.warc_type).contains("response"))
    // corrupt gzip tail: first member decodes, the rest is dropped
    val gz = gzipMember(all)
    val corrupt = gz.take(gz.length / 2)
    WarcReader.parse(corrupt) // must not throw (prefix may or may not frame)
  }

  test("Spark surface: directory scan → records → HtmlExtractor composition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    try {
      java.nio.file.Files.write(dir.resolve("a.warc"), fixture())
      java.nio.file.Files.write(dir.resolve("b.warc.gz"), gzipMember(fixture()))
      val ds = WarcReader.read(spark, dir.toString)
      val rows = ds.collect()
      assert(rows.length == 8) // 4 records x 2 files
      assert(rows.count(_.path.endsWith("a.warc")) == 4)
      // the ingestion pipeline the reader exists for: 200-status HTML →
      // extracted text — WarcReader composes with HtmlExtractor exactly
      // where the reference's crawl feeds its extractor
      import spark.implicits._
      val texts = ds.filter(r => r.http_status.contains(200) &&
          r.http_content_type != null && r.http_content_type.startsWith("text/html"))
        .map(r => graft.extract.HtmlExtractor.extractText(new String(r.body, "UTF-8")))
        .collect()
      assert(texts.length == 2 && texts.forall(_.contains("Hello corpus world")))
      // narrow plan: no shuffle in scan→parse→filter
      val p = ds.toDF().filter(col("warc_type") === "response")
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"WARC parse must stay narrow:\n${p.take(2000)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming: the first record emits long before the stream is consumed") {
    // 4096 copies of the 4-record fixture as one ~4 MB plain WARC
    // stream; a materializing parse reads everything before yielding
    // row 1 — the streaming iterator may only consume its 64 KiB
    // read-ahead buffer.
    val reps = 4096
    val one = fixture()
    val total = one.length.toLong * reps
    var consumed = 0L
    val src = new java.io.InputStream {
      private var rep = 0; private var off = 0
      override def read(): Int =
        if (rep >= reps) -1
        else { val b = one(off) & 0xff; off += 1; consumed += 1
          if (off == one.length) { off = 0; rep += 1 }; b }
    }
    val it = new WarcReader.RecordIterator("stream", src)
    assert(it.hasNext)
    val first = it.next()
    assert(first.warc_type == "warcinfo")
    assert(consumed <= 128 * 1024 && consumed < total / 10,
      s"first record should stream out early: consumed=$consumed of $total")
    assert(it.size == 4 * reps - 1) // the rest still parses completely
  }

  test("capped heap: a multi-hundred-MB segment parses under -Xmx64m (sub-JVM)") {
    // Common Crawl layout at real scale: 3072 one-record gzip members,
    // ~96 KiB inflated each (~288 MiB total). The r14 materializing
    // parse held inflated-segment + per-record copies (~0.6 GB) and
    // cannot run under 64 MiB; the streaming iterator holds one record.
    val f = java.nio.file.Files.createTempFile("graft-warc-big", ".warc.gz")
    try {
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f.toFile), 1 << 20)
      val body = new Array[Byte](96 * 1024)
      (0 until 3072).foreach { i =>
        java.util.Arrays.fill(body, ('a' + i % 26).toByte)
        val rec = record(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> s"https://example.org/doc$i",
          "WARC-Record-ID" -> s"<urn:uuid:$i>",
          "Content-Type" -> "text/plain"), body)
        // close-shield: g.close() must end its Deflater (3072 native
        // buffers otherwise) without closing the shared file stream
        val shield = new java.io.FilterOutputStream(out) { override def close(): Unit = () }
        val g = new java.util.zip.GZIPOutputStream(shield, 65536)
        g.write(rec); g.close()
      }
      out.close()
      val javaBin = new java.io.File(new java.io.File(
        sys.props("java.home"), "bin"), "java").getAbsolutePath
      val pb = new ProcessBuilder(javaBin, "-Xmx64m",
        "-cp", sys.props("java.class.path"),
        "graft.WarcHeapProbe", f.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val outText = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      assert(rc == 0, s"probe exited $rc:\n${outText.takeRight(2000)}")
      assert(outText.contains(s"records=3072 body_bytes=${3072L * 96 * 1024}"),
        s"unexpected probe output: ${outText.takeRight(500)}")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("member boundary at the buffer edge: concatenated members survive a drip-fed stream") {
    // Regression (r15 review): GZIPInputStream decides whether another
    // concatenated member follows by `in.available() > 0 || remaining > 26`
    // at each member trailer. A drip-fed source (1 byte per read) leaves
    // the inflater with ~0 remaining at EVERY boundary, so the decision
    // rides entirely on available() — before FailSoftStream delegated
    // available(), this parse returned ONLY the first member's record
    // and silently dropped the rest.
    val singles = {
      val all = fixture()
      val starts = Iterator.iterate(0)(i =>
        new String(all, "ISO-8859-1").indexOf("WARC/1.0", i + 1))
        .takeWhile(_ >= 0).toSeq
      (starts :+ all.length).sliding(2).map { case Seq(a, b) =>
        java.util.Arrays.copyOfRange(all, a, b)
      }.toSeq
    }
    val gz = singles.map(gzipMember).reduce(_ ++ _)
    val drip = new java.io.InputStream {
      private var off = 0
      override def read(): Int =
        if (off >= gz.length) -1 else { val b = gz(off) & 0xff; off += 1; b }
      override def read(b: Array[Byte], o: Int, l: Int): Int = {
        if (off >= gz.length) return -1
        b(o) = gz(off); off += 1; 1 // one byte per call
      }
      override def available(): Int = gz.length - off
    }
    val rows = new WarcReader.RecordIterator("drip", drip).toSeq
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "response", "conversion"),
      s"concatenated members dropped at a boundary: got ${rows.map(_.warc_type)}")
  }

  test("cdx-indexed read: record-level addressing selects exactly the indexed members") {
    // Common Crawl layout: one gzip member per record; the cdx sidecar
    // carries (filename, offset, length) per record. Index a SUBSET
    // (records 2 and 4) plus one bogus address — readIndexed must
    // return exactly the two addressed records, byte-identical to the
    // whole-file parse, and the bogus row must cost only itself.
    val singles = {
      val all = fixture()
      val starts = Iterator.iterate(0)(i =>
        new String(all, "ISO-8859-1").indexOf("WARC/1.0", i + 1))
        .takeWhile(_ >= 0).toSeq
      (starts :+ all.length).sliding(2).map { case Seq(a, b) =>
        java.util.Arrays.copyOfRange(all, a, b)
      }.toSeq
    }
    val members = singles.map(gzipMember)
    val offsets = members.scanLeft(0L)(_ + _.length)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cdx")
    try {
      java.nio.file.Files.createDirectories(dir.resolve("segments"))
      java.nio.file.Files.write(dir.resolve("segments/seg0.warc.gz"),
        members.reduce(_ ++ _))
      def cdxLine(i: Int): String =
        s"""org,example)/doc$i 20260816000000 {"url": "https://example.org/doc$i", """ +
          s""""filename": "segments/seg0.warc.gz", "offset": "${offsets(i)}", """ +
          s""""length": "${members(i).length}", "status": "200"}"""
      val cdx = Seq(cdxLine(1), cdxLine(3),
        """org,example)/bogus 20260816000000 {"url": "x", "filename": "segments/seg0.warc.gz", "offset": "999999", "length": "50"}""",
        // untrusted length near Int.MaxValue: must be capped against the
        // file extent and skipped, never allocated (r15 review)
        """org,example)/huge 20260816000000 {"url": "x", "filename": "segments/seg0.warc.gz", "offset": "0", "length": "2147483646"}""",
        "garbage line with no json").mkString("\n")
      java.nio.file.Files.createDirectories(dir.resolve("index"))
      java.nio.file.Files.write(dir.resolve("index/part.cdx"),
        cdx.getBytes("UTF-8"))
      val rows = WarcReader.readIndexed(spark, dir.toString,
          dir.resolve("index").toString)
        .collect().sortBy(_.record_id)
      val expected = WarcReader.parse(fixture())
      assert(rows.length == 2)
      assert(rows.map(_.record_id).toSeq == Seq("urn:uuid:bbb", "urn:uuid:ddd"))
      val full = expected.filter(r => Set("urn:uuid:bbb", "urn:uuid:ddd")(r.record_id))
      rows.zip(full.sortBy(_.record_id)).foreach { case (a, b) =>
        assert(a.warc_type == b.warc_type && a.target_uri == b.target_uri &&
          a.http_status == b.http_status &&
          java.util.Arrays.equals(a.body, b.body))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("cdx line parser: address fields extracted, malformed lines skipped") {
    import WarcReader.{parseCdxLine, CdxEntry}
    assert(parseCdxLine(
      """k 20260816 {"url": "u", "filename": "a/b.warc.gz", "offset": "12", "length": "34"}""")
      .contains(CdxEntry("a/b.warc.gz", 12L, 34L)))
    assert(parseCdxLine("""k 20260816 {"filename": "f", "offset": "x", "length": "34"}""").isEmpty)
    assert(parseCdxLine("""k 20260816 {"offset": "12", "length": "34"}""").isEmpty)
    assert(parseCdxLine("no json here").isEmpty)
    assert(parseCdxLine(null).isEmpty)
    assert(parseCdxLine("""k t {"filename": "f", "offset": "1", "length": "0"}""").isEmpty)
  }

  test("WET publish: corpus → sharded WET + cdx sidecar → both read paths round-trip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0 until 30).map(i =>
      (s"https://example.org/doc$i", f"2026-08-16T00:00:$i%02dZ", s"text body $i"))
      .toDF("target_uri", "warc_date", "text")
      .repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-wet-pub").toString
    try {
      val nShards = WarcReader.writeWet(docs, dir)
      assert(nShards == 3)
      val names = new java.io.File(dir).list().toSeq.sorted
      assert(names == Seq("part-00000.cdx", "part-00000.warc.gz",
        "part-00001.cdx", "part-00001.warc.gz",
        "part-00002.cdx", "part-00002.warc.gz"), s"unexpected listing: $names")
      // path 1: whole-file streaming read
      val streamed = WarcReader.read(spark, dir).collect()
      assert(streamed.length == 30)
      assert(streamed.forall(r => r.warc_type == "conversion" &&
        r.content_type == "text/plain"))
      val byUri = streamed.map(r => r.target_uri -> new String(r.body, "UTF-8")).toMap
      (0 until 30).foreach(i =>
        assert(byUri(s"https://example.org/doc$i") == s"text body $i"))
      // emitted header carries the BARE URI (WARC 1.1 / CC WET
      // convention, ADVICE r16): angle brackets are Record-ID-only —
      // a warcio-style consumer must never see '<' as part of the URI
      locally {
        val gz = new java.util.zip.GZIPInputStream(
          java.nio.file.Files.newInputStream(
            java.nio.file.Paths.get(dir, "part-00000.warc.gz")), 65536)
        val head = new String(gz.readNBytes(4096), "UTF-8")
        gz.close()
        val uriLine = head.linesIterator
          .find(_.startsWith("WARC-Target-URI:")).getOrElse("")
        assert(uriLine.matches("WARC-Target-URI: https://example\\.org/doc\\d+"),
          s"bare URI expected, got: $uriLine")
        val ridLine = head.linesIterator
          .find(_.startsWith("WARC-Record-ID:")).getOrElse("")
        assert(ridLine.contains("<urn:uuid:"), s"Record-ID keeps angles: $ridLine")
      }
      // path 2: cdx-indexed record-level read returns the same rows
      val indexed = WarcReader.readIndexed(spark, dir, dir).collect()
      assert(indexed.length == 30)
      assert(indexed.map(r => r.target_uri -> new String(r.body, "UTF-8")).toMap == byUri)
      // non-Latin-1 URI round-trips (r15 review: headers are UTF-8 per
      // ISO 28500; the old ISO-8859-1 encode mangled it to '?????')
      val cyrDir = java.nio.file.Files.createTempDirectory("graft-wet-cyr").toString
      try {
        val cyr = Seq(("https://пример.рф/x", "2026-08-16T00:00:00Z", "тело"))
          .toDF("target_uri", "warc_date", "text").coalesce(1)
        WarcReader.writeWet(cyr, cyrDir)
        val r = WarcReader.read(spark, cyrDir).collect()
        assert(r.length == 1 && r(0).target_uri == "https://пример.рф/x")
        assert(new String(r(0).body, "UTF-8") == "тело")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(cyrDir)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      // determinism: same frame → byte-identical shard
      val dir2 = java.nio.file.Files.createTempDirectory("graft-wet-pub2").toString
      try {
        WarcReader.writeWet(docs, dir2)
        (0 until 3).foreach { p =>
          val a = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(dir, f"part-$p%05d.warc.gz"))
          val b = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(dir2, f"part-$p%05d.warc.gz"))
          assert(java.util.Arrays.equals(a, b), s"shard $p not reproducible")
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir2)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("seeded mutation fuzz: corrupted payloads never throw or hang") {
    val base = fixture()
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val mutated = base.clone()
      (1 to 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val truncated = mutated.take(rnd.nextInt(mutated.length + 1))
      WarcReader.parse(truncated) // contract: returns, never throws
    }
  }
}
