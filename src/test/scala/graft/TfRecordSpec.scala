package graft

import graft.sources.TfRecord
import graft.sources.TfRecord.{Example, ExampleRow}
import org.apache.spark.sql.functions._

/** TFRecord + tf.Example interchange (SURVEY S24): framing with verified
  * masked CRC32C, the hand-decoded proto wire subset (packed AND
  * unpacked leaves), corruption fail-soft, and the export→audit loop a
  * training handoff actually runs. */
class TfRecordSpec extends SparkSpec {

  test("framing round-trips and rejects corruption at the first bad frame") {
    val recs = Seq("alpha".getBytes, Array.emptyByteArray, ("x" * 1000).getBytes)
    val framed = TfRecord.frame(recs.iterator)
    val back = TfRecord.unframe(framed)
    assert(back.map(new String(_)) == recs.map(new String(_)))
    // flip one payload byte of record 2: records after (and including)
    // the corruption are dropped, record 1 survives
    val corrupt = framed.clone()
    corrupt(12 + 5 + 4 + 12) = 'Z'.toByte
    val kept = TfRecord.unframe(corrupt)
    assert(kept.size == 1 && new String(kept.head) == "alpha")
    // truncation mid-frame: same contract
    assert(TfRecord.unframe(framed.take(framed.length - 3)).size == 2)
    assert(TfRecord.unframe(Array.emptyByteArray).isEmpty)
  }

  test("tf.Example round-trips all three feature families, deterministically") {
    val e = Example(
      bytes_features = Map("text" -> Seq("hello world".getBytes("UTF-8")),
        "spans" -> Seq("a".getBytes, "bb".getBytes)),
      float_features = Map("quality" -> Seq(0.5f, -1.25f)),
      int64_features = Map("tokens" -> Seq(2L, 300L, -1L), "id" -> Seq(42L)))
    val bytes = TfRecord.encodeExample(e)
    assert(java.util.Arrays.equals(bytes, TfRecord.encodeExample(e))) // reproducible
    val d = TfRecord.decodeExample(bytes)
    assert(d.bytes_features.keySet == Set("text", "spans"))
    assert(new String(d.bytes_features("text").head, "UTF-8") == "hello world")
    assert(d.bytes_features("spans").map(new String(_)) == Seq("a", "bb"))
    assert(d.float_features("quality") == Seq(0.5f, -1.25f))
    assert(d.int64_features("tokens") == Seq(2L, 300L, -1L))
    assert(d.int64_features("id") == Seq(42L))
  }

  test("decoder accepts the UNPACKED leaf encodings other writers emit") {
    // hand-assemble Int64List {value: 7, value: 9} unpacked (tag 0x08 per
    // element) and FloatList {1.0} unpacked (tag 0x0d fixed32), then wrap
    // Feature→entry→Features→Example by the wire grammar
    def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, body.length.toByte) ++ body
    val int64List = Array[Byte](0x08, 7, 0x08, 9) // unpacked varints
    val featInts = lenDelim(3, int64List) // Feature.int64_list = 3
    val entryA = lenDelim(1, "n".getBytes) ++ lenDelim(2, featInts)
    val floatBits = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(java.lang.Float.floatToIntBits(1.0f)).array()
    val floatList = Array[Byte](0x0d) ++ floatBits // unpacked fixed32
    val featFloats = lenDelim(2, floatList) // Feature.float_list = 2
    val entryB = lenDelim(1, "f".getBytes) ++ lenDelim(2, featFloats)
    val features = lenDelim(1, entryA) ++ lenDelim(1, entryB)
    val example = lenDelim(1, features)
    val d = TfRecord.decodeExample(example)
    assert(d.int64_features("n") == Seq(7L, 9L))
    assert(d.float_features("f") == Seq(1.0f))
  }

  test("malformed inner lengths throw instead of silently mis-decoding (bounded reader)") {
    // Features.feature entry whose name field claims 8 bytes but the
    // entry submessage ends after 2 — the unbounded r14 reader read the
    // SIBLING entry's bytes as name content and accepted the wrong
    // record; the bounded reader throws and the Spark path drops it.
    val nameOverrun = Array[Byte](0x0a, 8, 'a', 'b')
    val entry = Array[Byte](0x0a, nameOverrun.length.toByte) ++ nameOverrun
    val sibling = Array[Byte](0x0a, 3, 0x0a, 1, 'z')
    val features = entry ++ sibling
    val example = Array[Byte](0x0a, features.length.toByte) ++ features
    intercept[IllegalArgumentException](TfRecord.decodeExample(example))
  }

  test("overlong wire length (2^32+8) throws instead of truncating to its low 32 bits") {
    // Regression (r15 review): `varint().toInt` BEFORE the bound check
    // turned 4294967304 into 8, so the read passed bounds and silently
    // decoded the wrong 8 bytes. The Long-domain check must throw.
    val lenVarint = Array[Byte](0x88.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10)
    val nameOverlong = Array[Byte](0x0a) ++ lenVarint ++ Array.fill[Byte](8)('a')
    val entry = Array[Byte](0x0a, nameOverlong.length.toByte) ++ nameOverlong
    val example = Array[Byte](0x0a, entry.length.toByte) ++ entry
    intercept[IllegalArgumentException](TfRecord.decodeExample(example))
  }

  test("export→audit loop: documents → sharded tf.Examples → read back and reconcile") {
    import spark.implicits._
    // deterministic subset by PREDICATE, not limit() — two limit() plans
    // could legally pick different rows, making the reconcile flaky
    val docs = graft.core.Tables.documents(spark, sf())
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .select(
        map(lit("text"), array(col("text").cast("binary"))).as("bytes_features"),
        expr("CAST(map() AS map<string,array<float>>)").as("float_features"),
        map(lit("doc_id"), array(col("doc_id"))).as("int64_features"))
      .repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-tfrecord").toString
    try {
      val nFiles = TfRecord.writeExamples(docs, dir)
      assert(nFiles == 3)
      // commit protocol: only final shard names remain — every
      // attempt-unique .tmp was renamed or deleted
      val names = new java.io.File(dir).list().toSeq.sorted
      assert(names == Seq("part-00000.tfrecord", "part-00001.tfrecord",
        "part-00002.tfrecord"), s"unexpected shard listing: $names")
      val back = TfRecord.readExamples(spark, dir)
      // reconcile against the source: ids and text lengths survive
      val shipped = back
        .map(r => (r.int64_features("doc_id").head,
          new String(r.bytes_features("text").head, "UTF-8").length.toLong))
        .toDF("doc_id", "len")
      val src = graft.core.Tables.documents(spark, sf())
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          length(coalesce(col("text"), lit(""))).cast("long").as("len"))
      assert(back.count() == src.count())
      assert(shipped.except(src).isEmpty && src.except(shipped).isEmpty)
      // narrow read plan: scan → flatMap, no shuffle
      val p = back.toDF().queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"tfrecord read must stay narrow:\n${p.take(1500)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("writeExamples fills absent feature-family columns with empty maps") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("v")
      .select(map(lit("id"), array(col("v"))).as("int64_features"))
    val dir = java.nio.file.Files.createTempDirectory("graft-tfrecord-min").toString
    try {
      assert(TfRecord.writeExamples(df.repartition(1), dir) == 1L)
      val back = TfRecord.readExamples(spark, dir).collect()
      assert(back.length == 2)
      assert(back.forall(r => r.bytes_features.isEmpty && r.float_features.isEmpty))
      assert(back.map(_.int64_features("id").head).sorted.toSeq == Seq(1L, 2L))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming unframe: first record emits after exactly its own frame bytes") {
    val payloads = (1 to 50).map(i => Array.fill[Byte](1000 + i)(i.toByte))
    val framed = TfRecord.frame(payloads.iterator)
    var consumed = 0L
    val src = new java.io.InputStream {
      private var off = 0
      override def read(): Int =
        if (off >= framed.length) -1
        else { val b = framed(off) & 0xff; off += 1; consumed += 1; b }
    }
    val it = TfRecord.unframeStream(src)
    assert(it.hasNext)
    val first = it.next()
    assert(first.length == 1001)
    // 8-byte length + 4-byte length CRC + payload + 4-byte payload CRC:
    // nothing beyond the first frame was touched (no read-ahead here)
    assert(consumed == 12 + 1001 + 4, s"consumed=$consumed")
    assert(it.size == 49) // the rest still decodes
  }

  test("capped heap: a multi-hundred-MB shard streams under -Xmx64m (sub-JVM)") {
    // 2048 examples x ~128 KiB bytes-feature (~256 MiB framed); the
    // materializing unframe held the file + every payload (~0.5 GB) —
    // unframeStream holds one record.
    val f = java.nio.file.Files.createTempFile("graft-tfrecord-big", ".tfrecord")
    try {
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f.toFile), 1 << 20)
      val body = new Array[Byte](128 * 1024)
      val n = TfRecord.frameTo(out, (0 until 2048).iterator.map { i =>
        java.util.Arrays.fill(body, (i % 251).toByte)
        TfRecord.encodeExample(TfRecord.Example(
          Map("blob" -> Seq(body)), Map.empty, Map("id" -> Seq(i.toLong))))
      })
      out.close()
      assert(n == 2048)
      val javaBin = new java.io.File(new java.io.File(
        sys.props("java.home"), "bin"), "java").getAbsolutePath
      val pb = new ProcessBuilder(javaBin, "-Xmx64m",
        "-cp", sys.props("java.class.path"),
        "graft.TfHeapProbe", f.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val outText = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      assert(rc == 0, s"probe exited $rc:\n${outText.takeRight(2000)}")
      assert(outText.contains(s"examples=2048 payload_bytes=${2048L * 128 * 1024}"),
        s"unexpected probe output: ${outText.takeRight(500)}")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("seeded mutation fuzz: corrupted shards never throw or hang") {
    val base = TfRecord.frame(Seq(
      TfRecord.encodeExample(Example(Map("t" -> Seq("abc".getBytes)), Map(), Map("i" -> Seq(1L)))),
      TfRecord.encodeExample(Example(Map(), Map("f" -> Seq(2.0f)), Map()))).iterator)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val m = base.clone()
      (1 to 1 + rnd.nextInt(6)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      val cut = m.take(rnd.nextInt(m.length + 1))
      TfRecord.unframe(cut).foreach { payload =>
        try TfRecord.decodeExample(payload) catch { case _: Exception => () }
      }
    }
  }
}
