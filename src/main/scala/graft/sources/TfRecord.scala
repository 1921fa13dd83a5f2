package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** TFRecord + tf.Example interchange — the TRAINING-STACK handoff format:
  * a corpus pipeline's terminal verb is "ship the selected, deduped,
  * packed text to the trainer", and tf.data readers consume exactly this
  * (TFRecord framing around tf.Example protos). The write side is the
  * point; the read side closes the loop (audit what was shipped).
  *
  * Both layers are pure JVM from the PUBLIC specs:
  *  - **framing** (TFRecord): per record `len:uint64-LE, masked_crc32c(len),
  *    payload, masked_crc32c(payload)` with the TensorFlow mask
  *    `((crc >>> 15) | (crc << 17)) + 0xa282ead8` over CRC32C
  *    (`java.util.zip.CRC32C`). Both CRCs are VERIFIED on read; a bad or
  *    truncated frame ends the file's parse with the records decoded so
  *    far (the WarcReader fail-soft contract — framing has no resync
  *    marker, so a corrupt length makes everything after it untrustworthy
  *    by construction).
  *  - **tf.Example** (protobuf wire subset, hand-decoded — no protobuf
  *    runtime on this classpath, and the schema is 5 tiny messages):
  *    Example.features(1) → Features.feature(1) = map entries
  *    (key(1)=string, value(2)=Feature), Feature = oneof bytes_list(1) /
  *    float_list(2) / int64_list(3), each `repeated` leaf read in BOTH
  *    packed and unpacked encodings (writers differ; the proto3 spec
  *    requires parsers to accept both). Unknown fields are skipped by
  *    wire type — forward-compatible, like any proto parser.
  *
  * Spark surface: one `.tfrecord` file per task on read (TFRecord is
  * deliberately unsplittable), STREAMED from the Hadoop FileSystem —
  * r15: a listing-only scan hands each task paths, [[unframeStream]]
  * decodes one record at a time, and task memory is one record + stream
  * buffers regardless of shard size (proved by TfRecordSpec's
  * capped-heap sub-JVM probe, the WarcReader discipline); on write one
  * file per PARTITION through the same FileSystem with an
  * attempt-unique temp + rename commit, so the upstream
  * repartition/partitionBy chooses shard count and locality, exactly how
  * t21's token-budget shard manifests expect to drive a writer. */
object TfRecord {

  // ------------------------------------------------------------ framing

  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def leInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Frame records into TFRecord bytes (materializing convenience over
    * [[frameTo]] — tests and small payloads; the shard writer streams). */
  def frame(records: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frameTo(out, records)
    out.toByteArray
  }

  /** Stream TFRecord frames to `out`, one record in memory at a time;
    * returns the record count. */
  def frameTo(out: java.io.OutputStream, records: Iterator[Array[Byte]]): Long = {
    var n = 0L
    records.foreach { r =>
      val len = leLong(r.length.toLong)
      out.write(len)
      out.write(leInt(maskedCrc(len, 0, 8)))
      out.write(r)
      out.write(leInt(maskedCrc(r, 0, r.length)))
      n += 1
    }
    n
  }

  /** Unframe TFRecord bytes, verifying both CRCs; a bad/truncated frame
    * keeps the records decoded so far (no resync exists by design).
    * Materializing convenience over [[unframeStream]]. */
  def unframe(b: Array[Byte]): Seq[Array[Byte]] =
    if (b == null) Seq.empty
    else unframeStream(new java.io.ByteArrayInputStream(b)).toSeq

  /** Streaming unframe (r15, the WarcReader discipline applied here):
    * one record payload in memory at a time, so a multi-GB shard streams
    * through a task instead of being held once as file bytes and again
    * as the payload list. Both CRCs verified per record; any framing
    * violation, CRC mismatch, truncation or I/O error ends the iterator
    * with the records decoded so far — TFRecord has no resync marker,
    * so everything after a bad length is untrustworthy by construction. */
  def unframeStream(in: java.io.InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pending: Array[Byte] = _
      private var done = false

      private def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = try in.read(b, off, n - off) catch { case _: Exception => -1 }
          if (r < 0) return null
          off += r
        }
        b
      }

      private def leIntOf(b: Array[Byte]): Int =
        java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

      private def advance(): Unit = {
        val head = readFully(12)
        if (head == null) { done = true; return } // clean EOF or truncated header
        val len = java.nio.ByteBuffer.wrap(head, 0, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
        if (len < 0 || len > Int.MaxValue) { done = true; return }
        if (leIntOf(java.util.Arrays.copyOfRange(head, 8, 12)) !=
            maskedCrc(head, 0, 8)) { done = true; return }
        val payload = readFully(len.toInt)
        if (payload == null) { done = true; return } // truncated mid-record
        val crc = readFully(4)
        if (crc == null || leIntOf(crc) != maskedCrc(payload, 0, payload.length)) {
          done = true; return
        }
        pending = payload
      }

      override def hasNext: Boolean = {
        if (pending == null && !done) advance()
        pending != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException("end of TFRecord stream")
        val r = pending; pending = null; r
      }
    }

  // --------------------------------------------------- tf.Example wire

  /** One decoded tf.Example: the three feature families as typed maps
    * (a name appears in exactly one — Feature is a oneof). */
  final case class Example(
      bytes_features: Map[String, Seq[Array[Byte]]],
      float_features: Map[String, Seq[Float]],
      int64_features: Map[String, Seq[Long]])

  /** Bounded wire reader: every read checks against `end`, the LOGICAL
    * boundary of the enclosing submessage — without the checks a
    * malformed inner length could read past its submessage into sibling
    * bytes of the same array and produce a silently WRONG decode that
    * the per-record fail-soft catch never sees (r14 ADVICE). Violations
    * throw; the record is dropped, not mis-decoded. */
  private final class Reader(b: Array[Byte], var i: Int, val end: Int) {
    require(end <= b.length, s"submessage end $end past buffer ${b.length}")
    def hasMore: Boolean = i < end
    private def bound(n: Int): Unit =
      if (n < 0 || i + n > end) throw new IllegalArgumentException(
        s"wire read of $n bytes at $i crosses submessage end $end")
    def varint(): Long = {
      var v = 0L; var s = 0
      while ({
        bound(1)
        val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << s; s += 7
        if (s > 70) throw new IllegalArgumentException("varint longer than 10 bytes")
        (x & 0x80) != 0
      }) ()
      v
    }
    /** Bound-check a length that is still a LONG — narrowing to Int
      * before the check would let e.g. 2^32+3 masquerade as 3 and
      * silently mis-decode inside bounds (r15 review). */
    private def boundLen(n: Long): Int = {
      if (n < 0 || n > end - i) throw new IllegalArgumentException(
        s"wire length $n at $i crosses submessage end $end")
      n.toInt
    }
    def bytes(): Array[Byte] = {
      val n = boundLen(varint())
      val r = java.util.Arrays.copyOfRange(b, i, i + n); i += n; r
    }
    def sub(): Reader = {
      val n = boundLen(varint())
      val r = new Reader(b, i, i + n); i += n; r
    }
    def fixed32(): Int = {
      bound(4)
      val v = java.nio.ByteBuffer.wrap(b, i, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt; i += 4; v
    }
    def fixed64(): Long = {
      bound(8)
      val v = java.nio.ByteBuffer.wrap(b, i, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong; i += 8; v
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint(); ()
      case 1 => bound(8); i += 8
      case 2 => i += boundLen(varint())
      case 5 => bound(4); i += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  /** Decode a tf.Example payload; throws on malformed wire (callers in
    * the Spark path wrap per record — one bad record is dropped, not a
    * poison pill for the file). */
  def decodeExample(payload: Array[Byte]): Example = {
    val bytesF = Map.newBuilder[String, Seq[Array[Byte]]]
    val floatF = Map.newBuilder[String, Seq[Float]]
    val int64F = Map.newBuilder[String, Seq[Long]]
    val ex = new Reader(payload, 0, payload.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // Example.features
        val fs = ex.sub()
        while (fs.hasMore) {
          val ftag = fs.varint()
          if ((ftag >> 3) == 1 && (ftag & 7) == 2) { // map entry
            val entry = fs.sub()
            var name = ""
            var bl: Seq[Array[Byte]] = null
            var fl: Seq[Float] = null
            var il: Seq[Long] = null
            while (entry.hasMore) {
              val etag = entry.varint()
              (etag >> 3, (etag & 7).toInt) match {
                case (1, 2) => name = new String(entry.bytes(), "UTF-8")
                case (2, 2) => // Feature
                  val feat = entry.sub()
                  while (feat.hasMore) {
                    val vt = feat.varint()
                    (vt >> 3, (vt & 7).toInt) match {
                      case (1, 2) => // BytesList: repeated bytes value = 1
                        val l = feat.sub()
                        val acc = Seq.newBuilder[Array[Byte]]
                        while (l.hasMore) {
                          val t = l.varint()
                          if ((t >> 3) == 1 && (t & 7) == 2) acc += l.bytes() else l.skip((t & 7).toInt)
                        }
                        bl = acc.result()
                      case (2, 2) => // FloatList: repeated float = 1 (packed or not)
                        val l = feat.sub()
                        val acc = Seq.newBuilder[Float]
                        while (l.hasMore) {
                          val t = l.varint()
                          if ((t >> 3) == 1 && (t & 7) == 2) { // packed
                            val p = l.sub()
                            while (p.hasMore) acc += java.lang.Float.intBitsToFloat(p.fixed32())
                          } else if ((t >> 3) == 1 && (t & 7) == 5) {
                            acc += java.lang.Float.intBitsToFloat(l.fixed32())
                          } else l.skip((t & 7).toInt)
                        }
                        fl = acc.result()
                      case (3, 2) => // Int64List: repeated int64 = 1 (packed or not)
                        val l = feat.sub()
                        val acc = Seq.newBuilder[Long]
                        while (l.hasMore) {
                          val t = l.varint()
                          if ((t >> 3) == 1 && (t & 7) == 2) { // packed
                            val p = l.sub()
                            while (p.hasMore) acc += p.varint()
                          } else if ((t >> 3) == 1 && (t & 7) == 0) {
                            acc += l.varint()
                          } else l.skip((t & 7).toInt)
                        }
                        il = acc.result()
                      case (_, w) => feat.skip(w)
                    }
                  }
                case (_, w) => entry.skip(w)
              }
            }
            if (bl != null) bytesF += name -> bl
            else if (fl != null) floatF += name -> fl
            else if (il != null) int64F += name -> il
          } else fs.skip((ftag & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    Example(bytesF.result(), floatF.result(), int64F.result())
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def lenDelim(out: java.io.ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2); writeVarint(out, body.length.toLong); out.write(body)
  }

  /** Encode a tf.Example (packed leaf encodings, the TF writer's form). */
  def encodeExample(e: Example): Array[Byte] = {
    def feature(body: java.io.ByteArrayOutputStream => Unit, listField: Int): Array[Byte] = {
      val list = new java.io.ByteArrayOutputStream(); body(list)
      val feat = new java.io.ByteArrayOutputStream()
      lenDelim(feat, listField, list.toByteArray)
      feat.toByteArray
    }
    val features = new java.io.ByteArrayOutputStream()
    def entry(name: String, feat: Array[Byte]): Unit = {
      val en = new java.io.ByteArrayOutputStream()
      lenDelim(en, 1, name.getBytes("UTF-8"))
      lenDelim(en, 2, feat)
      lenDelim(features, 1, en.toByteArray)
    }
    // deterministic output: sorted feature names (map order must not
    // change bytes — shipped shards should be reproducible)
    e.bytes_features.toSeq.sortBy(_._1).foreach { case (n, vs) =>
      entry(n, feature(l => vs.foreach(v => lenDelim(l, 1, v)), 1))
    }
    e.float_features.toSeq.sortBy(_._1).foreach { case (n, vs) =>
      entry(n, feature({ l =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach { f =>
          val bb = java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .putInt(java.lang.Float.floatToIntBits(f))
          packed.write(bb.array())
        }
        lenDelim(l, 1, packed.toByteArray)
      }, 2))
    }
    e.int64_features.toSeq.sortBy(_._1).foreach { case (n, vs) =>
      entry(n, feature({ l =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        lenDelim(l, 1, packed.toByteArray)
      }, 3))
    }
    val out = new java.io.ByteArrayOutputStream()
    lenDelim(out, 1, features.toByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------ Spark

  final case class ExampleRow(
      path: String,
      bytes_features: Map[String, Seq[Array[Byte]]],
      float_features: Map[String, Seq[Float]],
      int64_features: Map[String, Seq[Long]])

  /** Read every tf.Example from a directory of TFRecord files. A record
    * that fails the proto decode is dropped (counted nowhere — audit
    * with unframe() if forensics are needed); a file that fails framing
    * keeps its decoded prefix.
    *
    * r15: STREAMS — listing-only scan (no content column), each task
    * opens its files through the Hadoop FileSystem and unframes
    * incrementally, so task memory is one record + stream buffers
    * regardless of shard size (the WarcReader grain discipline; trainer
    * shards are routinely multi-GB). An unreadable file costs itself;
    * streams close on iterator exhaustion AND task completion. */
  def readExamples(spark: SparkSession, dir: String,
      glob: String = "*.tfrecord*"): Dataset[ExampleRow] = {
    import spark.implicits._
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    FileCorpus.scan(spark, dir, glob).select(col("path")).as[String]
      .mapPartitions { paths =>
        val open = new java.util.ArrayDeque[java.io.InputStream]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            open.forEach(s => try s.close() catch { case _: Exception => () })
          })
        paths.flatMap { p =>
          val streamOpt =
            try {
              val hp = new org.apache.hadoop.fs.Path(p)
              val fs = hp.getFileSystem(bcConf.value.value)
              Some(new java.io.BufferedInputStream(fs.open(hp), 1 << 16))
            } catch { case _: Exception => None } // unreadable file costs itself
          streamOpt.iterator.flatMap { stream =>
            open.add(stream)
            val payloads = unframeStream(stream)
            new Iterator[ExampleRow] {
              private var pending: ExampleRow = _
              private var done = false
              private def advance(): Unit = {
                while (pending == null && !done) {
                  if (!payloads.hasNext) {
                    done = true
                    open.remove(stream)
                    try stream.close() catch { case _: Exception => () }
                  } else {
                    try {
                      val e = decodeExample(payloads.next())
                      pending = ExampleRow(p,
                        e.bytes_features, e.float_features, e.int64_features)
                    } catch { case _: Exception => () } // bad record dropped
                  }
                }
              }
              override def hasNext: Boolean = { advance(); pending != null }
              override def next(): ExampleRow = {
                if (!hasNext) throw new NoSuchElementException
                val r = pending; pending = null; r
              }
            }
          }
        }
      }
  }

  /** Write one `.tfrecord` file per partition of `df` (columns
    * bytes_features / float_features / int64_features as in
    * [[ExampleRow]]) under `dir`. Returns the file count. Shard count and
    * ordering are the CALLER's repartition/sortWithinPartitions — the
    * t21 manifest discipline.
    *
    * r15 (the r14 verdict item): shards write through the task's Hadoop
    * FileSystem — local paths, HDFS and object stores alike — and frames
    * STREAM to the output (one encoded record in memory, never the whole
    * shard). Commit protocol for retried/speculative tasks: each attempt
    * writes `.part-NNNNN-attempt-K.tfrecord.tmp` (attempt-unique, so
    * concurrent attempts never interleave bytes) and renames to the
    * final name only after a successful close; a loser whose rename is
    * refused (HDFS semantics: dest exists) deletes its temp. A POSIX
    * local rename replaces the winner's file instead — harmless, because
    * both attempts of a deterministic partition produce identical bytes.
    * Either way no reader ever observes a truncated final shard. */
  def writeExamples(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val cols = Seq("bytes_features", "float_features", "int64_features")
    val normalized = cols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, org.apache.spark.sql.functions.expr(
        c match {
          case "bytes_features" => "CAST(map() AS map<string,array<binary>>)"
          case "float_features" => "CAST(map() AS map<string,array<float>>)"
          case _ => "CAST(map() AS map<string,array<bigint>>)"
        })))
    normalized
      .select(col("bytes_features"), col("float_features"), col("int64_features"))
      .as[(Map[String, Seq[Array[Byte]]], Map[String, Seq[Float]], Map[String, Seq[Long]])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val d = new org.apache.hadoop.fs.Path(dir)
          // private (non-cached) FS instance so disabling the client-side
          // .crc sidecar — TFRecord frames carry their own CRC32C per
          // record — does not mutate the JVM-shared cached FileSystem
          val fs = org.apache.hadoop.fs.FileSystem.newInstance(
            d.toUri, bcConf.value.value)
          try {
            fs.setWriteChecksum(false)
            val finalPath = new org.apache.hadoop.fs.Path(d, f"part-$pid%05d.tfrecord")
            val tmpPath = new org.apache.hadoop.fs.Path(d,
              f".part-$pid%05d-attempt-${tc.taskAttemptId()}%d.tfrecord.tmp")
            val out = new java.io.BufferedOutputStream(fs.create(tmpPath, true), 1 << 20)
            var ok = false
            try {
              frameTo(out, it.map { case (bf, ff, lf) =>
                encodeExample(Example(bf, ff, lf))
              })
              out.close()
              ok = true
            } finally if (!ok) {
              try out.close() catch { case _: Exception => () }
              try fs.delete(tmpPath, false) catch { case _: Exception => () }
            }
            val committed = try fs.rename(tmpPath, finalPath)
              catch { case _: Exception => false }
            if (!committed) fs.delete(tmpPath, false) // another attempt won
          } finally fs.close()
          Iterator.single(1L)
        }
      }.collect().sum // not reduce(): an all-empty frame must yield 0, not throw
  }
}
