package graft.sources

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container reader — the Kafka-archive / Hive-interchange
  * format next to L123's ORC/JSONL/CSV. Spark's external `spark-avro`
  * module is not on this classpath, but the Apache Avro CORE library is
  * (Spark itself depends on it), so the container format is read
  * first-class through `DataFileReader` — block framing, sync markers,
  * null/deflate/snappy codecs and WRITER-vs-READER schema resolution all
  * come from the reference implementation rather than a hand parser.
  *
  * Semantics:
  *  - the READER schema is the field-superset generation found by a
  *    distributed header survey (see [[read]]), and every file is
  *    resolved against it — Avro's own evolution rules (new fields with
  *    defaults, int→long promotions, reordered fields) apply across a
  *    directory of mixed-generation files, the L130 mergeSchema reality
  *    in Avro's native mechanism; an UNRESOLVABLE generation (field
  *    removed without a default) fails loudly instead of yielding zero
  *    rows that read as an empty file;
  *  - types map recursively: record→struct, array→array, map→map(string,·),
  *    enum/fixed→string/binary, union[null,X]→nullable X (any other union
  *    is refused with a clear error — Catalyst has no tagged-union type,
  *    and silently stringifying one corrupts downstream math);
  *  - fail-soft per FILE: a corrupt block/tail yields the rows decoded so
  *    far from that file (the WarcReader contract — a bad file costs its
  *    tail, not the job).
  *
  * Scale shape (r15 — everything STREAMS): one file per task from a
  * listing-only scan, rows decoded one at a time off a Hadoop
  * FileSystem stream through `DataFileStream` (task memory = one record
  * + the codec's block buffer, any container size); the schema survey
  * likewise opens each file's stream and reads ONLY the header (a few
  * KB — `DataFileStream`'s constructor stops at the sync marker),
  * distinct schema strings to the driver — generations, not files, so
  * the collect is bounded. Avro files ARE block-splittable by sync
  * marker; record-level splitting of one file would need seek+resync —
  * out of scope when the parallelism unit is the file, the right grain
  * for the many-files archive layout this reader targets. */
object AvroReader {

  /** Survey sanity cap: more distinct writer schemas than this in one
    * directory is schema CHURN, not evolution — refused loudly instead
    * of surprising the driver heap (r16 verdict item 5). */
  val MaxSurveySchemas: Int = 64

  /** The embedded writer schema of a container's header. */
  def schemaOf(bytes: Array[Byte]): ASchema = {
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Writer schema from a STREAM — `DataFileStream`'s constructor decodes
    * only magic + metadata + sync marker, so the survey reads a few KB
    * per file, never the file (r15). */
  def schemaOfStream(in: java.io.InputStream): ASchema = {
    val r = new org.apache.avro.file.DataFileStream[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** INVERSE mapping (r15, the write side): Catalyst→Avro. Nullable
    * fields become `union[null, X]` with default null — which is exactly
    * what makes the read side's evolution rules (and the superset
    * survey) work across generations of written files. Types Avro has
    * no loss-free spelling for (decimal, timestamp, date, non-string map
    * keys) are REFUSED loudly: silently widening a decimal to double
    * corrupts downstream math, the same rule as the union refusal on
    * the read side. Two documented non-identities that are NOT loss:
    * byte/short widen to Avro int (read-back schema says IntegerType —
    * every value is preserved exactly), and field names must already be
    * Avro-spellable — an unspellable name is refused, never rewritten
    * (see sanitize below). */
  def avroSchema(st: StructType, recordName: String = "row"): ASchema = {
    // Field names are VALIDATED, never rewritten (ADVICE r15): the old
    // sanitize() silently renamed 'a-b' to 'a_b' on write — a round-trip
    // that renames columns is data loss by this module's own doctrine,
    // and two distinct names ('a-b' vs 'a_b') collided post-sanitize
    // into an opaque Avro duplicate-field error. A name Avro cannot
    // spell ([A-Za-z_][A-Za-z0-9_]*) is refused with the rename the
    // caller should make explicitly, exactly like the unspellable-type
    // path below.
    def isAvroName(s: String): Boolean =
      s.nonEmpty && (s.head.isLetter && s.head < 128 || s.head == '_') &&
        s.forall(c => c == '_' || (c < 128 && (c.isLetter || c.isDigit)))
    def sanitize(s: String): String = {
      if (!isAvroName(s)) throw new IllegalArgumentException(
        s"field name '$s' is not an Avro name ([A-Za-z_][A-Za-z0-9_]*) — " +
          "rename it explicitly (withColumnRenamed) before interchange; " +
          "silent sanitization renames columns on round-trip and can " +
          "collide two distinct source fields")
      s
    }
    // record names accept Avro FULLNAMES too (dot-separated segments,
    // each a legal name) — callers legitimately pass
    // recordName = "com.example.Row", which needs no renaming and which
    // the field-name error text would misdescribe
    def recName(s: String): String = {
      // split(-1) never yields an empty array; "" becomes Array("") and
      // fails isAvroName, as do leading/trailing/double dots
      val segs = s.split("\\.", -1)
      if (!segs.forall(isAvroName)) throw new IllegalArgumentException(
        s"record name '$s' is not an Avro name or dotted fullname — " +
          "pass a legal recordName (segments of [A-Za-z_][A-Za-z0-9_]*)")
      s
    }
    def field(dt: DataType, nullable: Boolean, path: String): ASchema = {
      val base = dt match {
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case ByteType | ShortType | IntegerType => ASchema.create(ASchema.Type.INT)
        case LongType => ASchema.create(ASchema.Type.LONG)
        case FloatType => ASchema.create(ASchema.Type.FLOAT)
        case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
        case StringType => ASchema.create(ASchema.Type.STRING)
        case BinaryType => ASchema.create(ASchema.Type.BYTES)
        // logical types (r15): the annotations Hive/Kafka interchange
        // actually carries — micros/days/unscaled-bytes, all loss-free
        case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
        case DateType => org.apache.avro.LogicalTypes.date()
          .addToSchema(ASchema.create(ASchema.Type.INT))
        case d: DecimalType => org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(ASchema.create(ASchema.Type.BYTES))
        case ArrayType(et, en) => ASchema.createArray(field(et, en, path + "_item"))
        case MapType(StringType, vt, vn) => ASchema.createMap(field(vt, vn, path + "_value"))
        case s: StructType => record(s, path)
        case other => throw new IllegalArgumentException(
          s"no loss-free Avro spelling for Catalyst type $other at '$path' — " +
            "cast it explicitly (e.g. interval -> string, or key maps by string) " +
            "before interchange")
      }
      if (nullable)
        ASchema.createUnion(java.util.List.of(ASchema.create(ASchema.Type.NULL), base))
      else base
    }
    def record(s: StructType, path: String): ASchema = {
      val fields = new java.util.ArrayList[ASchema.Field]()
      s.fields.foreach { f =>
        val fs = field(f.dataType, f.nullable, path + "_" + sanitize(f.name))
        fields.add(
          if (f.nullable)
            new ASchema.Field(sanitize(f.name), fs, null,
              org.apache.avro.JsonProperties.NULL_VALUE)
          else new ASchema.Field(sanitize(f.name), fs, null))
      }
      val rec = ASchema.createRecord(recName(path), null, "graft.interchange", false)
      rec.setFields(fields)
      rec
    }
    record(st, recordName)
  }

  /** Catalyst value → Avro generic value against the field's schema. */
  private def toAvro(v: Any, s: ASchema): Any = {
    if (v == null) return null
    val branch =
      if (s.getType == ASchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(s)
      else s
    Option(branch.getLogicalType).map(_.getName) match {
      case Some("timestamp-micros") =>
        val i = v match {
          case t: java.sql.Timestamp => t.toInstant
          case t: java.time.Instant => t
          case other => throw new IllegalArgumentException(
            s"timestamp value of unexpected class ${other.getClass}")
        }
        return Long.box(Math.addExact(
          Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      case Some("date") =>
        val ld = v match {
          case d: java.sql.Date => d.toLocalDate
          case d: java.time.LocalDate => d
          case other => throw new IllegalArgumentException(
            s"date value of unexpected class ${other.getClass}")
        }
        return Int.box(Math.toIntExact(ld.toEpochDay))
      case Some("decimal") =>
        val scale = branch.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        val bd = v match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
          case other => throw new IllegalArgumentException(
            s"decimal value of unexpected class ${other.getClass}")
        }
        // Catalyst enforces the column's scale, so setScale is exact
        return java.nio.ByteBuffer.wrap(
          bd.setScale(scale).unscaledValue().toByteArray)
      case _ => ()
    }
    branch.getType match {
      case ASchema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ASchema.Type.STRING => v.toString
      case ASchema.Type.INT => v match {
        case b: Byte => Int.box(b.toInt)
        case sh: Short => Int.box(sh.toInt)
        case other => other
      }
      case ASchema.Type.ARRAY =>
        val es = branch.getElementType
        val out = new java.util.ArrayList[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(e => out.add(toAvro(e, es)))
        out
      case ASchema.Type.MAP =>
        val vs = branch.getValueType
        val out = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[_, _]].foreach { case (k, mv) =>
          out.put(k.toString, toAvro(mv, vs))
        }
        out
      case ASchema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new org.apache.avro.generic.GenericData.Record(branch)
        branch.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(i, toAvro(row.get(i), f.schema()))
        }
        rec
      case _ => v
    }
  }

  /** Write one `.avro` container per partition of `df` under `dir`;
    * returns the file count. Shard count/ordering are the caller's
    * repartition (the TfRecord discipline), writes go through the
    * task's Hadoop FileSystem with the attempt-unique temp + rename
    * commit, and records STREAM through `DataFileWriter` one at a time.
    * Commit-atomicity scope (ADVICE r15, mirroring writeExamples): on
    * HDFS a loser's rename is refused (dest exists) and it deletes its
    * temp; on POSIX/S3A-like filesystems the rename REPLACES the winner
    * — harmless only because two attempts of a deterministic partition
    * produce identical bytes, which is the precondition a caller must
    * preserve (an upstream round-robin repartition fed by a
    * nondeterministic source does not strictly guarantee it — key the
    * repartition by content when re-execution identity matters). Either
    * way no reader observes a truncated FINAL-named container. Codec:
    * "deflate" (default), "snappy", or "null". */
  def write(df: org.apache.spark.sql.DataFrame, dir: String,
      recordName: String = "row", codec: String = "deflate"): Long = {
    val schema = avroSchema(df.schema, recordName)
    val schemaJson = schema.toString
    val spark = df.sparkSession
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val d = new org.apache.hadoop.fs.Path(dir)
        // private FS instance: Avro containers carry per-block sync
        // markers + codec checksums; no .crc sidecars wanted
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(d.toUri, bcConf.value.value)
        try {
          fs.setWriteChecksum(false)
          val finalPath = new org.apache.hadoop.fs.Path(d, f"part-$pid%05d.avro")
          val tmpPath = new org.apache.hadoop.fs.Path(d,
            f".part-$pid%05d-attempt-${tc.taskAttemptId()}%d.avro.tmp")
          val sch = new ASchema.Parser().parse(schemaJson)
          val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
            new org.apache.avro.generic.GenericDatumWriter[GenericRecord](sch))
          w.setCodec(codec match {
            case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
            case "null" => org.apache.avro.file.CodecFactory.nullCodec()
            case _ => org.apache.avro.file.CodecFactory.deflateCodec(6)
          })
          val out = fs.create(tmpPath, true)
          var ok = false
          try {
            w.create(sch, out)
            it.foreach(row => w.append(toAvro(row, sch).asInstanceOf[GenericRecord]))
            w.close() // closes out
            ok = true
          } finally if (!ok) {
            try w.close() catch { case _: Exception => () }
            try fs.delete(tmpPath, false) catch { case _: Exception => () }
          }
          val committed = try fs.rename(tmpPath, finalPath)
            catch { case _: Exception => false }
          if (!committed) fs.delete(tmpPath, false) // another attempt won
        } finally fs.close()
        Iterator.single(1L)
      }
    }(Encoders.scalaLong).collect().sum
  }

  /** Recursive Avro→Catalyst type mapping (see scaladoc for the rules).
    * r15: LOGICAL types map to their Catalyst equivalents —
    * timestamp-micros/-millis → TimestampType (micros internally, UTC),
    * date → DateType, decimal(p,s) over bytes/fixed → DecimalType(p,s)
    * — the annotations real Hive/Kafka interchange carries. Unannotated
    * primitives keep the raw mapping. */
  def sparkType(s: ASchema): DataType = {
    val lt = s.getLogicalType
    (s.getType, Option(lt).map(_.getName).orNull) match {
      case (ASchema.Type.LONG, "timestamp-micros") | (ASchema.Type.LONG, "timestamp-millis") =>
        TimestampType
      case (ASchema.Type.INT, "date") => DateType
      case (ASchema.Type.BYTES, "decimal") | (ASchema.Type.FIXED, "decimal") =>
        val d = lt.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      case _ => s.getType match {
        case ASchema.Type.BOOLEAN => BooleanType
        case ASchema.Type.INT => IntegerType
        case ASchema.Type.LONG => LongType
        case ASchema.Type.FLOAT => FloatType
        case ASchema.Type.DOUBLE => DoubleType
        case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
        case ASchema.Type.BYTES | ASchema.Type.FIXED => BinaryType
        case ASchema.Type.NULL => NullType
        case ASchema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
        case ASchema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
        case ASchema.Type.RECORD =>
          StructType(s.getFields.asScala.toSeq.map(f =>
            StructField(f.name(), sparkType(f.schema()), nullable = true)))
        case ASchema.Type.UNION =>
          val nonNull = s.getTypes.asScala.filterNot(_.getType == ASchema.Type.NULL)
          if (nonNull.size == 1) sparkType(nonNull.head)
          else throw new IllegalArgumentException(
            s"unsupported non-nullable union $s: Catalyst has no tagged-union type — " +
              "restructure the schema (one field per branch) before interchange")
        case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
      }
    }
  }

  private def convert(v: Any, s: ASchema): Any = {
    if (v == null) return null
    // logical-type annotations convert schema-aware, before the
    // value-class dispatch (the raw value is a plain long/int/bytes)
    val branch =
      if (s.getType == ASchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(s)
      else s
    Option(branch.getLogicalType).map(_.getName) match {
      case Some("timestamp-micros") =>
        val us = v.asInstanceOf[Long]
        return java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case Some("timestamp-millis") =>
        return new java.sql.Timestamp(v.asInstanceOf[Long])
      case Some("date") =>
        return java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Some("decimal") =>
        val scale = branch.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        val unscaled = v match {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
          case other => throw new IllegalArgumentException(
            s"decimal logical type over unexpected value ${other.getClass}")
        }
        return new java.math.BigDecimal(new java.math.BigInteger(unscaled), scale)
      case _ => ()
    }
    convertRaw(v, s)
  }

  private def convertRaw(v: Any, s: ASchema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case r: GenericRecord =>
      val rs = resolve(s, ASchema.Type.RECORD)
      Row.fromSeq(rs.getFields.asScala.toSeq.map(fd => convert(r.get(fd.pos()), fd.schema())))
    case a: java.util.Collection[_] =>
      val es = resolve(s, ASchema.Type.ARRAY).getElementType
      a.asScala.toSeq.map(convert(_, es))
    case m: java.util.Map[_, _] =>
      val vs = resolve(s, ASchema.Type.MAP).getValueType
      m.asScala.map { case (k, mv) => k.toString -> convert(mv, vs) }.toMap
    case other => other // primitives arrive as their JVM types
  }

  /** Every record-field path in the schema tree, descending through
    * records, array elements, map values and nullable-union branches —
    * the containment domain of the read survey (r15). A named record
    * already on the descent path is not re-entered (r15 review: legal
    * recursive Avro schemas — linked lists, trees — must not overflow
    * the survey; one level of the cycle's fields is containment enough,
    * since the recursion is by NAME and the named type's fields are
    * already in the set). */
  private[graft] def fieldPaths(s: ASchema, prefix: String = "",
      visiting: Set[String] = Set.empty): Set[String] =
    s.getType match {
      case ASchema.Type.RECORD =>
        if (visiting(s.getFullName)) Set.empty
        else {
          val v = visiting + s.getFullName
          s.getFields.asScala.flatMap { f =>
            val p = if (prefix.isEmpty) f.name() else prefix + "." + f.name()
            Set(p) ++ fieldPaths(f.schema(), p, v)
          }.toSet
        }
      case ASchema.Type.ARRAY => fieldPaths(s.getElementType, prefix + "[]", visiting)
      case ASchema.Type.MAP => fieldPaths(s.getValueType, prefix + "{}", visiting)
      case ASchema.Type.UNION =>
        s.getTypes.asScala.filterNot(_.getType == ASchema.Type.NULL)
          .flatMap(fieldPaths(_, prefix, visiting)).toSet
      case _ => Set.empty
    }

  /** The `t`-typed branch of `s` (identity for non-unions) — values of a
    * nullable union carry the branch's schema, not the union's. */
  private def resolve(s: ASchema, t: ASchema.Type): ASchema =
    if (s.getType == t) s
    else s.getTypes.asScala.find(_.getType == t).getOrElse(s)

  /** Decode one container against `readerJson`. Three regimes (r15, the
    * r14 ADVICE distinction — whole-file data loss must never look like
    * an empty file):
    *  - container header unreadable (garbage / corrupt magic): the file
    *    yields nothing — corruption fail-soft, a bad file costs itself;
    *  - header READS but the writer schema does not RESOLVE against the
    *    reader schema (e.g. a field removed without a default): LOUD
    *    `IllegalArgumentException` — this is a schema/configuration
    *    event that would silently lose every row of that generation,
    *    not a corruption event;
    *  - mid-stream corruption after a compatible header: the rows
    *    decoded so far (fail-soft tail, as before). */
  def parseRows(bytes: Array[Byte], readerJson: String, st: StructType): Seq[Row] =
    parseRowsStream(new SeekableByteArrayInput(bytes), readerJson, st).toSeq

  /** Streaming form of [[parseRows]] (r15 — the WarcReader grain
    * discipline): rows decode ONE AT A TIME off the stream through
    * `DataFileStream`, so task memory is one record + the codec's block
    * buffer regardless of container size. Same three regimes: header
    * unreadable → empty iterator; resolution incompatibility → loud
    * throw (before any row is emitted); mid-stream corruption → the
    * iterator ends with the rows decoded so far. The stream is closed on
    * exhaustion or corruption (callers add task-completion cleanup for
    * early-terminating consumers). */
  def parseRowsStream(in: java.io.InputStream, readerJson: String,
      st: StructType): Iterator[Row] = {
    val reader = new ASchema.Parser().parse(readerJson)
    val r =
      try new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord](null, reader))
      catch { case _: Exception => return Iterator.empty } // not an Avro container
    val compat =
      try org.apache.avro.SchemaCompatibility
        .checkReaderWriterCompatibility(reader, r.getSchema)
      catch { case _: Exception => try r.close() catch { case _: Exception => () }; null }
    if (compat == null) return Iterator.empty
    if (compat.getType !=
        org.apache.avro.SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE) {
      try r.close() catch { case _: Exception => () }
      throw new IllegalArgumentException(
        s"Avro writer schema does not resolve against the reader schema — " +
          s"rows would be silently lost: ${compat.getResult.getIncompatibilities}")
    }
    new Iterator[Row] {
      private var pending: Row = _
      private var done = false
      private def finish(): Unit = {
        done = true
        try r.close() catch { case _: Exception => () }
      }
      private def advance(): Unit = {
        try {
          if (r.hasNext) {
            val rec = r.next()
            pending = Row.fromSeq(st.fields.indices.map(i =>
              convert(rec.get(i), reader.getFields.get(i).schema())))
          } else finish()
        } catch { case _: Exception => finish() } // corruption: keep prefix
      }
      override def hasNext: Boolean = {
        if (pending == null && !done) advance()
        pending != null
      }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("end of Avro stream")
        val row = pending; pending = null; row
      }
    }
  }

  /** Scan `dir` for Avro containers and return one DataFrame + a `path`
    * provenance column. The reader schema is chosen by a distributed
    * schema SURVEY (r15, the r14 ADVICE fix — the old "lexicographically
    * first file" rule silently projected away newer generations' added
    * fields whenever an old file sorted first): every file's header is
    * decoded on the executors, the distinct writer schemas (a handful of
    * generations, never data-sized) come back to the driver, and the one
    * whose top-level field set CONTAINS every other's becomes the reader
    * — Avro's evolution rules then fill the added fields' defaults for
    * older files. No superset schema → loud error (a forked lineage
    * needs a hand-written reader schema, not a silent guess). Files
    * whose header does not decode are skipped by the survey and yield
    * nothing at parse time (corruption fail-soft); files whose schema
    * does not RESOLVE against the chosen reader fail loudly at parse
    * time (see [[parseRows]]). */
  def read(spark: SparkSession, dir: String, glob: String = "*.avro"): DataFrame = {
    import spark.implicits._
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    def paths = FileCorpus.scan(spark, dir, glob).select(col("path")).as[String]
    // survey: header-only stream reads (a few KB per file), distinct
    // schema strings to the driver — generations, not files
    val schemaJsons = paths
      .mapPartitions { it =>
        it.flatMap { p =>
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            val in = hp.getFileSystem(bcConf.value.value).open(hp)
            try Some(schemaOfStream(in).toString)
            finally { try in.close() catch { case _: Exception => () } }
          } catch { case _: Exception => None } // unreadable header: skipped
        }
      }
      .distinct().limit(MaxSurveySchemas + 1).collect().toSeq.sorted
    require(schemaJsons.nonEmpty,
      s"no files with a readable Avro header matching $glob under $dir")
    // Fleet-scale guard (r16 verdict item 5): the collect is bounded by
    // GENERATION count in any sane directory, but a pathological corpus
    // (per-file random field order ⇒ per-file distinct schema JSON) would
    // turn it into a file-count driver transfer. limit(N+1) bounds the
    // transfer mechanically; the require turns a driver heap surprise
    // into a named error with the fix.
    require(schemaJsons.size <= MaxSurveySchemas,
      s"schema survey found more than $MaxSurveySchemas distinct writer " +
        s"schemas under $dir — this is not schema evolution but per-file " +
        "schema churn (e.g. randomized field order); normalize the files " +
        "or read them in batches with an explicit reader schema")
    val schemas = schemaJsons.map(j => new ASchema.Parser().parse(j))
    require(schemas.forall(_.getType == ASchema.Type.RECORD),
      s"top-level Avro schema must be a record, got ${schemas.map(_.getType).distinct}")
    // containment over the FULL field-path tree, not top-level names
    // (r15 review): generations that diverge inside a nested record have
    // identical top-level sets, and picking either by a tiebreak would
    // silently project away the other's nested fields — exactly the
    // data-loss mode the survey exists to prevent. Paths descend through
    // records, array elements, map values and nullable-union branches.
    val fieldSets = schemas.map(s => fieldPaths(s))
    val reader = schemas.zip(fieldSets)
      .filter { case (_, fs) => fieldSets.forall(_.subsetOf(fs)) }
      .sortBy { case (s, fs) => (-fs.size, s.toString) }
      .headOption.map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        "no single file schema covers every other generation's fields " +
          "(nested paths included) — supply an explicit reader schema; " +
          s"saw field-path sets ${fieldSets.distinct}"))
    val readerJson = reader.toString
    val dataType = sparkType(reader).asInstanceOf[StructType]
    require(!dataType.fieldNames.contains("path"),
      "Avro schema has a top-level field named 'path', which collides with " +
        "the provenance column this reader prepends — rename one of them")
    val full = StructType(StructField("path", StringType, nullable = false) +: dataType.fields)
    // rows: streamed per file through the Hadoop FS (one record in
    // memory, r15); streams close on iterator exhaustion AND on task
    // completion (early-terminating consumers like limit())
    paths.mapPartitions { it =>
      val open = new java.util.ArrayDeque[java.io.InputStream]()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          open.forEach(s => try s.close() catch { case _: Exception => () })
        })
      it.flatMap { p =>
        val streamOpt =
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            Some(new java.io.BufferedInputStream(
              hp.getFileSystem(bcConf.value.value).open(hp), 1 << 16))
          } catch { case _: Exception => None } // unreadable file costs itself
        streamOpt.iterator.flatMap { stream =>
          open.add(stream)
          val rows = parseRowsStream(stream, readerJson, dataType)
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h && open.remove(stream)) {
                try stream.close() catch { case _: Exception => () }
              }
              h
            }
            override def next(): Row = Row.fromSeq(p +: rows.next().toSeq)
          }
        }
      }
    }(Encoders.row(full)).toDF()
  }
}
