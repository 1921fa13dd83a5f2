package graft

import graft.sources.AvroReader
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container source (SURVEY S23): container decode through the
  * reference library (codecs included), recursive type mapping, Avro's
  * own writer→reader schema resolution across mixed-generation files,
  * the non-nullable-union refusal, and the fail-soft tail contract. */
class AvroReaderSpec extends SparkSpec {

  private val v1Json =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"title","type":["null","string"],"default":null},
      |{"name":"score","type":"double"},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"meta","type":{"type":"map","values":"int"}},
      |{"name":"inner","type":{"type":"record","name":"Inner","fields":[
      |  {"name":"a","type":"int"},{"name":"b","type":"string"}]}}
      |]}""".stripMargin
  // generation 2 adds a defaulted field — older files must resolve
  private val v2Json = v1Json.replace(
    """{"name":"inner",""",
    """{"name":"lang","type":"string","default":"und"},{"name":"inner",""")

  private def rec(schema: ASchema, vals: Map[String, Any]): GenericRecord = {
    val r = new GenericData.Record(schema)
    vals.foreach { case (k, v) => r.put(k, v) }
    r
  }

  private def writeContainer(schema: ASchema, codec: CodecFactory,
      recs: Seq[GenericRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.create(schema, bos)
    recs.foreach(w.append)
    w.close()
    bos.toByteArray
  }

  private def v1Records(s: ASchema): Seq[GenericRecord] = {
    val inner = s.getField("inner").schema()
    Seq(
      rec(s, Map("id" -> 1L, "title" -> "alpha", "score" -> 0.5,
        "tags" -> java.util.List.of("x", "y"),
        "meta" -> java.util.Map.of("k", Int.box(7)),
        "inner" -> rec(inner, Map("a" -> 3, "b" -> "in")))),
      rec(s, Map("id" -> 2L, "title" -> null, "score" -> 1.25,
        "tags" -> java.util.List.of(),
        "meta" -> java.util.Map.of(),
        "inner" -> rec(inner, Map("a" -> 4, "b" -> "ner")))))
  }

  test("type mapping: nested record/array/map, nullable union, refusals") {
    val st = AvroReader.sparkType(new ASchema.Parser().parse(v1Json)).asInstanceOf[StructType]
    assert(st("id").dataType == LongType)
    assert(st("title").dataType == StringType)
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("meta").dataType == MapType(StringType, IntegerType))
    assert(st("inner").dataType.isInstanceOf[StructType])
    val tagged = """["int","string"]"""
    intercept[IllegalArgumentException] {
      AvroReader.sparkType(new ASchema.Parser().parse(tagged))
    }
  }

  test("deflate + snappy containers round-trip through Spark with evolution") {
    val v1 = new ASchema.Parser().parse(v1Json)
    val v2 = new ASchema.Parser().parse(v2Json)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro")
    try {
      // the OLDER generation sorts lexicographically FIRST — under the
      // r14 first-file rule the reader schema would be v1 and every v2
      // row's `lang` silently projected away (the ADVICE data-loss
      // case); the r15 schema survey must pick v2 (field superset)
      // regardless of file order, and the v1 file resolves against it
      // (lang fills from its default)
      val inner2 = v2.getField("inner").schema()
      val g2 = Seq(rec(v2, Map("id" -> 3L, "title" -> "gamma", "score" -> 2.0,
        "lang" -> "en", "tags" -> java.util.List.of("z"),
        "meta" -> java.util.Map.of("m", Int.box(1)),
        "inner" -> rec(inner2, Map("a" -> 5, "b" -> "v2")))))
      java.nio.file.Files.write(dir.resolve("a_gen1.avro"),
        writeContainer(v1, CodecFactory.deflateCodec(6), v1Records(v1)))
      java.nio.file.Files.write(dir.resolve("b_gen2.avro"),
        writeContainer(v2, CodecFactory.snappyCodec(), g2))
      val df = AvroReader.read(spark, dir.toString).orderBy(col("id"))
      val rows = df.collect()
      assert(rows.length == 3)
      assert(df.schema.fieldNames.toSeq ==
        Seq("path", "id", "title", "score", "tags", "meta", "lang", "inner"))
      // evolution: gen-1 rows resolved the defaulted field
      assert(rows.filter(_.getAs[Long]("id") <= 2L).forall(_.getAs[String]("lang") == "und"))
      assert(rows(2).getAs[String]("lang") == "en")
      // values survive the full mapping
      assert(rows(0).getAs[String]("title") == "alpha")
      assert(rows(1).getAs[String]("title") == null)
      assert(rows(0).getAs[scala.collection.Seq[String]]("tags") == Seq("x", "y"))
      assert(rows(0).getAs[scala.collection.Map[String, Int]]("meta") == Map("k" -> 7))
      assert(rows(0).getAs[org.apache.spark.sql.Row]("inner").getAs[String]("b") == "in")
      // columnar downstream: prune + filter as usual
      assert(df.filter(col("inner.a") >= 4).count() == 2)
      // narrow: no shuffle from scan to filter
      val p = df.filter(col("score") > 0).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange") || p.contains("Sort"), // orderBy above adds one
        s"avro parse must stay narrow before the sort:\n${p.take(1500)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("unresolvable generation fails LOUDLY instead of reading as an empty file") {
    // writer removed `score` without a default → the reader (which has
    // it, no default) cannot resolve; the r14 catch-all swallowed this
    // into zero rows — whole-file data loss indistinguishable from an
    // empty container. Now it throws with the incompatibility.
    val v3Json = v1Json.replace("""{"name":"score","type":"double"},""", "")
    val v3 = new ASchema.Parser().parse(v3Json)
    val inner3 = v3.getField("inner").schema()
    val g3 = Seq(rec(v3, Map("id" -> 9L, "title" -> "no-score",
      "tags" -> java.util.List.of(), "meta" -> java.util.Map.of(),
      "inner" -> rec(inner3, Map("a" -> 1, "b" -> "x")))))
    val bytes = writeContainer(v3, CodecFactory.nullCodec(), g3)
    val st = AvroReader.sparkType(new ASchema.Parser().parse(v1Json)).asInstanceOf[StructType]
    val e = intercept[IllegalArgumentException] {
      AvroReader.parseRows(bytes, v1Json, st)
    }
    assert(e.getMessage.contains("does not resolve"))
  }

  test("no superset generation and a 'path' field collision are refused with clear errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-refuse")
    try {
      // forked lineage: {id,a} and {id,b} — neither covers the other
      val fa = new ASchema.Parser().parse(
        """{"type":"record","name":"F","fields":[{"name":"id","type":"long"},{"name":"a","type":"int"}]}""")
      val fb = new ASchema.Parser().parse(
        """{"type":"record","name":"F","fields":[{"name":"id","type":"long"},{"name":"b","type":"int"}]}""")
      java.nio.file.Files.write(dir.resolve("a.avro"),
        writeContainer(fa, CodecFactory.nullCodec(), Seq(rec(fa, Map("id" -> 1L, "a" -> 2)))))
      java.nio.file.Files.write(dir.resolve("b.avro"),
        writeContainer(fb, CodecFactory.nullCodec(), Seq(rec(fb, Map("id" -> 1L, "b" -> 3)))))
      val e = intercept[IllegalArgumentException](AvroReader.read(spark, dir.toString))
      assert(e.getMessage.contains("no single file schema"))
      // NESTED fork (r15 review): identical top-level names, divergent
      // inner records — must also refuse, not silently pick a winner
      // whose resolution drops the other generation's nested field
      val dirN = java.nio.file.Files.createTempDirectory("graft-avro-nested")
      try {
        def nested(inner: String): ASchema = new ASchema.Parser().parse(
          s"""{"type":"record","name":"N","fields":[{"name":"id","type":"long"},
             |{"name":"inner","type":{"type":"record","name":"I","fields":[$inner]}}]}"""
            .stripMargin)
        val na = nested("""{"name":"x","type":"int"},{"name":"p","type":"int"}""")
        val nb = nested("""{"name":"x","type":"int"},{"name":"q","type":"int"}""")
        def innerRec(s: ASchema, vals: Map[String, Any]) =
          rec(s.getField("inner").schema(), vals)
        java.nio.file.Files.write(dirN.resolve("a.avro"),
          writeContainer(na, CodecFactory.nullCodec(),
            Seq(rec(na, Map("id" -> 1L, "inner" -> innerRec(na, Map("x" -> 1, "p" -> 2)))))))
        java.nio.file.Files.write(dirN.resolve("b.avro"),
          writeContainer(nb, CodecFactory.nullCodec(),
            Seq(rec(nb, Map("id" -> 2L, "inner" -> innerRec(nb, Map("x" -> 3, "q" -> 4)))))))
        val eN = intercept[IllegalArgumentException](AvroReader.read(spark, dirN.toString))
        assert(eN.getMessage.contains("no single file schema"))
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dirN).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      // a top-level `path` field would produce duplicate columns
      val fp = new ASchema.Parser().parse(
        """{"type":"record","name":"P","fields":[{"name":"path","type":"string"}]}""")
      val dir2 = java.nio.file.Files.createTempDirectory("graft-avro-path")
      try {
        java.nio.file.Files.write(dir2.resolve("p.avro"),
          writeContainer(fp, CodecFactory.nullCodec(), Seq(rec(fp, Map("path" -> "/x")))))
        val e2 = intercept[IllegalArgumentException](AvroReader.read(spark, dir2.toString))
        assert(e2.getMessage.contains("collides"))
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir2).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("write side: DataFrame → sharded containers → read back, round-trip exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(20).select(
      col("id"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("t"), col("id"))).as("title"),
      (col("id") * 2).cast("int").as("n"),
      (col("id") / 4.0).as("score"),
      array(col("id"), col("id") + 1).as("pair"),
      map(lit("k"), col("id").cast("int")).as("meta"),
      struct(col("id").cast("int").as("a"), concat(lit("s"), col("id")).as("b")).as("inner"),
      col("id").cast("string").cast("binary").as("raw"))
      .repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-write").toString
    try {
      val nFiles = AvroReader.write(df, dir)
      assert(nFiles == 3)
      // commit protocol: only final shard names remain
      val names = new java.io.File(dir).list().toSeq.sorted
      assert(names == Seq("part-00000.avro", "part-00001.avro", "part-00002.avro"),
        s"unexpected listing: $names")
      val back = AvroReader.read(spark, dir)
      assert(back.count() == 20)
      assert(back.schema.fieldNames.toSeq ==
        Seq("path", "id", "title", "n", "score", "pair", "meta", "inner", "raw"))
      // exact reconcile on every non-binary column (binary != in SQL
      // compares refs through Rows — check it separately)
      val a = df.selectExpr("id", "title", "n", "score", "pair", "meta.k AS mk",
        "inner.a AS ia", "inner.b AS ib", "hex(raw) AS rawhex")
      val b = back.selectExpr("id", "title", "n", "score", "pair", "meta['k'] AS mk",
        "inner.a AS ia", "inner.b AS ib", "hex(raw) AS rawhex")
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
      // nullable union round-tripped: the null titles survive as nulls
      assert(back.filter(col("title").isNull).count() == 7)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("write side: loss-prone Catalyst types are refused with a clear error") {
    import org.apache.spark.sql.functions._
    // a non-string-keyed map has no Avro spelling (Avro map keys are
    // strings by definition); decimals/timestamps/dates now map to
    // logical types and are covered by the round-trip test
    val df = spark.range(3).select(expr("map(CAST(id AS INT), 'v')").as("m"))
    val e = intercept[IllegalArgumentException] {
      AvroReader.write(df, java.nio.file.Files.createTempDirectory("graft-avro-ref").toString)
    }
    assert(e.getMessage.contains("no loss-free Avro spelling"))
  }

  test("write side: non-Avro-spellable field names are refused, never rewritten") {
    import org.apache.spark.sql.functions._
    // ADVICE r15: the old sanitize() silently renamed 'a-b' → 'a_b'
    // (round-trip renames columns) and collided 'a-b' with 'a_b' into an
    // opaque Avro duplicate-field error — both now one loud refusal
    val df = spark.range(2).select(col("id").as("a-b"), (col("id") * 2).as("a_b"))
    val e = intercept[IllegalArgumentException] {
      AvroReader.write(df, java.nio.file.Files.createTempDirectory("graft-avro-nm").toString)
    }
    assert(e.getMessage.contains("'a-b'") && e.getMessage.contains("rename"))
    // a legal name passes through UNCHANGED (underscore-led included)
    val ok = AvroReader.avroSchema(
      StructType(Seq(StructField("_x9", LongType, nullable = false))))
    assert(ok.getFields.asScala.map(_.name()) == Seq("_x9"))
    // record names additionally accept dotted Avro FULLNAMES (they are
    // names, not columns — the field rule and its withColumnRenamed
    // advice would misdescribe them)
    val full = AvroReader.avroSchema(
      StructType(Seq(StructField("v", LongType, nullable = false))),
      recordName = "com.example.Row")
    assert(full.getFullName.endsWith("com.example.Row"))
    val bad = intercept[IllegalArgumentException] {
      AvroReader.avroSchema(
        StructType(Seq(StructField("v", LongType, nullable = false))),
        recordName = "com..Row")
    }
    assert(bad.getMessage.contains("record name"))
  }

  test("survey cap: per-file schema churn is refused, not collected") {
    // 65 files, each a distinct single-field schema — a survey that
    // collected them all would be file-count-sized at fleet scale
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-churn")
    try {
      (0 to AvroReader.MaxSurveySchemas).foreach { i =>
        val s = new ASchema.Parser().parse(
          s"""{"type":"record","name":"R","fields":[{"name":"f$i","type":"long"}]}""")
        val bytes = writeContainer(s, CodecFactory.nullCodec(),
          Seq(rec(s, Map(s"f$i" -> 1L))))
        java.nio.file.Files.write(dir.resolve(f"churn-$i%03d.avro"), bytes)
      }
      val e = intercept[IllegalArgumentException] {
        AvroReader.read(spark, dir.toString).count()
      }
      assert(e.getMessage.contains("schema churn"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("logical types round-trip: timestamp-micros, date, decimal(p,s)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10).select(
      col("id"),
      expr("timestamp_micros(id * 1000000 + 123456)").as("ts"),
      expr("date_add(DATE'2026-01-01', CAST(id AS INT))").as("d"),
      expr("CAST(id AS DECIMAL(10,2)) * 1.25").cast("decimal(12,2)").as("amount"),
      when(col("id") % 2 === 0, expr("timestamp_micros(id)"))
        .otherwise(lit(null).cast("timestamp")).as("maybe_ts"))
      .repartition(2)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-logical").toString
    try {
      AvroReader.write(df, dir)
      val back = AvroReader.read(spark, dir)
      assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      assert(back.schema("d").dataType == org.apache.spark.sql.types.DateType)
      assert(back.schema("amount").dataType ==
        org.apache.spark.sql.types.DecimalType(12, 2))
      val a = df.selectExpr("id", "ts", "d", "amount", "maybe_ts")
      val b = back.selectExpr("id", "ts", "d", "amount", "maybe_ts")
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
      // and the emitted schema is the ANNOTATED spelling other engines
      // read (not raw longs): check the container header directly
      val one = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val sch = AvroReader.schemaOf(java.nio.file.Files.readAllBytes(one.toPath))
      assert(sch.toString.contains("timestamp-micros") &&
        sch.toString.contains("\"date\"") && sch.toString.contains("decimal"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("recursive named schemas terminate the survey's field-path walk") {
    // legal self-referential Avro (linked list) — the survey must not
    // overflow (r15 review); one level of the cycle's fields suffices
    // for containment because recursion is by NAME
    val rec = new ASchema.Parser().parse(
      """{"type":"record","name":"Node","fields":[
        |{"name":"v","type":"long"},
        |{"name":"next","type":["null","Node"],"default":null}]}""".stripMargin)
    val paths = AvroReader.fieldPaths(rec)
    assert(paths == Set("v", "next"))
  }

  test("seeded mutation fuzz: corrupted containers never throw or hang") {
    val v1 = new ASchema.Parser().parse(v1Json)
    val base = writeContainer(v1, CodecFactory.deflateCodec(1), v1Records(v1))
    val st = AvroReader.sparkType(v1).asInstanceOf[StructType]
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val m = base.clone()
      (1 to 1 + rnd.nextInt(8)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      val cut = m.take(rnd.nextInt(m.length + 1))
      // contract: returns or raises ONLY the documented loud-resolution
      // error (a flip inside a field name can yield a header that still
      // parses but no longer resolves — that path is deliberately loud,
      // r15); anything else (NPE, AIOOBE, hang) is a bug
      try AvroReader.parseRows(cut, v1Json, st)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("fail-soft: a truncated container keeps the decoded prefix, garbage keeps nothing") {
    val v1 = new ASchema.Parser().parse(v1Json)
    val whole = writeContainer(v1, CodecFactory.nullCodec(), v1Records(v1))
    val st = AvroReader.sparkType(v1).asInstanceOf[StructType]
    assert(AvroReader.parseRows(whole, v1Json, st).size == 2)
    val cut = whole.take(whole.length - 10)
    val partial = AvroReader.parseRows(cut, v1Json, st)
    assert(partial.size < 2) // tail lost, no throw
    assert(AvroReader.parseRows("junk".getBytes, v1Json, st).isEmpty)
  }
}
