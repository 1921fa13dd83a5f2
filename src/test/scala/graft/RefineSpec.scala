package graft

import graft.core.NdlRecord
import graft.refine.FailSoft
import org.apache.spark.sql.functions._

class RefineSpec extends SparkSpec {

  test("NdlRecord.fromRaw builds the canonical schema with reference semantics") {
    import spark.implicits._
    val raw = Seq(("doc one text here", "Doc One", "gov.uk", "", "a/b.json"))
      .toDF("text", "title", "src", "lang", "path")
    val df = NdlRecord.fromRaw(raw, "text", "title", "src", "lang", "path",
      collectionTime = "2026-01-01T00:00:00+00:00")
    assert(df.columns.toSeq == Seq("identifier", "title", "description", "source",
      "date", "collection_time", "open_type", "license", "tags", "language",
      "format", "text", "word_count", "token_count", "data_file", "extra_metadata"))
    val r = df.collect()(0)
    assert(r.getAs[String]("identifier").length == 64) // content hash, not uuid
    assert(r.getAs[String]("license") == "OGL-UK-3.0")  // missing -> OGL default
    assert(r.getAs[String]("language") == "en")          // empty lang -> en
    assert(r.getAs[String]("open_type") == "Open Government")
    assert(r.getAs[Int]("word_count") == 4)
    // typed dataset roundtrip
    val ds = NdlRecord.dataset(spark, df)
    assert(ds.head().title == "Doc One")
  }

  test("identifier is deterministic (same text, same id)") {
    import spark.implicits._
    val raw = Seq(("same", "t1", "s", "en", "f1"), ("same", "t2", "s", "en", "f2"))
      .toDF("text", "title", "src", "lang", "path")
    val ids = NdlRecord.fromRaw(raw, "text", "title", "src", "lang", "path", "t")
      .select("identifier").collect().map(_.getString(0))
    assert(ids(0) == ids(1))
  }

  test("FailSoft: bad rows carry an error, good rows a result; stage survives") {
    import spark.implicits._
    val df = Seq("5", "7", "boom", "9").toDF("v")
    val out = FailSoft.withGuarded(df, col("v"), "doubled",
      s => (s.toInt * 2).toString)
    val rows = out.collect()
    assert(rows.count(_.getAs[String]("doubled_error") != null) == 1)
    assert(rows.count(_.getAs[String]("doubled") != null) == 3)
    val status = FailSoft.statusRollup(out, "doubled_error")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(status.head == ("ok", 3L))
    assert(status(1)._1.startsWith("NumberFormatException"))
  }
}
