package graft

import graft.convert.{CsvConverter, JsonConverter, SpreadsheetConverter}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

class ConvertSpec extends SparkSpec {

  // ------------------------------------------------------------------ JSON

  test("json: list of records") {
    val out = JsonConverter.toRecords("""[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]""")
    assert(out.get.map(_("a")) == Seq("1", "2"))
  }

  test("json: data/results/rows/items wrappers unwrap") {
    for (k <- Seq("data", "results", "rows", "items")) {
      val out = JsonConverter.toRecords(s"""{"$k": [{"v": 1}], "meta": "ignored"}""")
      assert(out.get == Seq(Map("v" -> "1")), k)
    }
  }

  test("json: columnar dict of equal-length lists transposes") {
    val out = JsonConverter.toRecords("""{"a": [1, 2], "b": ["x", "y"]}""")
    assert(out.get == Seq(Map("a" -> "1", "b" -> "x"), Map("a" -> "2", "b" -> "y")))
  }

  test("json: unequal-length columnar dict falls back to single record") {
    val out = JsonConverter.toRecords("""{"a": [1, 2], "b": ["x"]}""")
    assert(out.get.size == 1)
  }

  test("json: single object is one record; error payload is skipped") {
    assert(JsonConverter.toRecords("""{"a": 1}""").get.size == 1)
    assert(JsonConverter.toRecords("""{"error": {"code": 42}}""").isEmpty)
    assert(JsonConverter.toRecords("""not json""").isEmpty)
  }

  test("json: nested objects flatten dot-joined; arrays serialize to JSON strings") {
    val out = JsonConverter.toRecords(
      """[{"spatialReference": {"wkid": 27700}, "tags": ["a", "b"]}]""").get
    assert(out.head("spatialReference.wkid") == "27700")
    assert(out.head("tags") == """["a","b"]""")
  }

  test("json: convert end-to-end infers types (wkid becomes long)") {
    val df = JsonConverter.convert(spark,
      Seq("""[{"spatialReference": {"wkid": 27700}, "name": "os grid"}]"""))
    assert(df.schema("spatialReference.wkid").dataType == LongType)
    assert(df.schema("name").dataType == StringType)
    assert(df.collect()(0).getLong(df.schema.fieldIndex("spatialReference.wkid")) == 27700L)
  }

  // ------------------------------------------------------------------- CSV

  test("csv: charset sniff — BOMs and UTF-8 validity") {
    assert(CsvConverter.sniffCharset(Array(0xEF, 0xBB, 0xBF, 'a').map(_.toByte)) == "UTF-8")
    assert(CsvConverter.sniffCharset("plain ascii".getBytes) == "UTF-8")
    assert(CsvConverter.sniffCharset(Array(0xFF, 0xFE, 0x41, 0x00).map(_.toByte)) == "UTF-16LE")
    // invalid UTF-8 continuation -> latin-1 fallback
    assert(CsvConverter.sniffCharset(Array(0xE9, 0x20).map(_.toByte)) == "ISO-8859-1")
  }

  test("csv: end-to-end read + inference on a temp file") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f,
      "name,count,price,when\nalpha,\"1,000\",£2.50,1 Mar 2023\nbeta,250,£3.00,2023-04-05\n")
    val df = CsvConverter.convert(spark, f.toString)
    assert(df.schema("count").dataType == LongType)
    assert(df.schema("price").dataType == DoubleType)
    assert(df.schema("when").dataType == StringType)
    val rows = df.orderBy("name").collect()
    assert(rows(0).getAs[Long]("count") == 1000L)
    assert(rows(0).getAs[Double]("price") == 2.50)
    assert(rows(0).getAs[String]("when") == "2023-03-01T00:00:00+00:00")
  }

  // ------------------------------------------------------------ spreadsheet

  test("spreadsheet: safe sheet names") {
    assert(SpreadsheetConverter.safeSheetName("My Sheet (2024)!") == "my_sheet_2024")
    assert(SpreadsheetConverter.safeSheetName("__x__") == "x")
    // all-forbidden name falls back to a deterministic uuid
    val u = SpreadsheetConverter.safeSheetName("///")
    assert(u == SpreadsheetConverter.safeSheetName("///"))
    assert(u.length == 36)
  }

  test("spreadsheet: colliding sanitized headers dedupe pandas-style") {
    assert(SpreadsheetConverter.dedupeHeaders(Seq("Col A", "Col_A", "col  a"))
      == Seq("col_a", "col_a.1", "col_a.2"))
    // dots are legal name chars — "Col.A" is distinct, not a collision
    assert(SpreadsheetConverter.dedupeHeaders(Seq("Col A", "Col.A"))
      == Seq("col_a", "col.a"))
    assert(SpreadsheetConverter.dedupeHeaders(Seq("x", "y")) == Seq("x", "y"))
  }

  test("spreadsheet: stub decode produces per-sheet typed frames") {
    val out = SpreadsheetConverter.convert(spark, Array[Byte](10, 20, 30))
    assert(out.size == 1)
    val (name, df) = out.head
    assert(name == "sheet_3")
    assert(df.columns.toSeq == Seq("col_a", "col_b"))
    assert(df.count() == 3)
  }
}
