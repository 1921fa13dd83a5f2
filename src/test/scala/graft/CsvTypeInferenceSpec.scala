package graft

import graft.refine.CsvTypeInference
import graft.refine.CsvTypeInference._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Mirrors the reference CSV inference semantics
  * (resources/convertors/csv_to_parquet.py:52-202, pinned by
  * tests/resources/test_csv_to_parquet.py). */
class CsvTypeInferenceSpec extends SparkSpec {
  import spark.implicits._

  test("quoted thousands-separated numbers parse to long") {
    val df = Seq(("166,012,276", "a"), ("4,000", "b"), ("7", "c")).toDF("n", "s")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("n").dataType == LongType)
    assert(out.select("n").collect().map(_.getLong(0)).toSeq == Seq(166012276L, 4000L, 7L))
    assert(out.schema("s").dataType == StringType)
  }

  test("currency and percent clean to numeric; decimals give double") {
    val df = Seq("£4,000.50", "€12.5", "99%").toDF("v")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("v").dataType == DoubleType)
    assert(out.select("v").collect().map(_.getDouble(0)).toSeq == Seq(4000.50, 12.5, 99.0))
  }

  test("null tokens preserved as null in typed column") {
    val df = Seq("1", "2", "NA", "n/a", "3", "-", "4", "5", "6", "7").toDF("v")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("v").dataType == LongType)
    val vals = out.select("v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals.count(_.isEmpty) == 3)
  }

  test("90% numeric threshold: 8/10 parseable stays string, 9/10 becomes numeric") {
    val eight = Seq("1", "2", "3", "4", "5", "6", "7", "8", "x", "y").toDF("v")
    assert(CsvTypeInference.convert(eight).schema("v").dataType == StringType)
    val nine = Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "y").toDF("v")
    assert(CsvTypeInference.convert(nine).schema("v").dataType == LongType)
  }

  test("dates normalize to ISO strings (never native timestamps)") {
    val df = Seq("1 Mar 2023", "2023-04-01", "02/05/2023", "junk").toDF("d")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("d").dataType == StringType)
    val vals = out.select("d").collect().map(_.getString(0)).toSeq
    assert(vals(0) == "2023-03-01T00:00:00+00:00")
    assert(vals(1) == "2023-04-01T00:00:00+00:00")
    // pandas to_datetime resolves ambiguous numeric dates month-first
    assert(vals(2) == "2023-02-05T00:00:00+00:00")
    assert(vals(3) == null) // unparseable in a date column -> null
  }

  test("month-first pandas semantics with day-first fallback for impossible months") {
    import graft.functions.TimeFunctions.parseDateLenientToIso
    assert(parseDateLenientToIso("01/02/2020") == Some("2020-01-02T00:00:00+00:00"))
    assert(parseDateLenientToIso("25/12/2020") == Some("2020-12-25T00:00:00+00:00"))
    assert(parseDateLenientToIso("Jan 27, 2025") == Some("2025-01-27T00:00:00+00:00"))
  }

  test("50% date threshold: below half parseable stays raw string") {
    val df = Seq("1 Mar 2023", "junk1", "junk2", "junk3").toDF("d")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("d").dataType == StringType)
    assert(out.select("d").collect().map(_.getString(0)).toSeq.contains("junk1"))
  }

  test("time-only guard: majority time-only column is NOT date-ified") {
    val df = Seq("10:26:06", "11:00:00", "12:30:45", "2023-01-01").toDF("t")
    val out = CsvTypeInference.convert(df)
    val vals = out.select("t").collect().map(_.getString(0)).toSeq
    assert(vals.contains("10:26:06")) // untouched
  }

  test("mixed int/double column becomes double") {
    val df = Seq("1", "2.5", "3", "4", "5", "6", "7", "8", "9", "10").toDF("v")
    val out = CsvTypeInference.convert(df)
    assert(out.schema("v").dataType == DoubleType)
  }

  test("all-null column stays string") {
    val df = Seq("NA", "", "-").toDF("v")
    assert(CsvTypeInference.convert(df).schema("v").dataType == StringType)
  }

  test("reference numeric-handler unit vectors (test_csv_to_parquet.py:131-154)") {
    // the exact three Series from the reference's TestNumericHandler
    val ints = Seq("1", "2", "", "NA", "3").toDF("v") // → nullable Int64
    val intOut = CsvTypeInference.convert(ints)
    assert(intOut.schema("v").dataType == LongType)
    val iv = intOut.select("v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(iv(0) == Some(1L) && iv(2).isEmpty && iv(3).isEmpty && iv(4) == Some(3L))

    val floats = Seq("1.5", "2", "4,000", "NA", "3.25").toDF("v") // → Float64
    val fOut = CsvTypeInference.convert(floats)
    assert(fOut.schema("v").dataType == DoubleType)
    val fv = fOut.select("v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(fv(0) == Some(1.5) && fv(2) == Some(4000.0) && fv(4) == Some(3.25))

    val nonNum = Seq("a", "b", "NA", "").toDF("v") // → None (stays string)
    assert(CsvTypeInference.convert(nonNum).schema("v").dataType == StringType)
  }
}
