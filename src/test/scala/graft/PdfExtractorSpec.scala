package graft

import graft.extract.PdfExtractor

class PdfExtractorSpec extends SparkSpec {

  test("long extracted text skips OCR") {
    val payload = ("A" * 300).getBytes("UTF-8")
    val out = PdfExtractor.extractWithOcrFallback(payload)
    assert(out == "A" * 300)
    assert(!out.startsWith("[ocr:"))
  }

  test("short extracted text triggers OCR fallback when OCR yields more") {
    // stub "extraction" yields 3 printable chars < threshold; ocr stub yields more
    val payload = Array[Byte]('a', 'b', 'c', 0, 1, 2)
    val out = PdfExtractor.extractWithOcrFallback(payload)
    assert(out.startsWith("[ocr:"))
  }

  test("empty payload gives empty text") {
    assert(PdfExtractor.extractWithOcrFallback(Array.empty) == "")
    assert(PdfExtractor.extractWithOcrFallback(null) == "")
  }

  test("withExtractedText is a narrow transformation over binary content") {
    import spark.implicits._
    val df = Seq((1L, ("Z" * 250).getBytes("UTF-8"))).toDF("id", "content")
    val out = PdfExtractor.withExtractedText(df, "content")
    assert(out.columns.toSeq == Seq("id", "content", "text"))
    assert(out.collect()(0).getAs[String]("text") == "Z" * 250)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pdf decode should not shuffle:\n$plan")
  }
}
