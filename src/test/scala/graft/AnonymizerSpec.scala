package graft

import graft.refine.Anonymizer
import org.apache.spark.sql.functions._

/** Mirrors the reference's pinned cases (tests/resources/test_anonymizer.py). */
class AnonymizerSpec extends SparkSpec {

  private def anon(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Anonymizer.anonymize(col("t"))).collect()(0).getString(0)
  }

  test("email redaction") {
    val out = anon("Contact: alice@example.com for info.")
    assert(out.contains("xxx@xxx.xx"))
    assert(!out.contains("alice@example.com"))
  }

  test("UK mobile and international formats redacted") {
    val out = anon("Call me on 07123 456 789 or at +44 7123 456789")
    assert(!out.contains("07123"), out)
    assert(!out.contains("+44 7123"), out)
    assert(out.contains("xx-xxxx-xxxx"))
  }

  test("empty string unchanged") { assert(anon("") == "") }

  test("identity on clean text") {
    val s = "This text has no contacts."
    assert(anon(s) == s)
  }

  test("dates and plain numbers are NOT redacted") {
    val s = "Published 2025-01-27 at 10:26, version 1.2.3, ref 42."
    assert(anon(s) == s)
  }

  test("size guard: >= 1MB text passes through") {
    val big = "email me a@b.co " * 70000 // > 1e6 chars
    assert(anon(big) == big)
  }
}
