package graft

import graft.sources.FileCorpus
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FileCorpusSpec extends SparkSpec {

  private lazy val corpusDir = {
    val dir = Files.createTempDirectory("graftcorpus")
    val sub = Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.csv"), "x,y\n1,2\n")
    Files.writeString(dir.resolve("a_metadata.json"), """{"title": "a"}""")
    Files.writeString(dir.resolve("b.json"), """{"standalone": true}""")
    Files.writeString(dir.resolve("c.PDF"), "pdfish")
    Files.writeString(sub.resolve("d.csv"), "p,q\n3,4\n")
    Files.writeString(dir.resolve(".DS_Store"), "junk")
    dir.toString
  }

  test("scan: recursive, .DS_Store skipped") {
    val files = FileCorpus.scan(spark, corpusDir)
    val names = files.collect().map(_.getAs[String]("path").split("/").last).toSet
    assert(names == Set("a.csv", "a_metadata.json", "b.json", "c.PDF", "d.csv"))
  }

  test("extension histogram: lower-cased, metadata excluded, count-desc") {
    val hist = FileCorpus.extensionHistogram(FileCorpus.listing(spark, corpusDir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hist == Seq(("csv", 2L), ("json", 1L), ("pdf", 1L)))
  }

  test("metadata association joins sidecar to sibling data file") {
    val out = FileCorpus.associateMetadata(
      FileCorpus.listing(spark, corpusDir), Seq("csv", "json", "pdf"))
      .collect().map(r => (r.getString(0).split("/").last, r.getString(1).split("/").last))
    assert(out.toSeq == Seq(("a_metadata.json", "a.csv")))
  }

  test("standalone jsons: metadata sidecars and metadata-shadowed stems excluded") {
    val out = FileCorpus.standaloneJsons(FileCorpus.listing(spark, corpusDir))
      .collect().map(_.getString(0).split("/").last).toSeq
    assert(out == Seq("b.json"))
  }
}
