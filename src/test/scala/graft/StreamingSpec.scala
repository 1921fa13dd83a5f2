package graft

import graft.streaming.FileStreamRefine
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("AvailableNow file stream: drains backlog, resumes incrementally") {
    import spark.implicits._
    val base = Files.createTempDirectory("graftstream")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val mk = (id: Long, len: Int) => (id, "w " * len)
    Seq(mk(1, 150), mk(2, 10)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema

    // run 1: only doc 1 passes the length gate
    FileStreamRefine.run(spark, landing, schema, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 1)

    // new file lands; run 2 processes ONLY the new file (checkpoint ledger)
    Seq(mk(3, 200)).toDF("doc_id", "text").write.mode("append").parquet(landing)
    FileStreamRefine.run(spark, landing, schema, out, ckpt).awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    val ids = rows.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    // enrichment columns present
    assert(rows.columns.contains("identifier") && rows.columns.contains("token_count"))
  }
}
