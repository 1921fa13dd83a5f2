package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition for m09_phash_pairs (r18 — the one perf-weak entry
  * left without quiet evidence or a floors decomposition): times the codec
  * kernel (PNG synth+encode+decode+pool+dHash UDFs over every doc) apart
  * from the relational tail (posexplode + segment-keyed self-join +
  * distinct + sort), so the floors entry can attribute the cost honestly.
  * The oracle replays only the SYNTHESIS arithmetic (never decodes a PNG),
  * so the kernel seconds here are work the engine does by design and the
  * oracle skips by design. Test-scope main, not a spec — run with
  *   sbt "Test/runMain graft.ProbeM09"
  */
object ProbeM09 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.functions.ImageCodec
    import graft.operators.Multimodal
    val mk = udf { (docId: Long) =>
      val w = 18; val h = 16
      val base = docId / 8; val pert = docId % 8
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        var r = (x * x + 3 * y * base + 7 * base * base + 11 * y) % 256
        if ((x + 18 * y) % 29 == 0) r = (r + pert) % 256
        val g = (y * y + 5 * x * base + 13 * base) % 256
        val b = (x * y + 17 * base + 19 * x) % 256
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
      }
      ImageCodec.pngEncodeRgb(w, h, rgb)
    }
    val dh = udf { (payload: Array[Byte]) =>
      Multimodal.dHashSegments(payload).orNull
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val docs = graft.core.Tables.documents(spark, d)
      time("scan_only_noop")(sink(docs.select(col("doc_id"))))
      time("kernel_png_encode")(sink(
        docs.select(col("doc_id"), mk(col("doc_id")).as("png"))))
      val hashed = docs
        .select(col("doc_id"), dh(mk(col("doc_id"))).as("sv"))
        .filter(col("sv").isNotNull)
      time("kernel_full_noop")(sink(hashed))
      val ck = time("kernel+lazy_ckpt")({
        val c = hashed.localCheckpoint(false); sink(c); c
      })
      val banded = ck.select(col("doc_id"), col("sv"),
        posexplode(col("sv")).as(Seq("s", "seg")))
      time("tail_join_distinct")(sink(
        banded.as("a").join(banded.as("b"),
            col("a.s") === col("b.s") && col("a.seg") === col("b.seg") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            expr("""CAST(bit_count(a.sv[0] ^ b.sv[0]) + bit_count(a.sv[1] ^ b.sv[1])
                   |   + bit_count(a.sv[2] ^ b.sv[2]) + bit_count(a.sv[3] ^ b.sv[3])
                   | AS BIGINT)""".stripMargin).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy(col("id_a"), col("id_b"))))
    }
    spark.stop()
  }
}
