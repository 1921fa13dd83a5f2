package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the d05a artifact build (r15 — largest ledger item at
  * 5.5 s in the r14 driver window): times d05 cold (first run pays jp08 +
  * d05a) and the downstream consumers warm, with per-tag build self-times.
  * Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ProbeD05a"
  */
object ProbeD05a {
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
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    // JIT/codegen warm-up on the small SF so the timed build measures
    // the engine, not first-compile
    Seq("d05_dup_clusters", "d03_ngram_jaccard", "p03_dedup_impact").foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.format("noop").mode("overwrite").save()
    }
    graft.core.ArtifactRegistry.resetTimings()
    System.gc()
    time("d03 cold (jp08)")(run("d03_ngram_jaccard"))
    System.gc()
    time("d05 cold (d05a)")(run("d05_dup_clusters"))
    time("p03 warm")(run("p03_dedup_impact"))
    time("d05 warm")(run("d05_dup_clusters"))
    println("PROBE builds " + graft.core.ArtifactRegistry.buildSeconds)
    spark.stop()
  }
}
