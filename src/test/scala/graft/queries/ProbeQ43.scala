package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the q43 bucketed-table build (artifact ledger item
  * q43_buckets): times the cold build + warm query in one session. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ProbeQ43"
  */
object ProbeQ43 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.scheduler.mode", "FAIR")
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
    // JIT/codegen warm-up on the small SF (different dir => different
    // artifact key, so the sf0.1 build below still runs cold)
    SparkEntry.queries("q43_bucketed_join")(spark, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    graft.core.ArtifactRegistry.resetTimings()
    time("q43 cold+build")(run("q43_bucketed_join"))
    time("q43 warm")(run("q43_bucketed_join"))
    println("PROBE builds " + graft.core.ArtifactRegistry.buildSeconds)
    spark.stop()
  }
}
