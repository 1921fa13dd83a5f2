package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B for the triangle-census build cost (the largest artifact
  * ledger item): times g01 and g02 cold (first run pays the shared
  * build) and warm in one session. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ProbeTri"
  */
object ProbeTri {
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
    SparkEntry.queries("g01_triangles")(spark, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("g02_clustering_coeff")(spark, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    graft.core.ArtifactRegistry.resetTimings()
    time("g01 cold+build")(run("g01_triangles"))
    time("g02 warm")(run("g02_clustering_coeff"))
    time("g01 warm")(run("g01_triangles"))
    println("PROBE builds " + graft.core.ArtifactRegistry.buildSeconds)
    spark.stop()
  }
}
