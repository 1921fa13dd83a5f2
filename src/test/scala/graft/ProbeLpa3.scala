package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the lpa3 artifact build (r19 — the g06 leg of the r18
  * verdict's static-unroll item): prints the build's PHYSICAL PLAN as it
  * actually executes (inside Materialize.checkpointRetainingPartitioning's
  * AQE-off window — the in-code "AQE picks broadcast at bench scale"
  * comment predates the r12 memoization and may be stale), then times the
  * build cold with per-tag self-times.
  * Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ProbeLpa3"
  */
object ProbeLpa3 {
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
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    // JIT/codegen warm-up on the small SF (build included — different
    // (app, sfDir) key, so the sf0.1 build below still runs cold)
    Seq("g06_label_prop", "g10_modularity").foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.format("noop").mode("overwrite").save()
    }
    // The plan the build EXECUTES: checkpointRetainingPartitioning takes
    // the eager checkpoint with AQE disabled, so explain under the same
    // conf. (This costs a dbl_v build for the explain's analysis pass —
    // acceptable in a probe.)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    try {
      println("=== lpa3 build plan (as executed: AQE off) ===")
      graft.queries.MiningQueries.lpaAssignBuildForProbe(spark, d)
        .explain("formatted")
    } finally spark.conf.set(aqeKey, prev)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    graft.core.ArtifactRegistry.resetTimings()
    System.gc()
    time("g06 cold (lpa3)")(run("g06_label_prop"))
    time("g10 warm")(run("g10_modularity"))
    time("g06 warm")(run("g06_label_prop"))
    println("PROBE builds " + graft.core.ArtifactRegistry.buildSeconds)
    spark.stop()
  }
}
