package graft

import org.apache.spark.sql.SparkSession

/** Local iteration helper: min-of-2 warm timing for the named queries at
  * SPARK_GRAFT_SF_DIR (same measurement discipline as [[Bench]], without
  * the full-suite cost). `sbt "runMain graft.BenchOne g01_triangles"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    def timeOnce(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      run(name)
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      run(name) // warm-up
      val sec = math.min(timeOnce(name), timeOnce(name))
      println(f"BENCHONE $name%-28s $sec%.2f s")
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
