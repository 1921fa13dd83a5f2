package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for g09's fused (simultaneous-update)
  * form: times e-build, the doubled checkpoint, each round, and the
  * top-k tail separately. Test-scope main, not a spec — run with
  *   sbt "Test/runMain graft.ProbeG09b"
  */
object ProbeG09b {
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
    import graft.core.Tables.tableRaw

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val e = tableRaw(spark, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(tableRaw(spark, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      time("e_distinct_noop")(sink(e))
      val ed = time("ed_partitioned_ckpt")(
        graft.core.Materialize.partitionedCheckpoint(
          e.select(inline(array(
            struct(lit("h").as("sside"), col("c").as("src"),
              lit("a").as("dside"), col("p").as("dst")),
            struct(lit("a").as("sside"), col("p").as("src"),
              lit("h").as("dside"), col("c").as("dst"))))),
          "sside", "src"))
      var sc = ed.groupBy(col("dside"), col("dst"))
        .agg(count(lit(1)).as("s"))
        .select(col("dside").as("sside"), col("dst").as("src"), col("s"))
      time("round1_degree_noop")(sink(sc))
      for (r <- 2 to 3) {
        sc = ed.join(sc, Seq("sside", "src"))
          .groupBy(col("dside"), col("dst"))
          .agg(sum(col("s")).as("s"))
          .select(col("dside").as("sside"), col("dst").as("src"), col("s"))
        time(s"round$r cumulative")(sink(sc))
      }
      val fin = time("fin_lazy_ckpt+run")({ val f = sc.localCheckpoint(false); sink(f); f })
      def top(side: String, kind: String): DataFrame =
        fin.filter(col("sside") === side)
          .select(lit(kind).as("kind"), col("src").as("id"), col("s"))
          .orderBy(col("s").desc, col("id")).limit(20)
      time("tail_topk_window")(sink(
        top("h", "hub").unionByName(top("a", "authority"))
          .withColumn("m", max(col("s")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))))
          .withColumn("score", expr("s * 1000000 div m"))))
    }
    spark.stop()
  }
}
