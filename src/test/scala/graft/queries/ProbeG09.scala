package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Scratch stage decomposition for g09 HITS (round 12). TEST scope only.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.queries.ProbeG09". */
object ProbeG09 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
      else System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(mk: () => Unit): Unit = {
      mk()
      val times = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); mk(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-32s min2=${times.min}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val s = spark; val d = sfDir
    def eBase() = tableRaw(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(tableRaw(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()

    t("e_build_noop")(() => noop(eBase()))
    t("e_build_ckpt")(() => { eBase().localCheckpoint(true); () })

    // full current shape
    t("full_current")(() => noop(ProfileQueries.g09Hits(s, d)))

    // rounds-only on a prebuilt checkpoint
    val e = eBase().localCheckpoint(true)
    t("rounds_on_ckpt")(() => {
      val a1 = e.groupBy(col("p")).agg(count(lit(1)).as("s"))
      val h1 = e.join(a1, Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      val a2 = e.join(h1, Seq("c")).groupBy(col("p")).agg(sum(col("s")).as("s"))
      val h2 = e.join(a2, Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      val a3 = e.join(h2, Seq("c")).groupBy(col("p")).agg(sum(col("s")).as("s"))
        .localCheckpoint(false)
      val h3 = e.join(a3, Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      def top(df: DataFrame, kind: String, idCol: String): DataFrame =
        df.select(lit(kind).as("kind"), col(idCol).as("id"), col("s"))
          .orderBy(col("s").desc, col("id")).limit(20)
      noop(top(h3, "hub", "c").unionByName(top(a3, "authority", "p"))
        .withColumn("m", max(col("s")).over(Window.partitionBy(col("kind"))))
        .withColumn("score", expr("s * 1000000 div m"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("kind")).orderBy(col("s").desc, col("id"))).cast("long"))
        .select(col("kind"), col("rank"), col("id"), col("score"))
        .orderBy(col("kind"), col("rank")))
    })

    // variant: broadcast the per-round s-frames (customer/part-sized,
    // ~20-30k rows of 16 bytes) so each half-round is a broadcast join +
    // agg — no e reshuffle at all
    t("rounds_bcast_s")(() => {
      val a1 = e.groupBy(col("p")).agg(count(lit(1)).as("s"))
      val h1 = e.join(broadcast(a1), Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      val a2 = e.join(broadcast(h1), Seq("c")).groupBy(col("p")).agg(sum(col("s")).as("s"))
      val h2 = e.join(broadcast(a2), Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      val a3 = e.join(broadcast(h2), Seq("c")).groupBy(col("p")).agg(sum(col("s")).as("s"))
        .localCheckpoint(false)
      val h3 = e.join(broadcast(a3), Seq("p")).groupBy(col("c")).agg(sum(col("s")).as("s"))
      def top(df: DataFrame, kind: String, idCol: String): DataFrame =
        df.select(lit(kind).as("kind"), col(idCol).as("id"), col("s"))
          .orderBy(col("s").desc, col("id")).limit(20)
      noop(top(h3, "hub", "c").unionByName(top(a3, "authority", "p"))
        .withColumn("m", max(col("s")).over(Window.partitionBy(col("kind"))))
        .withColumn("score", expr("s * 1000000 div m"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("kind")).orderBy(col("s").desc, col("id"))).cast("long"))
        .select(col("kind"), col("rank"), col("id"), col("score"))
        .orderBy(col("kind"), col("rank")))
    })

    spark.stop()
  }
}
