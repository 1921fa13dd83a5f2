package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Scratch profiling main — round-9 graph-family stage decomposition.
  * Not part of the declared surface; keep out of SparkEntry. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(df: => DataFrame): Unit = {
      val mk = () => df.write.format("noop").mode("overwrite").save()
      mk()
      System.gc()
      val t0 = System.nanoTime(); mk()
      val t1 = System.nanoTime(); mk()
      val sec = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
      println(f"PROBE $label%-32s $sec%.2f s")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))

    t("li_scan")(li)
    t("pair_join") {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v"))
      a.join(b, Seq("ok")).filter(col("u") < col("v")).select(col("u"), col("v"))
    }
    t("pair_join_shj") {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v")).hint("shuffle_hash")
      a.join(b, Seq("ok")).filter(col("u") < col("v")).select(col("u"), col("v"))
    }
    t("pair_join_smj") {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v")).hint("merge")
      a.join(b, Seq("ok")).filter(col("u") < col("v")).select(col("u"), col("v"))
    }
    t("edges_distinct_shj") {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v")).hint("shuffle_hash")
      a.join(b, Seq("ok")).filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
    }
    t("edges_distinct")(MiningQueries.coPurchaseEdges(spark, sfDir))
    t("edges_doubled_ckpt")(
      MiningQueries.doubledEdges(MiningQueries.coPurchaseEdges(spark, sfDir), "v"))
    // LPA rounds on top of a prebuilt checkpointed edge frame
    val e = MiningQueries.doubledEdges(MiningQueries.coPurchaseEdges(spark, sfDir), "v")
    val lab0 = e.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label"))
      .localCheckpoint(true)
    t("lpa_lab0")(e.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label")))
    def round(lab: DataFrame): DataFrame =
      e.join(lab, e("v") === lab("vertex"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    def fused(key: String): DataFrame = {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v"))
      a.join(b, Seq("ok")).filter(col("u") < col("v"))
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v"))
        .repartition(sys.env.getOrElse("SPARK_GRAFT_SHUF", "32").toInt, col(key))
        .distinct()
        .localCheckpoint(true)
    }
    t("edges_fused_doubled_ckpt")(fused("v"))
    val e2 = fused("v")
    val lab02 = e2.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label"))
      .localCheckpoint(true)
    def round2(lab: DataFrame): DataFrame =
      e2.join(lab, e2("v") === lab("vertex"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    t("lpa2_3rounds_sorted")(
      round2(round2(round2(lab02).localCheckpoint(false)).localCheckpoint(false))
        .orderBy(col("vertex")))
    // ONE-PLAN LPA: no checkpoints anywhere; e's exchange reused via AQE
    // stage reuse; per-round single repartition(u) feeds both aggs; lab
    // side arrives pre-partitioned from the previous round's agg.
    def onePlan(): DataFrame = {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v"))
      val e3 = a.join(b, Seq("ok")).filter(col("u") < col("v"))
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v"))
        .repartition(sys.env.getOrElse("SPARK_GRAFT_SHUF", "32").toInt, col("v"))
        .distinct()
      var lab = e3.select(col("u").as("vertex")).distinct()
        .select(col("vertex"), col("vertex").as("label"))
      for (_ <- 1 to 3) {
        lab = e3.join(lab.withColumnRenamed("vertex", "v"), Seq("v"))
          .select(col("u"), col("label"))
          .repartition(sys.env.getOrElse("SPARK_GRAFT_SHUF", "32").toInt, col("u"))
          .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
          .groupBy(col("u"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
      }
      lab.select(col("vertex"), col("label").as("community")).orderBy(col("vertex"))
    }
    t("lpa_oneplan_sorted")(onePlan())
    t("lpa_round1_only")(round(lab0))
    t("lpa_3rounds")(round(round(round(lab0)).localCheckpoint(false)).localCheckpoint(false))
    t("lpa_3rounds_sorted")(
      round(round(round(lab0)).localCheckpoint(false)).localCheckpoint(false)
        .orderBy(col("vertex")))
    spark.stop()
  }
}
