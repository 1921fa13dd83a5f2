package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for s19 bitext mining (round 11).
  * TEST scope only. Run: sbt "Test/runMain graft.queries.ProbeS19". */
object ProbeS19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    def tj(label: String)(df: => DataFrame): Unit = {
      val mk = () => df.write.format("noop").mode("overwrite").save()
      mk()
      Thread.sleep(200)
      val j0 = jobs.get; val s0 = stages.get
      val t0 = System.nanoTime(); mk()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PROBEJ $label%-28s $sec%.2f s  jobs=${jobs.get - j0}  stages=${stages.get - s0}")
    }

    import graft.core.Tables._
    import graft.plans.VectorExpressions.cosineSim
    def side(lang: String, idc: String, vc: String): DataFrame =
      documents(spark, sfDir).filter(col("lang") === lang)
        .select(col("doc_id").as(idc))
        .join(embeddings(spark, sfDir), col(idc) === col("vec_id"))
        .select(col(idc), col("embedding").as(vc))

    tj("sides")(side("en", "xid", "xv").crossJoin(side("de", "yid", "yv")))
    val pairsRaw = side("en", "xid", "xv").crossJoin(side("de", "yid", "yv"))
      .select(col("xid"), col("yid"), cosineSim(col("xv"), col("yv")).as("c"))
      .filter(col("c").isNotNull)
    tj("pairs_nockpt")(pairsRaw)
    val pairs = pairsRaw.localCheckpoint(true)
    tj("kavg_x") {
      val w = Window.partitionBy(col("xid")).orderBy(col("c").desc, col("yid"))
      pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
        .groupBy(col("xid"))
        .agg((expr("aggregate(array_sort(collect_list(struct(rk, c))), CAST(0.0 AS DOUBLE), (a, x) -> a + x.c)") / 4.0).as("ax"))
    }
    tj("kavg_agg_form") {
      pairs.groupBy(col("xid"))
        .agg((expr("aggregate(slice(array_sort(collect_list(struct(-c AS nc, yid, c))), 1, 4), CAST(0.0 AS DOUBLE), (a, x) -> a + x.c)") / 4.0).as("ax"))
    }
    tj("full_current")(SelectionQueries.s19BitextMining(spark, sfDir))
    spark.stop()
  }
}
