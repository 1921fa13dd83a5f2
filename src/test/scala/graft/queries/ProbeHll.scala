package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.Dedupe

/** Scratch stage decomposition for the HLL-grid family (round 12: d19,
  * d20, t24 floor work). TEST scope only.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.queries.ProbeHll". */
object ProbeHll {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def t(label: String)(mk: () => Unit): Unit = {
      mk()
      Thread.sleep(100)
      val j0 = jobs.get
      val times = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); mk(); (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(100)
      println(f"PROBE $label%-32s min2=${times.min}%.2f s jobs=${(jobs.get - j0) / 2}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val s = spark; val d = sfDir

    t("d19_full")(() => noop(SketchQueries.d19HllTimeseries(s, d)))

    // stage: the deduped-partitioned checkpoint base
    def mkBase() = graft.core.Materialize.dedupedPartitionedCheckpoint(
      tableRaw(s, d, "lineitem").select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"),
        concat(col("l_partkey").cast("string"), lit("#"),
          col("l_suppkey").cast("string")).as("w")),
      keys = Seq("w"), dedupeKeys = Seq("ym", "w"))
    t("d19_base_ckpt")(() => { mkBase(); () })

    val base = mkBase()
    t("d19_rest_on_base")(() => {
      val m = 256
      val regs = base
        .select(col("ym"), (Dedupe.md5Hash32(col("w")) % m).as("bucket"),
          graft.queries.SketchQueries.probeMd5Word2(col("w")).as("wd"))
        .select(col("ym"), col("bucket"),
          when(col("wd") === 0, lit(32))
            .otherwise(lit(33) - length(bin(col("wd")))).as("rho"))
        .groupBy(col("ym"), col("bucket")).agg(max(col("rho")).as("r"))
        .localCheckpoint(false)
      val months = regs.select(col("ym")).distinct()
      val grid = months.crossJoin(broadcast(regs.select(col("bucket")).distinct()))
      val cum = grid.join(regs, Seq("ym", "bucket"), "left")
        .withColumn("rc", max(col("r")).over(
          Window.partitionBy(col("bucket")).orderBy(col("ym"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("rc").isNotNull)
      val est = cum.groupBy(col("ym"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - rc)")).as("sp"),
          count(lit(1)).as("nb"))
        .selectExpr("ym",
          "(718273 * (CAST(281474976710656 AS BIGINT) div " +
            "(sp + (256 - nb) * CAST(4294967296 AS BIGINT)))) div 1000000 AS est_cum")
      val newPerMonth = base.groupBy(col("w")).agg(min(col("ym")).as("fym"))
        .groupBy(col("fym")).agg(count(lit(1)).as("nw"))
      val exact = months.join(newPerMonth.withColumnRenamed("fym", "ym"), Seq("ym"), "left")
        .withColumn("exact_cum", sum(coalesce(col("nw"), lit(0L))).over(
          Window.orderBy(col("ym")).rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("ym"), col("exact_cum"))
      noop(est.join(exact, Seq("ym"))
        .selectExpr("ym", "est_cum", "exact_cum",
          "CASE WHEN exact_cum = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE abs(est_cum - exact_cum) * 10000 div exact_cum END AS err_bp")
        .localCheckpoint(false)
        .orderBy(col("ym")))
    })

    // variant: NO base checkpoint — single lineage, AQE exchange reuse
    t("d19_nockpt")(() => {
      val m = 256
      val raw = tableRaw(s, d, "lineitem").select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"),
        concat(col("l_partkey").cast("string"), lit("#"),
          col("l_suppkey").cast("string")).as("w"))
        .repartition(col("w")).dropDuplicates(Seq("ym", "w"))
      val regs = raw
        .select(col("ym"), (Dedupe.md5Hash32(col("w")) % m).as("bucket"),
          graft.queries.SketchQueries.probeMd5Word2(col("w")).as("wd"))
        .select(col("ym"), col("bucket"),
          when(col("wd") === 0, lit(32))
            .otherwise(lit(33) - length(bin(col("wd")))).as("rho"))
        .groupBy(col("ym"), col("bucket")).agg(max(col("rho")).as("r"))
        .localCheckpoint(false)
      val months = regs.select(col("ym")).distinct()
      val grid = months.crossJoin(broadcast(regs.select(col("bucket")).distinct()))
      val cum = grid.join(regs, Seq("ym", "bucket"), "left")
        .withColumn("rc", max(col("r")).over(
          Window.partitionBy(col("bucket")).orderBy(col("ym"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("rc").isNotNull)
      val est = cum.groupBy(col("ym"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - rc)")).as("sp"),
          count(lit(1)).as("nb"))
        .selectExpr("ym",
          "(718273 * (CAST(281474976710656 AS BIGINT) div " +
            "(sp + (256 - nb) * CAST(4294967296 AS BIGINT)))) div 1000000 AS est_cum")
      val newPerMonth = raw.groupBy(col("w")).agg(min(col("ym")).as("fym"))
        .groupBy(col("fym")).agg(count(lit(1)).as("nw"))
      val exact = months.join(newPerMonth.withColumnRenamed("fym", "ym"), Seq("ym"), "left")
        .withColumn("exact_cum", sum(coalesce(col("nw"), lit(0L))).over(
          Window.orderBy(col("ym")).rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("ym"), col("exact_cum"))
      noop(est.join(exact, Seq("ym"))
        .selectExpr("ym", "est_cum", "exact_cum",
          "CASE WHEN exact_cum = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE abs(est_cum - exact_cum) * 10000 div exact_cum END AS err_bp")
        .localCheckpoint(false)
        .orderBy(col("ym")))
    })

    // variant: no dedupe checkpoint at all — regs aggregates the raw scan
    // (max-rho is dup-invariant, map-side combine ships only m·months
    // rows), firstSeen aggregates a second raw scan by w (min-ym is
    // dup-invariant too). Two cheap column-pruned scans instead of one
    // corpus shuffle + materialization.
    t("d19_rawscan_fused")(() => {
      val m = 256
      def li() = tableRaw(s, d, "lineitem").select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"),
        concat(col("l_partkey").cast("string"), lit("#"),
          col("l_suppkey").cast("string")).as("w"))
      val regs = li()
        .select(col("ym"), (Dedupe.md5Hash32(col("w")) % m).as("bucket"),
          graft.queries.SketchQueries.probeMd5Word2(col("w")).as("wd"))
        .select(col("ym"), col("bucket"),
          when(col("wd") === 0, lit(32))
            .otherwise(lit(33) - length(bin(col("wd")))).as("rho"))
        .groupBy(col("ym"), col("bucket")).agg(max(col("rho")).as("r"))
      val ev = regs
        .withColumn("prev", max(col("r")).over(
          Window.partitionBy(col("bucket")).orderBy(col("ym"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("ym"),
          expr("""CASE WHEN prev IS NULL THEN shiftleft(CAST(1 AS BIGINT), 32 - r)
                 |     WHEN r > prev THEN shiftleft(CAST(1 AS BIGINT), 32 - r)
                 |                        - shiftleft(CAST(1 AS BIGINT), 32 - prev)
                 |     ELSE CAST(0 AS BIGINT) END""".stripMargin).as("d_sp"),
          when(col("prev").isNull, lit(1L)).otherwise(lit(0L)).as("d_nb"),
          lit(0L).as("d_new"))
      val firstSeen = li().groupBy(col("w")).agg(min(col("ym")).as("ym"))
        .groupBy(col("ym")).agg(count(lit(1)).as("nw"))
        .select(col("ym"), lit(0L).as("d_sp"), lit(0L).as("d_nb"),
          col("nw").as("d_new"))
      val wcum = Window.orderBy(col("ym"))
        .rowsBetween(Window.unboundedPreceding, 0)
      noop(ev.unionByName(firstSeen)
        .groupBy(col("ym"))
        .agg(sum(col("d_sp")).as("sp_d"), sum(col("d_nb")).as("nb_d"),
          sum(col("d_new")).as("new_d"))
        .withColumn("sp", sum(col("sp_d")).over(wcum))
        .withColumn("nb", sum(col("nb_d")).over(wcum))
        .withColumn("exact_cum", sum(col("new_d")).over(wcum))
        .selectExpr("ym",
          "(718273 * (CAST(281474976710656 AS BIGINT) div " +
            "(sp + (256 - nb) * CAST(4294967296 AS BIGINT)))) div 1000000 AS est_cum",
          "exact_cum")
        .selectExpr("ym", "est_cum", "exact_cum",
          "CASE WHEN exact_cum = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE abs(est_cum - exact_cum) * 10000 div exact_cum END AS err_bp")
        .localCheckpoint(false)
        .orderBy(col("ym")))
    })

    spark.stop()
  }
}
