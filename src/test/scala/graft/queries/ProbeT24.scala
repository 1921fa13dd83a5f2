package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.Dedupe

/** Scratch stage decomposition for t24 (round 12). TEST scope only. */
object ProbeT24 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
      else System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    t("t24_full")(() => noop(MiningQueries.t24BloomDecontaminate(s, d)))

    def mkDocSh() = graft.core.Materialize.partitionedCheckpoint(
      documents(s, d).select(col("doc_id"),
        expr("""filter(split(trim(lower(text)), '\\s+'), w -> length(w) > 0)""").as("ws"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(ws) >= 3
          |  THEN array_distinct(transform(sequence(0, size(ws) - 3),
          |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
          |  ELSE array() END""".stripMargin).as("gs")), "doc_id")
    t("t24_docsh_ckpt")(() => { mkDocSh(); () })

    val docSh = mkDocSh()
    t("t24_evalbits_collect")(() => {
      val m = 1 << 20
      val sh = docSh.select(col("doc_id"), explode(col("gs")).as("g"))
      val evalSh = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      def bloomBit(l: Int): org.apache.spark.sql.Column =
        (Dedupe.md5Hash32(col("g")) +
          lit(l.toLong) * conv(substring(md5(col("g")), 9, 8), 16, 10).cast("long")) % m
      val bits = evalSh
        .select(explode(array((0 until 4).map(bloomBit): _*)).as("bit"))
        .distinct().collect()
      println(s"  (bits: ${bits.length})")
    })
    // piecewise: probe filter alone, perDoc agg, full minus sort
    t("t24_cand_only")(() => {
      val m = 1 << 20
      val sh = docSh.select(col("doc_id"), explode(col("gs")).as("g"))
      val evalSh = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      def bloomBit(l: Int): org.apache.spark.sql.Column =
        (Dedupe.md5Hash32(col("g")) +
          lit(l.toLong) * conv(substring(md5(col("g")), 9, 8), 16, 10).cast("long")) % m
      val evalBits = evalSh
        .select(explode(array((0 until 4).map(bloomBit): _*)).as("bit"))
        .distinct().collect().map(_.getLong(0))
      val words = new Array[Long](m / 64)
      evalBits.foreach(b => words(b.toInt >> 6) |= 1L << (b & 63))
      val bitmap = typedLit(words.toSeq)
      val corpus = sh.filter(col("doc_id") % 97 =!= 0)
      def laneOk(l: Int): org.apache.spark.sql.Column = {
        val b = bloomBit(l)
        val word = element_at(bitmap, (b / 64).cast("int") + 1)
        call_function("shiftright", word, (b % 64).cast("int"))
          .bitwiseAND(lit(1L)) === 1L
      }
      noop(corpus.filter((0 until 4).map(laneOk).reduce(_ && _))
        .select(col("doc_id"), col("g")))
    })
    t("t24_explode_only")(() =>
      noop(docSh.select(col("doc_id"), explode(col("gs")).as("g"))))
    spark.stop()
  }
}
