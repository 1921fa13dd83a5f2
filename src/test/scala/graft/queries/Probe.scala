package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Scratch profiling main — round-9 graph-family stage decomposition.
  * TEST scope only (round-10: moved out of the product jar per judge
  * advice). Run: sbt "Test/runMain graft.queries.Probe". */
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
    // job/stage counter: how many scheduling units an action really costs
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
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get; val s0 = stages.get
      val t0 = System.nanoTime(); mk()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PROBEJ $label%-32s $sec%.2f s  jobs=${jobs.get - j0}  stages=${stages.get - s0}")
    }
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
    // H2 (round 10): eager localCheckpoint taken with AQE OFF retains the
    // HashPartitioning in the LogicalRDD -> per-round joins elide the
    // edge-sized exchange. Build the edge frame raw (no Tables.parallelize
    // round-robin) + AQE-off ckpt, then run the 3 LPA rounds.
    def aqeOff[T](body: => T): T = {
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, "false")
      try body finally spark.conf.set(k, prev)
    }
    def rawDoubled(key: String): DataFrame = {
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v")).hint("shuffle_hash")
      val und = a.join(b, Seq("ok")).filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
      val dbl = und.select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v"))
        .repartition(col(key))
      aqeOff { dbl.localCheckpoint(true) }
    }
    t("edges_raw_doubled_aqeoff_ckpt")(rawDoubled("v"))
    val e4 = rawDoubled("v")
    println("=== one-round join plan over AQE-off ckpt ===")
    val lab04 = e4.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label"))
      .localCheckpoint(true)
    def round4(lab: DataFrame): DataFrame =
      e4.join(lab, e4("v") === lab("vertex"))
        .select(col("u"), col("label"))
        .repartition(32, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    round4(lab04).explain("formatted")
    t("lpa4_3rounds_sorted")(
      round4(round4(round4(lab04)).localCheckpoint(false)).localCheckpoint(false)
        .orderBy(col("vertex")))
    // and the full g06 shape end-to-end: raw read + AQE-off ckpt + rounds
    t("lpa4_end_to_end") {
      val e5 = rawDoubled("v")
      val l0 = e5.select(col("u").as("vertex")).distinct()
        .select(col("vertex"), col("vertex").as("label"))
        .localCheckpoint(false)
      def r5(lab: DataFrame): DataFrame =
        e5.join(lab, e5("v") === lab("vertex"))
          .select(col("u"), col("label"))
          .repartition(32, col("u"))
          .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
          .groupBy(col("u"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
      r5(r5(r5(l0)).localCheckpoint(false)).localCheckpoint(false)
        .orderBy(col("vertex"))
    }
    // H3: rounds UNCHECKPOINTED over the AQE-off ckpt e — partitioning
    // flows lab(r) -> lab(r+1) in one plan; SHJ hint on the small lab side
    // avoids SMJ's per-round sort of the edge frame.
    def round6(lab: DataFrame, shj: Boolean): DataFrame = {
      val l = if (shj) lab.hint("shuffle_hash") else lab
      e4.join(l, e4("v") === l("vertex"))
        .select(col("u"), col("label"))
        .repartition(32, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    }
    val lab06 = e4.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label"))
    t("lpa6_nockpt_smj_sorted")(
      round6(round6(round6(lab06, false), false), false).orderBy(col("vertex")))
    t("lpa6_nockpt_shj_sorted")(
      round6(round6(round6(lab06, true), true), true).orderBy(col("vertex")))
    println("=== lpa6 shj full plan ===")
    round6(round6(round6(lab06, true), true), true).orderBy(col("vertex")).explain("formatted")
    // round-10 g09 decomposition
    locally {
      val S = 1000000L
      def base0() = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")).hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      t("g09_base_join")(base0())
      t("g09_eC_ckpt")(graft.core.Materialize.dedupedPartitionedCheckpoint(
        base0(), keys = Seq("c"), dedupeKeys = Seq("c", "p")))
      val eC = graft.core.Materialize.dedupedPartitionedCheckpoint(
        base0(), keys = Seq("c"), dedupeKeys = Seq("c", "p"))
      t("g09_eP_ckpt")(graft.core.Materialize.partitionedCheckpoint(eC, "p"))
      val eP = graft.core.Materialize.partitionedCheckpoint(eC, "p")
      val h00 = eC.select(col("c")).dropDuplicates("c")
        .select(col("c"), lit(S).as("h")).localCheckpoint(true)
      def oneRound(h: DataFrame): (DataFrame, DataFrame) = {
        val a0 = eC.join(h.hint("shuffle_hash"), Seq("c"))
          .groupBy(col("p")).agg(sum(col("h")).as("s"))
          .localCheckpoint(false)
        val am = a0.agg(max(col("s")).as("m"))
        val a = a0.crossJoin(broadcast(am)).selectExpr("p", "s * 1000000 div m AS a")
        val h0 = eP.join(a.hint("shuffle_hash"), Seq("p"))
          .groupBy(col("c")).agg(sum(col("a")).as("s"))
          .localCheckpoint(false)
        val hm = h0.agg(max(col("s")).as("m"))
        (a, h0.crossJoin(broadcast(hm)).selectExpr("c", "s * 1000000 div m AS h"))
      }
      t("g09_one_round")(oneRound(h00)._2)
      t("g09_three_rounds") {
        var h = h00; var a: DataFrame = null
        for (_ <- 1 to 3) { val r = oneRound(h); a = r._1; h = r._2 }
        h
      }
      t("g09_full")(ProfileQueries.g09Hits(spark, sfDir))
      // hint-free variants: AQE free to broadcast the small sides at bench scale
      def base1() = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      t("g09_base_nohint")(base1())
      t("g09_eC_nohint")(graft.core.Materialize.dedupedPartitionedCheckpoint(
        base1(), keys = Seq("c"), dedupeKeys = Seq("c", "p")))
      def oneRoundNH(h: DataFrame): (DataFrame, DataFrame) = {
        val a0 = eC.join(h, Seq("c"))
          .groupBy(col("p")).agg(sum(col("h")).as("s"))
          .localCheckpoint(false)
        val am = a0.agg(max(col("s")).as("m"))
        val a = a0.crossJoin(broadcast(am)).selectExpr("p", "s * 1000000 div m AS a")
        val h0 = eP.join(a, Seq("p"))
          .groupBy(col("c")).agg(sum(col("a")).as("s"))
          .localCheckpoint(false)
        val hm = h0.agg(max(col("s")).as("m"))
        (a, h0.crossJoin(broadcast(hm)).selectExpr("c", "s * 1000000 div m AS h"))
      }
      t("g09_three_rounds_nohint") {
        var h = h00; var a: DataFrame = null
        for (_ <- 1 to 3) { val r = oneRoundNH(h); a = r._1; h = r._2 }
        h
      }
    }
    // round-10 production shapes
    t("r10_fused_edges_v")(MiningQueries.doubledEdgesFused(spark, sfDir, "v"))
    val e10 = MiningQueries.doubledEdgesFused(spark, sfDir, "v")
    t("r10_round1_minneighbor")(
      e10.groupBy(col("u")).agg(min(col("v")).as("label"))
        .select(col("u").as("vertex"), col("label")))
    val lab110 = e10.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("vertex"), col("label")).localCheckpoint(true)
    def round10(lab: DataFrame): DataFrame = {
      val l = lab.hint("shuffle_hash")
      e10.join(l, e10("v") === l("vertex"))
        .select(col("u"), col("label"))
        .repartition(32, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    }
    t("r10_one_round")(round10(lab110))
    t("r10_rounds23_sorted")(round10(round10(lab110)).orderBy(col("vertex")))
    def round10nh(lab: DataFrame): DataFrame =
      e10.join(lab, e10("v") === lab("vertex"))
        .select(col("u"), col("label"))
        .repartition(32, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    t("r10_rounds23_nohint_sorted")(
      round10nh(round10nh(lab110)).localCheckpoint(false).orderBy(col("vertex")))
    t("r10_g06_full")(MiningQueries.g06LabelProp(spark, sfDir))
    // basket-explode edge build under AQE-off (r9 rejected it because AQE
    // coalesced the basket agg to ~1 partition; Materialize runs AQE-off)
    def basketEdges(key: String): DataFrame = {
      val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val baskets = raw.groupBy(col("ok"))
        .agg(sort_array(collect_set(col("pk"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1), y ->
            |    struct(x AS u, y AS v))))""".stripMargin)).as("p"))
        .select(col("p.u"), col("p.v"))
      graft.core.Materialize.dedupedPartitionedCheckpoint(
        baskets.select(explode(array(
            struct(col("u").as("a"), col("v").as("b")),
            struct(col("v").as("a"), col("u").as("b")))).as("s"))
          .select(col("s.a").as("u"), col("s.b").as("v")),
        keys = Seq(key), dedupeKeys = Seq("u", "v"))
    }
    t("r10_basket_edges_v")(basketEdges("v"))
    val e11 = basketEdges("v")
    val lab111 = e11.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("vertex"), col("label")).localCheckpoint(true)
    def round11(lab: DataFrame): DataFrame = {
      val l = lab.hint("shuffle_hash")
      e11.join(l, e11("v") === l("vertex"))
        .select(col("u"), col("label"))
        .repartition(32, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    }
    t("r10_basket_rounds23_nosort")(round11(round11(lab111)))
    t("r10_basket_rounds23_sorted")(round11(round11(lab111)).orderBy(col("vertex")))
    t("lpa_round1_only")(round(lab0))
    t("lpa_3rounds")(round(round(round(lab0)).localCheckpoint(false)).localCheckpoint(false))
    t("lpa_3rounds_sorted")(
      round(round(round(lab0)).localCheckpoint(false)).localCheckpoint(false)
        .orderBy(col("vertex")))
    // t24 decomposition
    locally {
      val docSh = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"),
          expr("""filter(split(trim(lower(text)), '\\s+'), w -> length(w) > 0)""").as("ws"))
        .select(col("doc_id"), expr(
          """CASE WHEN size(ws) >= 3
            |  THEN array_distinct(transform(sequence(0, size(ws) - 3),
            |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
            |  ELSE array() END""".stripMargin).as("gs"))
      tj("t24_docsh_narrow")(docSh)
      tj("t24_docsh_ckpt")(docSh.localCheckpoint(true))
      val dsc = docSh.localCheckpoint(true)
      val sh2 = dsc.select(col("doc_id"), explode(col("gs")).as("g"))
      tj("t24_evalsh_distinct")(sh2.filter(col("doc_id") % 97 === 0).select(col("g")).distinct())
      tj("t24_probe_4md5")(sh2.filter(col("doc_id") % 97 =!= 0)
        .filter((0 until 4).map(l => (graft.operators.Dedupe.md5Hash32(
          concat(col("g"), lit("#"), lit(l.toString))) % 1048576) > -1).reduce(_ && _)))
      tj("t24_full")(MiningQueries.t24BloomDecontaminate(spark, sfDir))
      tj("t24_nockpt") {
        val m = 1 << 20
        val docSh = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"),
            expr("""filter(split(trim(lower(text)), '\\s+'), w -> length(w) > 0)""").as("ws"))
          .select(col("doc_id"), expr(
            """CASE WHEN size(ws) >= 3
              |  THEN array_distinct(transform(sequence(0, size(ws) - 3),
              |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
              |  ELSE array() END""".stripMargin).as("gs"))
        val sh = docSh.select(col("doc_id"), explode(col("gs")).as("g"))
        val evalSh = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
        def bloomBit(l: Int): org.apache.spark.sql.Column =
          (graft.operators.Dedupe.md5Hash32(col("g")) +
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
        val cand = corpus.filter((0 until 4).map(laneOk).reduce(_ && _))
          .select(col("doc_id"), col("g"))
        val perDoc = cand
          .join(broadcast(evalSh.withColumn("hit", lit(1))), Seq("g"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_cand"), count(col("hit")).as("n_exact"))
        val shCnt = docSh.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), size(col("gs")).cast("long").as("n_shingles"))
        spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
          .join(shCnt, Seq("doc_id"), "left")
          .join(perDoc, Seq("doc_id"), "left")
          .selectExpr("doc_id",
            "coalesce(n_shingles, CAST(0 AS BIGINT)) AS n_shingles",
            "coalesce(n_cand, CAST(0 AS BIGINT)) AS n_bloom_candidates",
            "coalesce(n_exact, CAST(0 AS BIGINT)) AS n_exact_hits",
            "coalesce(n_cand, CAST(0 AS BIGINT)) - coalesce(n_exact, CAST(0 AS BIGINT)) AS n_bloom_fp",
            "CAST(coalesce(n_exact, CAST(0 AS BIGINT)) > 0 AS INT) AS contaminated")
          .orderBy(col("doc_id"))
      }
      // split: construction (ckpt+collect jobs) vs final action
      locally {
        val t0 = System.nanoTime()
        val q = MiningQueries.t24BloomDecontaminate(spark, sfDir)
        val t1 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"PROBEJ t24_construct                    ${(t1-t0)/1e9}%.2f s")
        println(f"PROBEJ t24_final_action                 ${(t2-t1)/1e9}%.2f s")
      }
    }
    // s06 decomposition
    locally {
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"PROBEJ s06_corpus_rows                  ${emb.count()}")
      val t0 = System.nanoTime()
      val q = MiningQueries // no-op to keep block
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val full = Similarity.graphSearchTopK(emb, col("vec_id"), col("embedding"), qs,
        k = 5, dim = 64, nPlanes = 5, nTables = 6, m = 8, beamWidth = 10)
      val t1 = System.nanoTime()
      full.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROBEJ s06_construct                    ${(t1-t0)/1e9}%.2f s")
      println(f"PROBEJ s06_action                       ${(t2-t1)/1e9}%.2f s")
      tj("s06_full")(graft.queries.LlmQueries.s06AnnGraph(spark, sfDir))
      // in-session variants: which materialization mode wins for the hops?
      tj("s06_again")(graft.queries.LlmQueries.s06AnnGraph(spark, sfDir))
    }
    // g05 builder A/B (fused AQE-off vs r9-style)
    tj("g05_current")(MiningQueries.g05Kcore(spark, sfDir))
    tj("g05_r9_builder") {
      val k = 3
      var e = MiningQueries.doubledEdges(MiningQueries.coPurchaseEdges(spark, sfDir), "u")
      for (_ <- 1 to 3) {
        val surv = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("u"))
        e = e.join(surv, Seq("u"))
          .join(surv.withColumnRenamed("u", "v"), Seq("v"))
          .select(col("u"), col("v")).localCheckpoint(false)
      }
      e.groupBy(col("u")).agg(count(lit(1)).as("deg_in_core"))
        .select(col("u").as("vertex"), col("deg_in_core"))
        .orderBy(col("vertex"))
    }
    // full declared queries with job/stage counts (round-10 audit)
    tj("g03_full")(MiningQueries.g03BfsHops(spark, sfDir))
    tj("g04_full")(MiningQueries.g04PageRank(spark, sfDir))
    tj("g06_full")(MiningQueries.g06LabelProp(spark, sfDir))
    tj("g08_full")(ProfileQueries.g08LinkPrediction(spark, sfDir))
    tj("g09_full")(ProfileQueries.g09Hits(spark, sfDir))
    // V2: r9-style rounds (eager AQE ckpts + broadcast max) over eC/eP builds
    tj("g09_v2_r9rounds") {
      val S = 1000000L
      def base1() = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      val eC = graft.core.Materialize.dedupedPartitionedCheckpoint(
        base1(), keys = Seq("c"), dedupeKeys = Seq("c", "p"))
      val eP = graft.core.Materialize.partitionedCheckpoint(eC, "p")
      var h = eC.select(col("c")).dropDuplicates("c").select(col("c"), lit(S).as("h"))
      var a: DataFrame = null
      for (_ <- 1 to 3) {
        val a0 = eC.join(h, Seq("c")).groupBy(col("p")).agg(sum(col("h")).as("s"))
        val am = a0.agg(max(col("s")).as("m"))
        a = a0.crossJoin(broadcast(am))
          .selectExpr("p", "s * 1000000 div m AS a").localCheckpoint(true)
        val h0 = eP.join(a, Seq("p")).groupBy(col("c")).agg(sum(col("a")).as("s"))
        val hm = h0.agg(max(col("s")).as("m"))
        h = h0.crossJoin(broadcast(hm))
          .selectExpr("c", "s * 1000000 div m AS h").localCheckpoint(true)
      }
      val topHubs = h.selectExpr("'hub' AS kind", "c AS id", "h AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      val topAuth = a.selectExpr("'authority' AS kind", "p AS id", "a AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      topHubs.unionByName(topAuth).repartition(1)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))
            .orderBy(col("score").desc, col("id"))).cast("long"))
        .select(col("kind"), col("rank"), col("id"), col("score"))
        .sortWithinPartitions(col("kind"), col("rank"))
    }
    // V3: literal-max + LAZY ckpts (heads force materialization anyway)
    tj("g09_v3_lazy_literal") {
      val S = 1000000L
      def base1() = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      val eC = graft.core.Materialize.dedupedPartitionedCheckpoint(
        base1(), keys = Seq("c"), dedupeKeys = Seq("c", "p"))
      val eP = graft.core.Materialize.partitionedCheckpoint(eC, "p")
      var h = eC.select(col("c")).dropDuplicates("c").select(col("c"), lit(S).as("h"))
      var a: DataFrame = null
      for (_ <- 1 to 3) {
        val a0 = eC.join(h, Seq("c")).groupBy(col("p")).agg(sum(col("h")).as("s"))
          .localCheckpoint(false)
        val am = a0.agg(max(col("s"))).head().getLong(0)
        a = a0.selectExpr("p", s"s * 1000000 div ${am}L AS a")
        val h0 = eP.join(a, Seq("p")).groupBy(col("c")).agg(sum(col("a")).as("s"))
          .localCheckpoint(false)
        val hm = h0.agg(max(col("s"))).head().getLong(0)
        h = h0.selectExpr("c", s"s * 1000000 div ${hm}L AS h")
      }
      val topHubs = h.selectExpr("'hub' AS kind", "c AS id", "h AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      val topAuth = a.selectExpr("'authority' AS kind", "p AS id", "a AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      topHubs.unionByName(topAuth).repartition(1)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))
            .orderBy(col("score").desc, col("id"))).cast("long"))
        .select(col("kind"), col("rank"), col("id"), col("score"))
        .sortWithinPartitions(col("kind"), col("rank"))
    }
    // variant: lazy ckpts + broadcast-crossJoin rounds + orderBy tail
    tj("g09_lazy_variant") {
      val S = 1000000L
      def base1() = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      val eC = graft.core.Materialize.dedupedPartitionedCheckpoint(
        base1(), keys = Seq("c"), dedupeKeys = Seq("c", "p"))
      val eP = graft.core.Materialize.partitionedCheckpoint(eC, "p")
      var h = eC.select(col("c")).dropDuplicates("c").select(col("c"), lit(S).as("h"))
      var a: DataFrame = null
      for (_ <- 1 to 3) {
        val a0 = eC.join(h, Seq("c"))
          .groupBy(col("p")).agg(sum(col("h")).as("s")).localCheckpoint(false)
        val am = a0.agg(max(col("s")).as("m"))
        a = a0.crossJoin(broadcast(am)).selectExpr("p", "s * 1000000 div m AS a")
        val h0 = eP.join(a, Seq("p"))
          .groupBy(col("c")).agg(sum(col("a")).as("s")).localCheckpoint(false)
        val hm = h0.agg(max(col("s")).as("m"))
        h = h0.crossJoin(broadcast(hm)).selectExpr("c", "s * 1000000 div m AS h")
      }
      val topHubs = h.selectExpr("'hub' AS kind", "c AS id", "h AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      val topAuth = a.selectExpr("'authority' AS kind", "p AS id", "a AS score")
        .orderBy(col("score").desc, col("id")).limit(20)
      topHubs.unionByName(topAuth)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))
            .orderBy(col("score").desc, col("id"))).cast("long"))
        .select(col("kind"), col("rank"), col("id"), col("score"))
        .orderBy(col("kind"), col("rank"))
    }
    spark.stop()
  }
}
