package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Behavior contracts for the curation family (t36 / s11 / q78 / dq09 /
  * p02) — independent driver-side recomputations and the distribution
  * invariants the DuckDB hash check doesn't state explicitly.
  */
class CurationSpec extends SparkSpec {

  test("t36: 3-round TextRank reproduces under an independent BigInt driver-side walk") {
    // Independent plain-Scala implementation: tokenize → adjacent pairs →
    // undirected weighted graph → 3 damped rounds, all in BigInt so any
    // engine-side overflow would show up as a mismatch.
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val S = BigInt(1000000000L)
    val edges = collection.mutable.Map.empty[(String, String), BigInt]
    docs.filter(_ != null).foreach { t =>
      val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.sliding(2).foreach {
        case Array(a, b) if a != b =>
          val k = if (a < b) (a, b) else (b, a)
          edges(k) = edges.getOrElse(k, BigInt(0)) + 1
        case _ => ()
      }
    }
    val dir = edges.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val wsum = dir.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var p: Map[String, BigInt] = wsum.map { case (u, _) => u -> S }
    for (_ <- 1 to 3) {
      val contrib = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, c) => (p(u) * c) / wsum(u) }.sum
      }
      p = contrib.map { case (v, s) => v -> (S * 15 / 100 + s * 85 / 100) }
    }
    val expect = p.toSeq.sortBy { case (w, r) => (-r, w) }.take(50)
    val got = CurationQueries.t36Textrank(spark, sf()).collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1))))
    assert(got.toSeq == expect,
      s"engine TextRank diverges from the BigInt recount:\n${got.take(5).toSeq} vs ${expect.take(5)}")
  }

  test("s11: votes reproduce under a driver-side brute-force kNN recount") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val held = emb.filter(_._1 % 100 < 2)
    val train = emb.filter(_._1 % 100 >= 2)
    val expect = held.sortBy(_._1).map { case (qid, qv, truth) =>
      val top = train.map { case (id, v, l) => (id, l, cos(v, qv)) }
        .sortBy { case (id, _, sc) => (-sc, id) }.take(5)
      val votes = top.groupBy(_._2).map { case (l, g) => (l, g.length) }
      val (pred, n) = votes.toSeq.maxBy { case (l, c) => (c, -l) }
      (qid, truth, pred, n.toLong, if (pred == truth) 1 else 0)
    }
    val got = CurationQueries.s11KnnLabelEval(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == expect.toSeq,
      s"kNN eval diverges from brute force:\n${got.take(3).toSeq} vs ${expect.take(3).toSeq}")
    // the probe must fill every held-out query
    assert(got.length == held.length)
  }

  test("q78: concordance and covariance numerators reproduce in BigInt; lag 0 is self-consistent") {
    val rows = CurationQueries.q78LeadLag(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent recount from the raw tables
    val a = spark.read.parquet(sf() + "/orders.parquet")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("t"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("t").agg(expr("sum(c) div 10000000").as("v")).collect()
      .map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    val b = spark.read.parquet(sf() + "/lineitem.parquet")
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long").as("t"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("q"))
      .groupBy("t").agg(sum("q").as("v")).collect()
      .map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    val ts = a.keySet.intersect(b.keySet).toSeq.sorted
    val n = BigInt(ts.length)
    val sa = ts.map(a).sum; val sb = ts.map(b).sum
    val da = ts.map(t => t -> (n * a(t) - sa)).toMap
    val db = ts.map(t => t -> (n * b(t) - sb)).toMap
    for ((lag, nPairs, num, nConc, bp) <- rows) {
      val pairs = ts.filter(t => db.contains(t + lag))
      assert(nPairs == pairs.length.toLong, s"lag $lag pair count")
      val eNum = pairs.map(t => da(t) * db(t + lag)).sum
      assert(BigInt(num) == eNum, s"lag $lag covariance numerator wraps or diverges")
      val eConc = pairs.count(t =>
        (da(t) > 0 && db(t + lag) > 0) || (da(t) < 0 && db(t + lag) < 0))
      assert(nConc == eConc.toLong && bp == eConc.toLong * 10000 / pairs.length)
    }
    // lag 0 pairs every common month with itself: covariance numerator > 0
    val l0 = rows.find(_._1 == 0L).get
    assert(l0._2 == ts.length.toLong)
  }

  test("dq09: max gap dominates the telescoped mean and 1h exceedances are consistent") {
    val rows = CurationQueries.dq09Freshness(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val first = r.getAs[Long]("first_us"); val last = r.getAs[Long]("last_us")
      val maxGap = r.getAs[Long]("max_gap_us"); val mean = r.getAs[Long]("mean_gap_us")
      assert(last >= first && maxGap >= 0 && maxGap >= mean,
        s"${r.getString(0)}: max gap must dominate the mean")
      assert(mean == (if (n > 1) (last - first) / (n - 1) else 0L),
        "telescoped mean must equal (last-first)/(n-1) exactly")
      val over = r.getAs[Long]("n_gaps_over_1h")
      assert(over >= 0 && over <= n - 1)
      if (maxGap <= 3600000000L) assert(over == 0L)
      else assert(over >= 1L)
    }
  }

  test("m11: decoded color stats reproduce the synthesis arithmetic for BOTH containers") {
    // Independent driver-side recount straight from the pixel formula —
    // if the PNG or BMP codec mangled one channel byte anywhere, a mean
    // or histogram bucket would shift.
    val got = graft.queries.CurationQueries.m11ColorStats(spark, sf()).collect()
    val nDocs = spark.read.parquet(sf() + "/documents.parquet").count().toInt
    assert(got.length == nDocs, "every doc must decode (no codec fallout)")
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getString(1) == (if (id % 2 == 0) "png" else "bmp"))
      val base = id / 8; val pert = id % 8
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](4)
      for (y <- 0 until 16; x <- 0 until 18) {
        var rr = (x * x + 3 * y * base + 7 * base * base + 11 * y) % 256
        if ((x + 18 * y) % 29 == 0) rr = (rr + pert) % 256
        val gg = (y * y + 5 * x * base + 13 * base) % 256
        val bb = (x * y + 17 * base + 19 * x) % 256
        sr += rr; sg += gg; sb += bb
        hist((((rr * 299 + gg * 587 + bb * 114) / 1000) / 64).toInt) += 1
      }
      assert(r.getAs[Long]("n_px") == 288L)
      assert(r.getAs[Long]("mean_r") == sr / 288 && r.getAs[Long]("mean_g") == sg / 288 &&
        r.getAs[Long]("mean_b") == sb / 288, s"doc $id channel means diverge")
      assert((6 to 9).map(r.getLong) == hist.toSeq, s"doc $id luminance histogram diverges")
      assert(hist.sum == 288L)
    }
  }

  test("s12: candidate cost grows strictly with nProbe and recall is monotone") {
    val rows = graft.queries.CurationQueries.s12RecallSweep(spark, sf()).collect()
      .sortBy(_.getAs[Long]("np"))
    assert(rows.map(_.getAs[Long]("np")).toSeq == Seq(1L, 2L, 4L))
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands(0) < cands(1) && cands(1) < cands(2),
      s"probing more partitions must scan strictly more candidates: ${cands.toSeq}")
    // superset candidate sets can only displace a true hit with another
    // true hit, so recall@5 is monotone non-decreasing in nProbe
    val hits = rows.map(_.getAs[Long]("sum_hits"))
    assert(hits(0) <= hits(1) && hits(1) <= hits(2), s"recall must be monotone: ${hits.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_bp") ==
        r.getAs[Long]("sum_hits") * 10000 / (5 * r.getAs[Long]("n_queries")))
      assert(r.getAs[Long]("sum_hits") <= 5 * r.getAs[Long]("n_queries"))
    }
  }

  test("q79: quintiles are balanced per axis and the grid conserves customers and revenue") {
    val rows = graft.queries.CurationQueries.q79Rfm(spark, sf()).collect()
    val o = spark.read.parquet(sf() + "/orders.parquet")
    val nCust = o.select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust,
      "every ordering customer lands in exactly one (r,f,m) cell")
    val totCents = o.selectExpr("sum(CAST(floor(o_totalprice * 100) AS BIGINT))")
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("sum_cents")).sum == totCents, "revenue conserved")
    // remainder-first NTILE: every axis quintile holds floor(n/5) or ceil(n/5)
    for (axis <- Seq("r_q", "f_q", "m_q")) {
      val byQ = rows.groupBy(_.getAs[Int](axis))
        .map { case (q, g) => q -> g.map(_.getAs[Long]("n_customers")).sum }
      assert(byQ.keySet == Set(1, 2, 3, 4, 5), s"$axis must have 5 populated quintiles")
      assert(byQ.values.forall(c => c == nCust / 5 || c == nCust / 5 + 1),
        s"$axis quintiles unbalanced: $byQ")
    }
  }

  test("t37: PMI and Dice reproduce under a BigInt driver-side recount") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val uni = collection.mutable.Map.empty[String, Long]
    val bg = collection.mutable.Map.empty[(String, String), Long]
    docs.filter(_ != null).foreach { t =>
      val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ws.sliding(2).foreach {
        case Array(a, b) => bg((a, b)) = bg.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val total = uni.values.sum
    val expect = bg.toSeq.collect { case ((a, b), cab) if cab >= 5 =>
      val ratio = (BigInt(cab) * total) / (BigInt(uni(a)) * uni(b))
      (a, b, cab, uni(a), uni(b), ratio,
        2 * cab * 10000 / (uni(a) + uni(b)))
    }.filter(_._6 >= 1)
      .map { case (a, b, cab, ca, cb, ratio, dice) =>
        (a, b, cab, ca, cb, (ratio.bitLength - 1).toLong, dice) }
      .sortBy { case (a, b, _, _, _, pmi, dice) => (-pmi, -dice, a, b) }
      .take(30)
    val got = graft.queries.CurationQueries.t37Collocations(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expect, s"collocations diverge:\n${got.take(3).toSeq}\nvs ${expect.take(3)}")
  }

  test("t38: per-lang totals reproduce against the driver-side BPE kernel; fertility >= 1000") {
    import graft.functions.BpeTokenizer
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("lang"), col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (lang, g) =>
      lang -> ((g.length.toLong,
        g.map(d => Option(d._2).map(_.trim.toLowerCase.split("\\s+")
          .count(_.nonEmpty).toLong).getOrElse(0L)).sum,
        g.map(d => BpeTokenizer.countTokens(d._2).toLong).sum,
        g.map(_._3).sum))
    }
    val got = graft.queries.CurationQueries.t38Fertility(spark, sf()).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (nd, nw, nb, nc) = expect(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nw && r.getLong(3) == nb &&
        r.getLong(4) == nc, s"${r.getString(0)} totals diverge")
      // BPE never merges across words, so each word is >= 1 token
      assert(r.getAs[Long]("fertility_milli") >= 1000L || nw == 0L)
      assert(r.getAs[Long]("fertility_milli") == (if (nw > 0) nb * 1000 / nw else 0L))
    }
  }

  test("m12: sampled frame plan reproduces the synthesis geometry; geometry reader refuses tableless MP4s") {
    import graft.functions.VideoCodec
    val got = graft.queries.CurationQueries.m12FrameSample(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = spark.read.parquet(sf() + "/documents.parquet").count().toInt
    val expect = (0 until nDocs).flatMap { id =>
      val n = 10 + id % 41; val fs = 1 + id % 7; val ts = 10 + id % 20
      (0 until n).filter(_ % 5 == 0).map(i =>
        (id.toLong, i.toLong, 328L + i.toLong * fs, fs.toLong, i.toLong * 1000 / ts))
    }
    assert(got.toSeq == expect, s"frame plan diverges: ${got.take(3).toSeq} vs ${expect.take(3)}")
    // a container without sample tables must be refused, not guessed at
    assert(VideoCodec.frameGeometry(VideoCodec.mp4Bytes(30, 300, 2, 64)).isEmpty)
    assert(VideoCodec.frameGeometry(null).isEmpty)
    assert(VideoCodec.frameGeometry(Array[Byte](1, 2, 3)).isEmpty)
    // and the geometry round-trips the synthesis parameters exactly
    val g = VideoCodec.frameGeometry(
      VideoCodec.mp4BytesWithFrames(25, 12, nTracks = 1, nFrames = 12, frameSize = 3))
    assert(g.contains((25L, 12L, 3L, 328L, 1L)))
  }

  test("p03: the impact report reconciles with d05's own cluster assignment") {
    val rows = graft.queries.CurationQueries.p03DedupImpact(spark, sf()).collect()
    val d05 = graft.queries.LlmQueries.d05DupClusters(spark, sf())
      .select(col("doc_id"), col("is_canonical"))
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("source"))
    val bySource = docs.join(d05, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("before"),
        sum(col("is_canonical")).as("after"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getString(0)).toSet == bySource.keySet)
    rows.foreach { r =>
      val (before, after) = bySource(r.getString(0))
      assert(r.getAs[Long]("n_docs_before") == before)
      assert(r.getAs[Long]("n_docs_after") == after)
      assert(r.getAs[Long]("tokens_after") <= r.getAs[Long]("tokens_before"))
      assert(r.getAs[Long]("doc_drop_bp") ==
        (before - after) * 10000 / before)
    }
  }

  test("m13: VAD census reproduces under a driver-side decode + run-length recount") {
    import graft.functions.AudioCodec
    val got = graft.queries.CurationQueries.m13SilenceVad(spark, sf()).collect()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == docs.length)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, nChars) =>
      val smp = AudioCodec.pcmSamples16(
        AudioCodec.wavBytes(8000, 1, 16, (nChars % 400 + 50).toInt,
          seed = (id % 251).toInt)).get
      var nSil = 0L; var nRuns = 0L; var longest = 0L; var run = 0L
      smp.foreach { v =>
        if (math.abs(v) < 2048) {
          run += 1; nSil += 1
          if (run > longest) longest = run
          if (run == 6) nRuns += 1
        } else run = 0
      }
      val r = byId(id)
      assert(r.getAs[Long]("n_samples") == smp.length.toLong &&
        r.getAs[Long]("n_silent") == nSil && r.getAs[Long]("n_runs") == nRuns &&
        r.getAs[Long]("longest_run") == longest, s"doc $id VAD census diverges")
      assert(r.getAs[Long]("silent_bp") == nSil * 10000 / smp.length)
      assert(r.getAs[Long]("longest_run") <= r.getAs[Long]("n_silent"))
    }
    // the fixture must actually exercise run detection somewhere
    assert(got.exists(_.getAs[Long]("n_runs") > 0), "no qualifying silence runs in fixture")
  }

  test("p02: tiers partition each source and shares telescope to ~10000 bp") {
    val rows = CurationQueries.p02QualityTiers(spark, sf()).collect()
    val valid = Set("too_short", "repetitive", "complex", "keep")
    assert(rows.forall(r => valid(r.getString(1))))
    val nDocs = spark.read.parquet(sf() + "/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document must land in exactly one (source, tier) cell")
    rows.groupBy(_.getString(0)).foreach { case (src, grp) =>
      val bp = grp.map(_.getAs[Long]("share_bp")).sum
      assert(bp > 10000 - grp.length && bp <= 10000, s"$src share sum $bp")
    }
  }
}
