package graft

import org.apache.spark.sql.functions._
import graft.queries.ProfileQueries

/** Invariant + plan-shape pins for the round-8 corpus-profiling family
  * (t29–t32, d26, g08, s09). The cross-engine value check is the driver's
  * DuckDB oracle; these specs pin the claims the oracle can't see — the
  * internal consistency of the integer ratios, the semantic contracts
  * (non-adjacency, radius, span multiplicity), and the physical plans the
  * scale arguments depend on. */
class ProfileQueriesSpec extends SparkSpec {

  test("t29: ratios are consistent with counts and bounded by 10000") {
    val rows = ProfileQueries.t29LexicalDiversity(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ttr, hbp) = (r.getLong(4), r.getLong(5))
      assert(typ <= tok && hap <= typ, s"count ordering broken: $r")
      if (tok > 0) {
        assert(ttr == typ * 10000 / tok && hbp == hap * 10000 / tok)
        assert(ttr >= 0 && ttr <= 10000 && hbp <= ttr * 1 + 10000)
      } else assert(ttr == 0 && hbp == 0)
    }
  }

  test("t30: every doc appears once; max <= total; mean recomputes") {
    val df = ProfileQueries.t30SentenceStats(spark, sf())
    val n = df.count()
    assert(n == spark.read.parquet(s"${sf()}/documents.parquet").count())
    df.collect().foreach { r =>
      val (ns, nw, mx, mean) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mx <= nw && (ns == 0 || mx >= nw / ns))
      if (ns > 0) assert(mean == nw * 1000 / ns) else assert(mean == 0)
    }
  }

  test("t31: FK grade recomputed in BigInt — no intermediate wrap") {
    ProfileQueries.t31Readability(spark, sf()).collect().foreach { r =>
      val (w, s, y, fk) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (w > 0 && s > 0) {
        val exp = (BigInt(390) * (BigInt(w) * 1000 / s) +
          BigInt(11800) * (BigInt(y) * 1000 / w)) / 1000 - 15590
        assert(BigInt(fk) == exp, s"fk mismatch for $r")
      } else assert(fk == 0)
    }
  }

  test("t32: exactly <=10 ranks per lang, counts non-increasing in rank") {
    val rows = ProfileQueries.t32CharTrigramProfile(spark, sf())
      .collect().groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.length <= 10)
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      val cnts = byRank.map(_.getLong(3)).toSeq
      assert(cnts == cnts.sorted.reverse, "counts not non-increasing")
      assert(rs.forall(_.getString(2).length == 3))
    }
  }

  test("t32/g08: per-group top-k gets map-side WindowGroupLimit") {
    for (q <- Seq("t32_char_trigram_profile", "g08_link_prediction")) {
      val p = SparkEntry.queries(q)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"), s"$q rank-filter pushdown lost:\n${p.take(2000)}")
    }
  }

  test("d26: every reported span really occurs in >=2 distinct docs") {
    val spans = ProfileQueries.d26RepeatedSpans(spark, sf()).collect()
    assert(spans.nonEmpty, "fixture corpus should contain cross-doc repeats")
    val grams = spans.map(_.getString(0)).toSeq
    // recount from scratch with an independent formulation (per-doc distinct)
    val recount = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), explode(graft.operators.Dedupe.shingles(col("text"), 8)).as("g"))
      .filter(col("g").isin(grams: _*))
      .select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spans.foreach { r =>
      assert(recount(r.getString(0)) == r.getLong(1) && r.getLong(1) >= 2,
        s"doc-frequency mismatch: $r")
      assert(r.getLong(2) >= r.getLong(1), "n_occ < n_docs")
    }
  }

  test("g08: predictions are non-adjacent, cn matches a recount") {
    val preds = ProfileQueries.g08LinkPrediction(spark, sf()).collect()
    assert(preds.nonEmpty)
    // rebuild the undirected edge set independently
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("a").join(li.as("b"), Seq("ok"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .filter(col("u") =!= col("v")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    preds.foreach { r =>
      val (s0, cand, cn) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(!pairs.contains((s0, cand)), s"predicted an existing edge: $r")
      val common = adj.getOrElse(s0, Set.empty) & adj.getOrElse(cand, Set.empty)
      assert(common.size.toLong == cn, s"cn mismatch: $r vs ${common.size}")
    }
  }

  test("s09: radius contract — matches >= threshold, non-matches below") {
    val got = ProfileQueries.s09RangeSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // brute-force recount against the s01 kernel on the driver
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (q <- 0L to 2L; (id, v) <- emb if id != q) {
      val s0 = cos(emb(q), v)
      if (s0 >= 0.2500001) assert(got.contains((q, id)), s"missing ($q,$id) score $s0")
      if (s0 < 0.2499999) assert(!got.contains((q, id)), s"spurious ($q,$id) score $s0")
    }
  }

  test("t33: merges match an independent driver-side BPE trainer") {
    val got = ProfileQueries.t33BpeTrain(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length == 5 && got.map(_._1).toSeq == (1L to 5L).toSeq)
    // independent recount: plain Scala maps, same separator-consuming
    // literal replace as both engines
    val words = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text")).collect().iterator
      .flatMap(r => Option(r.getString(0)).getOrElse("").toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[String, (Long, String)] = words.map { case (w, f) =>
      w -> (f, w.map(_.toString).mkString(" ") + " </w>")
    }
    for (round <- 1 to 5) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      segs.values.foreach { case (f, seg) =>
        val syms = seg.split(" ")
        syms.indices.dropRight(1).foreach { i =>
          val p = syms(i) + " " + syms(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (bestPair, bestCnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val expect = got(round - 1)
      assert((expect._2, expect._4) == (bestPair, bestCnt),
        s"round $round: engine ${expect._2}/${expect._4} vs driver $bestPair/$bestCnt")
      assert(expect._3 == bestPair.replace(" ", ""))
      val merged = bestPair.replace(" ", "")
      segs = segs.view.mapValues { case (f, seg) =>
        (f, (" " + seg + " ").replace(" " + bestPair + " ", " " + merged + " ").trim)
      }.toMap
    }
  }

  test("g09: HITS recomputed in driver-side BigInt — scores and ranks exact") {
    val got = ProfileQueries.g09Hits(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.count(_._1 == "hub") == 20 && got.count(_._1 == "authority") == 20)
    // rank-1 on each side is the arg-max row: re-scaled to exactly 10^6
    got.filter(_._2 == 1L).foreach { r => assert(r._4 == 1000000L, s"rank-1 not S: $r") }
    // independent recount (BigInt, so a wrap in the engine would surface here)
    val ords = spark.read.parquet(s"${sf()}/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .flatMap(r => ords.get(r.getLong(0)).map(c => (c, r.getLong(1)))).distinct
    // round-13 semantics: 3 UN-normalized exact SIMULTANEOUS rounds
    // (all-ones seeds on both sides; aK from h(K-1) AND hK from a(K-1) —
    // power iteration on [[0,E],[E^T,0]]), one truncating 10^6
    // normalization per side at the end
    val S = BigInt(1000000)
    var h = edges.map(_._1).distinct.map(_ -> BigInt(1)).toMap
    var a = edges.map(_._2).distinct.map(_ -> BigInt(1)).toMap
    for (_ <- 1 to 3) {
      val an = edges.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val hn = edges.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      a = an; h = hn
    }
    val am = a.values.max; val hm = h.values.max
    a = a.view.mapValues(s0 => s0 * S / am).toMap
    h = h.view.mapValues(s0 => s0 * S / hm).toMap
    def top20(m: Map[Long, BigInt]) =
      m.toSeq.sortBy { case (id, s0) => (-s0, id) }.take(20)
    val expHubs = top20(h); val expAuth = top20(a)
    got.filter(_._1 == "hub").sortBy(_._2).zip(expHubs).foreach {
      case ((_, _, id, sc), (eid, esc)) => assert(id == eid && BigInt(sc) == esc)
    }
    got.filter(_._1 == "authority").sortBy(_._2).zip(expAuth).foreach {
      case ((_, _, id, sc), (eid, esc)) => assert(id == eid && BigInt(sc) == esc)
    }
  }

  test("q77: TWAP recomputes from an independent driver-side BigInt fold") {
    val got = ProfileQueries.q77Twap(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    val ev = graft.core.Tables.tsNanos(
        spark.read.parquet(s"${sf()}/events.parquet"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2) / 1000, // us
        math.floor(r.getDouble(3) * 100).toLong))
    val byKey = ev.groupBy(e => (e._1, e._3 / 86400000000L))
    assert(byKey.size == got.size)
    byKey.foreach { case ((typ, day), rows) =>
      val sorted = rows.sortBy(e => (e._3, e._2))
      var wsum = BigInt(0); var dtot = BigInt(0)
      for (i <- sorted.indices) {
        val nextUs = if (i + 1 < sorted.length) sorted(i + 1)._3 else (day + 1) * 86400000000L
        val durMs = (nextUs - sorted(i)._3) / 1000
        wsum += BigInt(sorted(i)._4) * durMs; dtot += durMs
      }
      val (n, tot, twap) = got((typ, day))
      assert(n == rows.length && BigInt(tot) == dtot)
      assert(BigInt(twap) == (if (dtot > 0) wsum / dtot else BigInt(0)),
        s"($typ,$day): twap mismatch")
    }
  }

  test("dq08: leaked-span counts match a driver-side recount; fixture leaks") {
    val got = ProfileQueries.dq08SplitLeakage(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got.nonEmpty, "fixture should have cross-split span leakage")
    // independent recount
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long): Int =
      (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100).toInt
    def splitOf(id: Long): String = {
      val b = bucket(id); if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val spans = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val ws = Option(r.getString(1)).getOrElse("").toLowerCase.trim.split("\\s+")
        val sp = splitOf(r.getLong(0))
        if (ws.length >= 8) ws.sliding(8).map(g => (sp, g.mkString(" "))).toSeq else Seq.empty
      }.distinct
    val bySplit = spans.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (a <- bySplit.keys; b <- bySplit.keys if a < b) {
      val n = (bySplit(a) & bySplit(b)).size.toLong
      assert(got.getOrElse((a, b), 0L) == n, s"($a,$b): ${got.get((a, b))} vs $n")
    }
  }

  test("t35: held-out only, backoff counted, surprisal recomputes in BigInt") {
    val got = ProfileQueries.t35BackoffSurprisal(spark, sf()).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    got.foreach { case (id, _) => assert(splitOf(id) != "train", s"train doc $id scored") }
    // independent model + scorer in plain Scala / BigInt
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("").toLowerCase.trim.split("\\s+").filter(_.nonEmpty)))
    def log2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val trainWs = docs.filter(d => splitOf(d._1) == "train")
    val uni = trainWs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = uni.values.sum
    val bgc = trainWs.flatMap(_._2.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val w1c = bgc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    docs.filter(d => splitOf(d._1) != "train" && d._2.length >= 2).foreach { case (id, ws) =>
      var n = 0L; var nb = 0L; var sum = BigInt(0)
      ws.sliding(2).filter(_.length == 2).foreach { a =>
        n += 1
        bgc.get((a(0), a(1))) match {
          case Some(c) => sum += log2(w1c(a(0)) / c)
          case None =>
            nb += 1
            sum += (uni.get(a(1)) match {
              case Some(cw) => 1 + log2(t / cw)
              case None => 2 + log2(t)
            })
        }
      }
      val (gn, gb, gs, gm) = got.toMap.apply(id)
      assert(gn == n && gb == nb && BigInt(gs) == sum, s"doc $id")
      assert(gm == gs * 1000 / gn)
    }
  }

  test("s10: label predicate pushed to the parquet scan; results all pass it") {
    val df = SparkEntry.queries("s10_filtered_ann")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("In(label"),
      s"metadata filter not pushed to the scan:\n${p.take(2000)}")
    val labels = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(Set(0, 2, 5)(labels(r.getLong(1))),
      s"result ${r.getLong(1)} fails the metadata predicate"))
    // pre-filter, not post-filter: every query must still get full k
    rows.groupBy(_.getLong(0)).values.foreach(g => assert(g.size == 5))
  }

  test("m10: pcmSamples16 agrees with the JDK's own WAV reader") {
    import graft.functions.AudioCodec
    for (seed <- Seq(0, 17, 250); n <- Seq(50, 137)) {
      val wav = AudioCodec.wavBytes(8000, 1, 16, n, seed)
      val got = AudioCodec.pcmSamples16(wav).get
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val raw = ais.readAllBytes()
      val exp = (0 until raw.length / 2).map { k =>
        val v = (raw(2 * k) & 0xff) | ((raw(2 * k + 1) & 0xff) << 8)
        if (v >= 32768) v - 65536 else v
      }
      assert(got.toSeq == exp, s"seed=$seed n=$n: JDK disagreement")
    }
  }

  test("m09/m10 kernels never throw on malformed payloads") {
    import graft.functions.AudioCodec
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(42)
    val wav = AudioCodec.wavBytes(8000, 1, 16, 60, 3)
    val png = graft.functions.ImageCodec.pngEncodeRgb(18, 16, new Array[Byte](18 * 16 * 3))
    for (_ <- 1 to 300) {
      def mutate(b: Array[Byte]): Array[Byte] = {
        val c = b.clone()
        for (_ <- 0 to rnd.nextInt(8)) c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        if (rnd.nextBoolean()) c.take(rnd.nextInt(c.length + 1)) else c
      }
      AudioCodec.pcmSamples16(mutate(wav)) // must not throw
      Multimodal.dHashSegments(mutate(png)) // must not throw
    }
    assert(AudioCodec.pcmSamples16(null).isEmpty)
    assert(AudioCodec.pcmSamples16(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("m10: segment means recompute from the ramp arithmetic") {
    val got = ProfileQueries.m10AudioEnergy(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    docs.foreach { case (id, nc) =>
      val n = (nc % 400 + 50).toInt; val seed = (id % 251).toInt
      val smp = (0 until n).map { k =>
        val v = ((seed + 2 * k) % 256) + ((seed + 2 * k + 1) % 256) * 256
        if (v >= 32768) v - 65536 else v
      }
      for (g <- 0 until 8) {
        val lo = g * n / 8; val hi = (g + 1) * n / 8
        val seg = smp.slice(lo, hi)
        val exp = (seg.size.toLong, seg.map(v => math.abs(v).toLong).sum / seg.size)
        assert(got((id, g.toLong)) == exp, s"doc $id seg $g")
      }
    }
  }

  test("t34: scores recompute from an independent driver-side tally") {
    val got = ProfileQueries.t34SourceDivergence(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("source"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).getOrElse("").toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val t = toks.length.toLong
    val g = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val top = g.toSeq.sortBy { case (w, c) => (-c, w) }.take(200)
    val sTot = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val obs = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (src, nTok, score) =>
      assert(nTok == sTot(src))
      val exp = top.map { case (w, gc) =>
        val obsBp = obs.getOrElse((src, w), 0L) * 10000 / sTot(src)
        val expBp = gc * 10000 / t
        (obsBp - expBp) * (obsBp - expBp) / (expBp + 1)
      }.sum
      assert(score == exp, s"$src: engine $score vs driver $exp")
    }
  }

  test("m09: dHash through the real PNG codec equals the raw pixel math") {
    import graft.functions.ImageCodec
    import graft.operators.Multimodal
    for (docId <- Seq(0L, 7L, 8L, 123L)) {
      val w = 18; val h = 16
      val base = docId / 8; val pert = docId % 8
      val rgb = new Array[Byte](w * h * 3)
      def grayAt(x: Int, y: Int): Int = {
        var r = (x * x + 3 * y * base + 7 * base * base + 11 * y) % 256
        if ((x + 18 * y) % 29 == 0) r = (r + pert) % 256
        val g = (y * y + 5 * x * base + 13 * base) % 256
        val b = (x * y + 17 * base + 19 * x) % 256
        ((r + g + b) / 3).toInt
      }
      for (y <- 0 until h; x <- 0 until w) {
        var r = (x * x + 3 * y * base + 7 * base * base + 11 * y) % 256
        if ((x + 18 * y) % 29 == 0) r = (r + pert) % 256
        val g = (y * y + 5 * x * base + 13 * base) % 256
        val b = (x * y + 17 * base + 19 * x) % 256
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
      }
      // expected segments straight from the arithmetic — no codec involved
      val m = Array.ofDim[Int](8, 9)
      for (j <- 0 until 8; i <- 0 until 9)
        m(j)(i) = (grayAt(2 * i, 2 * j) + grayAt(2 * i + 1, 2 * j)
          + grayAt(2 * i, 2 * j + 1) + grayAt(2 * i + 1, 2 * j + 1)) / 4
      val exp = new Array[Int](4)
      for (b <- 0 until 64; j = b / 8; i = b % 8)
        if (m(j)(i + 1) > m(j)(i)) exp(b / 16) |= 1 << (b % 16)
      val got = Multimodal.dHashSegments(ImageCodec.pngEncodeRgb(w, h, rgb))
      assert(got.exists(_.sameElements(exp)), s"doc $docId: codec path diverges")
    }
  }

  test("m09: recovers exactly the engineered clusters, no product join") {
    val pairs = ProfileQueries.m09PhashPairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    // fixture contract: near-dups are exactly the same-base pairs
    pairs.foreach { case (a, b, hm) =>
      assert(a / 8 == b / 8, s"inter-cluster pair reported: ($a,$b)")
      assert(hm <= 3)
    }
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    val expected = (0L until nDocs).groupBy(_ / 8).values
      .map(c => c.size.toLong * (c.size - 1) / 2).sum
    assert(pairs.length.toLong == expected,
      s"expected $expected intra-cluster pairs, got ${pairs.length}")
    val p = SparkEntry.queries("m09_phash_pairs")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "phash pairing degraded to all-pairs")
  }

  test("s09: corpus side never shuffles — broadcast join, no exchange before filter") {
    val p = SparkEntry.queries("s09_range_search")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"query set should broadcast:\n${p.take(2000)}")
  }
}
