package graft

import graft.queries.SelectionQueries
import org.apache.spark.sql.functions._

/** Behavior contracts for the round-11 data-selection/layout family — each
  * test re-derives the query's arithmetic with an independent driver-side
  * (plain-Scala, shift-based) implementation, the OpsQueriesSpec
  * discipline: the DuckDB hash proves cross-engine agreement, these prove
  * the shared formula is the INTENDED one.
  */
class SelectionQueriesSpec extends SparkSpec {

  // ---- independent driver-side mirrors (no graft.operators code) ----

  private def md5h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def ilog16Ref(x: Long): Long = {
    require(x >= 1)
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    16L * msb + (x * 16) / (1L << msb) - 16
  }

  private def wordsOf(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  private def featuresOf(text: String): Seq[String] = {
    val w = wordsOf(text)
    w.filter(_.nonEmpty).toSeq ++
      (if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil)
  }

  test("ilog16: the engine's power(2,msb) form equals the shift form for all magnitudes") {
    // the engine uses CAST(power(2, msb) AS BIGINT) — IEEE-exact for
    // integral exponents; pin it against 1L << msb at every msb boundary
    // and its neighbours up to 2^58 (the x·16 intermediate overflows a
    // BIGINT from x = 2^59, which is the documented domain cap)
    val xs = (0 to 58).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1))
      .filter(x => x >= 1 && x <= (1L << 58) + 1)
    val df = spark.createDataFrame(
      xs.map(x => Tuple1(x))).toDF("x")
    val engine = df.selectExpr(
      "x",
      "16 * (length(bin(x)) - 1) + x * 16 div CAST(power(2, length(bin(x)) - 1) AS BIGINT) - 16 AS il")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(engine(x) == ilog16Ref(x), s"ilog16 mismatch at x=$x")
    }
  }

  test("t41: full driver-side DSIR recount reproduces the top-25 exactly") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val B = 256
    val perDoc = docs.map { case (id, src, lang, text) =>
      val c = featuresOf(text).groupBy(f => md5h32(f) % B)
        .map { case (b, fs) => b -> fs.size.toLong }
      (id, src, lang, c)
    }
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, _, lang, c) =>
      c.foreach { case (b, n) =>
        cr(b) += n; if (lang == "en") ct(b) += n
      }
    }
    val tr = cr.values.sum; val tt = ct.values.sum
    val k = ilog16Ref(tr + B) - ilog16Ref(tt + B)
    val scored = perDoc.map { case (id, src, lang, c) =>
      val score = c.map { case (b, n) =>
        n * (ilog16Ref(ct(b) + 1) - ilog16Ref(cr(b) + 1) + k)
      }.sum
      (id, src, lang, c.values.sum, score)
    }
    val expected = scored.sortBy { case (id, _, _, _, sc) => (-sc, id) }.take(25)
    val got = SelectionQueries.t41DsirWeights(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq)
  }

  test("q83: estimate and error recount from a driver-side fold; sample is a subset") {
    val rows = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byFlag = rows.groupBy(_._1)
    val expected = byFlag.map { case (flag, rs) =>
      val cents = rs.map(t => math.floor(t._4 * 100).toLong)
      val sampleCents = rs.filter(t => md5h32(s"${t._2}-${t._3}") % 16 == 0)
        .map(t => math.floor(t._4 * 100).toLong)
      val tru = cents.sum; val est = sampleCents.sum * 16
      (flag, (rs.size.toLong, tru, sampleCents.size.toLong, est,
        math.abs(est - tru) * 10000 / tru))
    }
    val got = SelectionQueries.q83AqpEstimate(spark, sf()).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e, s"flag ${r.getString(0)}")
    }
  }

  test("p05: layout cannot change WHAT matches; file counts agree; scan bounds matching") {
    // sf0.01: 500 docs → 8 files per layout, so the theorems bite
    val rows = SelectionQueries.p05SkippingIndex(spark, sf("sf0.01")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 6)
    val byThreshold = rows.groupBy(_._2)
    byThreshold.foreach { case (k, rs) =>
      assert(rs.length == 2)
      // rows_matching is a property of the DATA, not the layout
      assert(rs.map(_._6).distinct.length == 1, s"matching differs at K=$k")
      // both layouts cut ceil(n/64) files
      assert(rs.map(_._3).distinct.length == 1, s"file count differs at K=$k")
      rs.foreach { case (layout, _, nf, skipped, scanned, matching, skipBp) =>
        assert(scanned >= matching, s"$layout K=$k scans fewer rows than match")
        assert(skipped <= nf && skipBp == skipped * 10000 / nf)
      }
    }
    // the decision signal: clustering never skips FEWER files on this
    // monotone single-column predicate family
    byThreshold.foreach { case (k, rs) =>
      val m = rs.map(t => t._1 -> t._4).toMap
      assert(m("clustered") >= m("ingest"), s"clustered loses at K=$k")
    }
  }

  test("m14: quality histogram recounts from the synthesis formulas (never parsing a JPEG)") {
    val baseLuma = Array(
      16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
    val sumBase = baseLuma.sum
    val ids = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val estQ = ids.map { id =>
      val q = (5 + (id * 7) % 91).toInt
      val scale = if (q < 50) 5000 / q else 200 - 2 * q
      val sumT = baseLuma.map(b => math.max(1, math.min(255, (b * scale + 50) / 100))).sum
      val se = (100L * sumT + sumBase / 2) / sumBase
      if (se <= 100) (200 - se) / 2 else 5000 / se
    }
    val expected = estQ.groupBy(_ / 10).toSeq.sortBy(_._1).map { case (dec, qs) =>
      (dec, qs.length.toLong, qs.min, qs.max)
    }
    val got = SelectionQueries.m14JpegQuality(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  test("dq13: bit-geometric noise recounts from md5 bits; the xor run-length formula matches a loop") {
    // the closed form m = flog2((x ^ (x+1)) + 1) - 1 vs a literal bit loop
    def trailingOnesLoop(x: Long): Int = {
      var m = 0; var v = x
      while ((v & 1L) == 1L) { m += 1; v >>= 1 }
      m
    }
    def trailingOnesFormula(x: Long): Int =
      63 - java.lang.Long.numberOfLeadingZeros((x ^ (x + 1)) + 1) - 1
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10000) {
      val x = rnd.nextLong() & 0x7FFFFFFFL
      assert(trailingOnesFormula(x) == trailingOnesLoop(x), s"x=$x")
    }
    // full driver recount of the released table
    val got = SelectionQueries.dq13DpRelease(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.nonEmpty)
    val cust = spark.read.parquet(sf() + "/customer.parquet")
      .select("c_mktsegment", "c_nationkey").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val nat = spark.read.parquet(sf() + "/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val counts = cust.map { case (seg, nk) => (seg, nat(nk)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.length == counts.size)
    got.foreach { case ((seg, nation), (nTrue, noise, released, absErr)) =>
      assert(nTrue == counts((seg, nation)))
      val h = md5h32(s"$seg|$nation")
      val expNoise = (if ((h & 1L) == 1L) 1 else -1) * trailingOnesLoop(h >> 1)
      assert(noise == expNoise, s"($seg,$nation)")
      assert(released == math.max(0L, nTrue + noise) && absErr == math.abs(released - nTrue))
    }
    // geometric(1/2) sanity: on this fixture's ~125 classes, about half
    // the draws must be zero-noise (loose 3-sigma band)
    val zeros = got.count(_._2._2 == 0L)
    assert(zeros > got.length / 4 && zeros < got.length * 3 / 4)
  }

  test("s15: balance audit conserves the corpus and its formulas are self-consistent") {
    val rows = SelectionQueries.s15IvfBalance(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 8, "one row per IVF partition, empties included")
    val nCorpus = spark.read.parquet(sf() + "/embeddings.parquet").count()
    val total = rows.map(_._2).sum
    assert(total == nCorpus, "every vector must be assigned exactly once")
    val mx = rows.map(_._2).max
    val balance = mx * rows.length * 1000 / total
    rows.foreach { case (part, n, shareBp, balMilli, nEmpty, retrain) =>
      assert(shareBp == n * 10000 / total)
      assert(balMilli == balance, s"part $part")
      assert(nEmpty == rows.count(_._2 == 0L))
      assert(retrain == (if (balance > 2000) 1L else 0L))
    }
    assert(balance >= 1000, "max cannot be below the mean")
  }

  test("t42: driver-side bigram coverage recount reproduces the curve exactly") {
    val texts = spark.read.parquet(sf() + "/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { t =>
      val w = wordsOf(t)
      if (w.length >= 2) w.sliding(2).foreach(p => counts(p.mkString(" ")) += 1)
    }
    val ranked = counts.toSeq.sortBy { case (bg, c) => (-c, bg) }
    val total = ranked.map(_._2).sum
    val expected = Seq(50, 200, 800).map { k =>
      val cov = ranked.take(k).map(_._2).sum
      (k.toLong, ranked.size.toLong, cov, total, cov * 10000 / total)
    }
    val got = SelectionQueries.t42VocabCoverage(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expected)
    // coverage is monotone in vocab size
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("t45: plain-Scala Kneser-Ney recount; probabilities stay in (0, 1]") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val occ = scala.collection.mutable.Map
      .empty[(String, String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, text) =>
      val ws = wordsOf(text).filter(_.nonEmpty)
      if (ws.length >= 2) ws.sliding(2).foreach { p =>
        occ((src, p(0), p(1))) += 1
      }
    }
    val cuw = occ.groupBy { case ((_, u, w), _) => (u, w) }
      .map { case (k, m) => k -> m.values.sum }
    val cu = cuw.groupBy(_._1._1).map { case (u, m) => u -> m.values.sum }
    val n1u = cuw.groupBy(_._1._1).map { case (u, m) => u -> m.size.toLong }
    val n1w = cuw.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tt = cuw.size.toLong
    val s16 = cuw.map { case ((u, w), c) =>
      val num = math.max(4 * c - 3, 0L) * tt + 3 * n1u(u) * n1w(w)
      val den = 4 * cu(u) * tt
      assert(num >= 1 && num <= den, s"KN probability out of (0,1] at ($u,$w)")
      (u, w) -> (ilog16Ref(den) - ilog16Ref(num))
    }
    val expected = occ.toSeq.groupBy(_._1._1).map { case (src, rows) =>
      val n = rows.map(_._2).sum
      val nSingle = rows.filter { case ((_, u, w), _) => cuw((u, w)) == 1L }
        .map(_._2).sum
      val sumS = rows.map { case ((_, u, w), c) => c * s16((u, w)) }.sum
      (src, n, nSingle, sumS, sumS * 1000 / (16 * n))
    }.toSeq.sortBy(_._1)
    val got = SelectionQueries.t45KneserNey(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("s18: driver-side exact-NN recount; eval side covered; train side only") {
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ev = vecs.filter(_._1 % 50 == 0)
    val tr = vecs.filter(_._1 % 50 != 0)
    // index-order left fold in double — the engine/oracle parity contract
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = ev.map { case (eid, qv) =>
      val (nid, score) = tr.map { case (tid, tv) => (tid, cos(tv, qv)) }
        .minBy { case (tid, sc) => (-sc, tid) }
      val milli = math.floor(score * 1000).toLong
      (eid, nid, milli, if (milli >= 950) 1 else 0)
    }.sortBy(_._1).toSeq
    val got = SelectionQueries.s18SemanticContamination(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == expected)
    assert(got.map(_._1) == ev.map(_._1).sorted.toSeq, "every eval item is audited")
    assert(got.forall(_._2 % 50 != 0), "neighbors come from the train side only")
  }

  test("s19: driver-side margin-mining recount (LSH-gated candidates, rank-order folds, forward top-1, global top-20) + exact-formulation retention") {
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // the engine's LSH tables mirrored driver-side: sign of the SAME
    // left-to-right double fold against Similarity.lshPlanes(64, 3, 42+t)
    val planes = (0 until 4).map(t =>
      graft.operators.Similarity.lshPlanes(64, 3, 42L + t))
    def bucket(v: Array[Float], t: Int): String =
      planes(t).map { p =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * p(i); i += 1 }
        if (s >= 0) "1" else "0"
      }.mkString
    def collides(a: Array[Float], b: Array[Float]): Boolean =
      (0 until 4).exists(t => bucket(a, t) == bucket(b, t))
    val langs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val xs = vecs.filter { case (id, _) => langs.get(id).contains("en") }
    val ys = vecs.filter { case (id, _) => langs.get(id).contains("de") }
    // both formulations share the same exact pairwise cosines …
    val c = (for ((xid, xv) <- xs; (yid, yv) <- ys)
      yield (xid, yid) -> cosRef(xv, yv)).toMap
    // … and differ only in the candidate set: full product vs LSH-gated
    val fullCand: Set[(Long, Long)] = c.keySet
    val gateCand: Set[(Long, Long)] =
      (for ((xid, xv) <- xs; (yid, yv) <- ys if collides(xv, yv))
        yield (xid, yid)).toSet
    assert(gateCand.subsetOf(fullCand) && gateCand.nonEmpty)

    def mine(cand: Set[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      def kAvg(grp: Map[Long, Seq[(Long, Double)]]): Map[Long, Double] =
        grp.map { case (k, lst) =>
          k -> lst.sortBy { case (o, sc) => (-sc, o) }.take(4)
            .foldLeft(0.0) { case (a, (_, sc)) => a + sc } / 4.0
        }
      val ax = kAvg(cand.toSeq.map { case (x, y) => (x, (y, c((x, y)))) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
      val ay = kAvg(cand.toSeq.map { case (x, y) => (y, (x, c((x, y)))) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
      val nominations = cand.groupBy(_._1).toSeq.map { case (xid, ps) =>
        val (yid, cc, mg) = ps.toSeq.map { case (_, yid) =>
          val cc = c((xid, yid))
          (yid, cc, cc * 2.0 / (ax(xid) + ay(yid)))
        }.minBy { case (yid, _, mg) => (-mg, yid) }
        (xid, yid, cc, mg)
      }
      nominations.sortBy { case (xid, _, _, mg) => (-mg, xid) }.take(20)
        .map { case (xid, yid, cc, mg) =>
          (xid, yid, math.floor(cc * 1000).toLong, math.floor(mg * 1000).toLong)
        }
    }
    val expected = mine(gateCand)
    val got = SelectionQueries.s19BitextMining(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.length == got.length,
      "forward mining: one nomination per en doc")
    // retention vs the exact-cross-join formulation (measured on this
    // fixture — the blocking-quality audit the gate ships with; isotropic
    // embeddings are the worst case for ANY gating, see the scaladoc)
    val exactTop = mine(fullCand).map(r => (r._1, r._2)).toSet
    val gateTop = got.map(r => (r._1, r._2)).toSet
    val kept = (exactTop & gateTop).size
    info(s"s19 gate: |cand| = ${gateCand.size}/${fullCand.size} " +
      f"(${gateCand.size.toDouble / fullCand.size}%.3f), " +
      s"exact-top-20 retention = $kept/20")
    // measured on this fixture: 9/20 at 0.419 candidate fraction — the
    // isotropy ceiling (the top-20 is denominator-sensitive: missing ANY
    // true top-4 neighbor shifts a k-NN mean and reshuffles the ranking;
    // on real bitext embeddings, where translation pairs sit far above
    // the random-cosine band, the same gate retains ~everything)
    assert(kept >= 8, s"gate retention collapsed below the measured floor (got $kept)")
  }

  test("s19 gate robustness: retention/candidate-fraction sweep over LSH " +
    "configs, isotropic fixture AND clustered synthetic (the d27 discipline)") {
    // The round-12 gate shipped with retention measured at exactly ONE
    // configuration on ONE (worst-case, isotropic) fixture. This sweep
    // measures the gate at three configs on both regimes, so the 4x3
    // choice is justified by a table, not trusted (r12 verdict item 3;
    // reference posture: create_lancedb_index.py tunes its index).
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // exact margin-mining recount (the s19 semantics) over any candidate set
    def mineTop(cand: Set[(Long, Long)],
        c: Map[(Long, Long), Double]): Set[(Long, Long)] = {
      def kAvg(grp: Map[Long, Seq[(Long, Double)]]): Map[Long, Double] =
        grp.map { case (k, lst) =>
          k -> lst.sortBy { case (o, sc) => (-sc, o) }.take(4)
            .foldLeft(0.0) { case (a, (_, sc)) => a + sc } / 4.0
        }
      val ax = kAvg(cand.toSeq.map { case (x, y) => (x, (y, c((x, y)))) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
      val ay = kAvg(cand.toSeq.map { case (x, y) => (y, (x, c((x, y)))) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
      cand.groupBy(_._1).toSeq.map { case (xid, ps) =>
        val (yid, mg) = ps.toSeq.map { case (_, yid) =>
          (yid, c((xid, yid)) * 2.0 / (ax(xid) + ay(yid)))
        }.minBy { case (yid, mg) => (-mg, yid) }
        (xid, yid, mg)
      }.sortBy { case (xid, _, mg) => (-mg, xid) }.take(20)
        .map { case (xid, yid, _) => (xid, yid) }.toSet
    }
    // gate collision mirrored from Similarity.lshTables: table t uses
    // lshPlanes(dim, nPlanes, 42 + t) — larger nTables EXTENDS the seed
    // sequence, so candidate sets are nested along the tables axis
    def gate(xs: Seq[(Long, Array[Float])], ys: Seq[(Long, Array[Float])],
        dim: Int, nTables: Int, nPlanes: Int): Set[(Long, Long)] = {
      val planes = (0 until nTables).map(t =>
        graft.operators.Similarity.lshPlanes(dim, nPlanes, 42L + t))
      def bucket(v: Array[Float], t: Int): String =
        planes(t).map { p =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * p(i); i += 1 }
          if (s >= 0) "1" else "0"
        }.mkString
      (for ((xid, xv) <- xs; (yid, yv) <- ys
            if (0 until nTables).exists(t => bucket(xv, t) == bucket(yv, t)))
        yield (xid, yid)).toSet
    }
    def sweep(tag: String, xs: Seq[(Long, Array[Float])],
        ys: Seq[(Long, Array[Float])], dim: Int): Map[(Int, Int), (Int, Double)] = {
      val c = (for ((xid, xv) <- xs; (yid, yv) <- ys)
        yield (xid, yid) -> cosRef(xv, yv)).toMap
      val exactTop = mineTop(c.keySet, c)
      Seq((4, 3), (8, 3), (8, 4)).map { case (nt, np) =>
        val g = gate(xs, ys, dim, nt, np)
        val frac = g.size.toDouble / c.size
        val kept = (mineTop(g, c) & exactTop).size
        info(f"s19 sweep [$tag] tables=$nt planes=$np: cand frac $frac%.3f, " +
          s"exact-top-20 retention $kept/20")
        (nt, np) -> (kept, frac)
      }.toMap
    }

    // regime 1: the fixture (isotropic — documented worst case for ANY gate)
    val langs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val fx = sweep("isotropic fixture",
      vecs.filter { case (id, _) => langs.get(id).contains("en") }.toSeq,
      vecs.filter { case (id, _) => langs.get(id).contains("de") }.toSeq, 64)

    // regime 2: clustered synthetic bitext — translation pairs sit far
    // above the random-cosine band (5 topic clusters; de_i = en_i + noise,
    // pair cosine ~0.95+), the regime the production recipe assumes
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val dim = 64
    val centers = Seq.fill(5)(unit(dim))
    val bases = (0 until 60).map { i =>
      val ce = centers(i % 5); val nz = unit(dim)
      ce.zip(nz).map { case (a, b) => 0.85 * a + 0.5 * b }
    }
    val enS = bases.zipWithIndex.map { case (b, i) =>
      (i.toLong, b.map(_.toFloat)) }
    val deS = bases.zipWithIndex.map { case (b, i) =>
      val nz = unit(dim)
      (1000L + i, b.zip(nz).map { case (a, e) => (a + 0.12 * e).toFloat })
    }
    val cl = sweep("clustered synthetic", enS, deS, dim)

    // ---- pins (the measured table, round 13, sf0.001 fixture) ----
    //   isotropic:  4x3 -> frac .419 ret  9 | 8x3 -> .664 ret 17 | 8x4 -> .418 ret 10
    //   clustered:  4x3 -> frac .649 ret 19 | 8x3 -> .808 ret 20 | 8x4 -> .632 ret 20
    // candidate volume is NESTED along the tables axis by construction
    // (seed sequence extension), so frac(8,3) >= frac(4,3) always
    assert(fx((8, 3))._2 >= fx((4, 3))._2 && cl((8, 3))._2 >= cl((4, 3))._2)
    // more planes per table = finer buckets = fewer candidates
    assert(fx((8, 4))._2 <= fx((8, 3))._2 && cl((8, 4))._2 <= cl((8, 3))._2)
    // the curve point the gate's quality story rests on: MORE TABLES AT
    // EQUAL PLANES buys retention on both regimes (strict per-config
    // monotonicity in volume does not hold at near-ties — isotropic 8x4
    // and 4x3 land at the same volume within 0.001 and swap by one pair —
    // so the pin is the tables axis, where candidates are nested)
    assert(fx((8, 3))._1 > fx((4, 3))._1,
      s"more tables did not buy isotropic retention: $fx")
    assert(cl((8, 3))._1 >= cl((4, 3))._1,
      s"more tables lost clustered retention: $cl")
    // per-config measured floors (generous: -1 pair of slack vs measured)
    assert(fx((4, 3))._1 >= 8, s"isotropic floor regressed: ${fx((4, 3))}")
    assert(fx((8, 3))._1 >= 14, s"isotropic 8x3 floor regressed: ${fx((8, 3))}")
    assert(cl((8, 3))._1 >= 19 && cl((8, 4))._1 >= 19,
      s"clustered high-config retention regressed: $cl")
    // the production regime is what justifies the shipped 4x3 config:
    // clustered pairs are retained near-fully at ~2/3 the candidate work
    // (8x3 is the measured quality-upgrade knob: +1.6x candidates for
    // 17/20 isotropic retention, should anisotropy matter more than cost)
    assert(cl((4, 3))._1 >= 18,
      s"clustered retention collapsed at the shipped config: ${cl((4, 3))}")
    assert(cl((4, 3))._2 < 0.75,
      s"gate prunes too little on clustered data: ${cl((4, 3))}")
  }

  // ---- s16/s17: independent plain-Scala Lloyd ----

  /** Round-half-away-from-zero — Spark's round() and DuckDB's round()
    * semantics (Scala's Math.round is half-UP, which differs for
    * negatives, so it must not be used here). */
  private def roundAway(x: Double): Double =
    if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)

  private def lloydRef(): (Map[Int, (Long, Long)], Array[Array[Long]]) = {
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => (roundAway(x.toDouble * 1024d) + 1024d).toLong))
    }
    q.foreach { case (id, qs) =>
      qs.foreach(x => assert(x >= 0 && x <= 2048,
        s"quantized component out of the documented [0, 2048] band (vec $id)"))
    }
    var cents: Array[Array[Long]] = q.take(10).map(_._2.clone())
    // carries the quantized vector through so the update never re-looks-up
    def assign(): Array[(Long, Array[Long], Int, Long)] = q.map { case (id, qs) =>
      var bp = -1; var bd = Long.MaxValue
      cents.zipWithIndex.foreach { case (c, p) =>
        var dd = 0L
        var i = 0
        while (i < qs.length) { val df = qs(i) - c(i); dd += df * df; i += 1 }
        if (dd < bd) { bd = dd; bp = p } // strict < ⇒ lowest-part tie-break
      }
      (id, qs, bp, bd)
    }
    for (_ <- 1 to 3) {
      val a = assign()
      val next = cents.map(_.clone())
      a.groupBy(_._3).foreach { case (p, rows) =>
        val n = rows.length.toLong
        (0 until 64).foreach { i =>
          next(p)(i) = rows.map(_._2(i)).sum / n
        }
      }
      cents = next
    }
    val fin = assign()
    val stats = fin.groupBy(_._3).map { case (p, rows) =>
      p -> (rows.length.toLong, rows.map(_._4).sum)
    }
    (stats, cents)
  }

  test("s16: plain-Scala Lloyd recount reproduces sizes, inertia and centroid mass") {
    val (stats, cents) = lloydRef()
    val got = SelectionQueries.s16KmeansRefine(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.foreach { case (p, n, inertia, cl1) =>
      val (en, ei) = stats.getOrElse(p.toInt, (0L, 0L))
      assert(n == en, s"cluster $p size")
      assert(inertia == ei, s"cluster $p inertia")
      assert(cl1 == cents(p.toInt).sum, s"cluster $p centroid mass")
    }
    assert(got.map(_._2).sum == 500L, "every vector lands in exactly one cluster")
  }

  test("s17: the pruned set is exactly the per-cluster rank formula over s16's assignment") {
    val (stats, cents) = lloydRef()
    // re-derive the full final assignment ranks
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => (roundAway(x.toDouble * 1024d) + 1024d).toLong)))
    val fin = vecs.map { case (id, qs) =>
      var bp = -1; var bd = Long.MaxValue
      cents.zipWithIndex.foreach { case (c, p) =>
        var dd = 0L; var i = 0
        while (i < qs.length) { val df = qs(i) - c(i); dd += df * df; i += 1 }
        if (dd < bd) { bd = dd; bp = p }
      }
      (id, bp, bd)
    }
    val expected = fin.groupBy(_._2).toSeq.flatMap { case (p, rows) =>
      val n = rows.length
      val sorted = rows.sortBy(r => (r._3, r._1))
      val t1 = (n + 9) / 10; val t2 = (n + 19) / 20
      sorted.zipWithIndex.collect {
        case ((id, _, d2), i) if i < t1 => (p.toLong, id, d2, "proto")
        case ((id, _, d2), i) if i >= n - t2 => (p.toLong, id, d2, "outlier")
      }
    }.sortBy(r => (r._1, r._2))
    val got = SelectionQueries.s17D4Prune(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
    assert(stats.nonEmpty) // lloydRef agreement already pinned in s16's test
  }

  // ---- t43: canonicalization on crafted adversarial URLs ----

  test("t43: canonical form strips port/www/utm/fragment/case and collapses variants") {
    import spark.implicits._
    val urls = Seq(
      "http://example.com/a/b",
      "HTTP://EXAMPLE.COM:80/a/b",            // case + default port
      "http://www.example.com/a/b/",          // www + trailing slash
      "http://example.com/a/b?utm_source=x",  // tracking param only
      "http://example.com/a/b#frag",          // fragment
      "http://example.com/a/b?z=1&a=2",       // params need sorting
      "http://example.com/a/b?a=2&utm_medium=y&z=1", // mixed
      "http://example.com",                   // empty path → /
      "http://example.com/",                  // root slash → /
      "http://example.com:8080/a"             // NON-default port survives
    ).toDF("url")
    val got = SelectionQueries.withCanonicalUrl(urls)
      .select("canonical").collect().map(_.getString(0))
    assert(got.take(5).toSet == Set("http://example.com/a/b"))
    assert(got(5) == "http://example.com/a/b?a=2&z=1")
    assert(got(6) == "http://example.com/a/b?a=2&z=1")
    assert(got(7) == "http://example.com/")
    assert(got(8) == "http://example.com/")
    assert(got(9) == "http://example.com:8080/a")
  }

  test("t43: driver-side java.net.URI recount agrees on the fixture's synthetic corpus") {
    // independent parser: java.net.URI, not the engine's regex chain
    def canonRef(u: String): String = {
      val uri = java.net.URI.create(u)
      val scheme = uri.getScheme.toLowerCase
      var host = uri.getHost.toLowerCase // URI drops :80? no — getPort below
      if (host.startsWith("www.")) host = host.stripPrefix("www.")
      val port = uri.getPort
      val hostPort = if (port == -1 || port == 80) host else s"$host:$port"
      val path0 = Option(uri.getRawPath).getOrElse("").replaceAll("/+$", "")
      val path = if (path0.isEmpty) "/" else path0
      val keep = Option(uri.getRawQuery).getOrElse("").split("&")
        .filter(p => p.nonEmpty && !p.startsWith("utm_")).sorted.mkString("&")
      s"$scheme://$hostPort$path" + (if (keep.nonEmpty) s"?$keep" else "")
    }
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val urls = docs.map { case (id, src) =>
      val base = s"$src.example.com"
      val path = s"/doc/${id / 7}"
      val idp = id % 3
      (id % 5) match {
        case 0 => s"http://$base$path"
        case 1 => s"HTTP://${base.toUpperCase}:80$path/"
        case 2 => s"http://www.$base$path?utm_source=feed&utm_medium=rss"
        case 3 => s"http://$base$path?id=$idp&utm_campaign=x#frag"
        case _ => s"http://$base:80$path?utm_medium=rss&id=$idp"
      }
    }
    val grouped = urls.map(canonRef).zip(docs.map(_._1)).zip(urls)
      .map { case ((c, id), u) => (c, id, u) }
      .groupBy(_._1).map { case (c, rows) =>
        (c, rows.length.toLong, rows.map(_._3).distinct.length.toLong,
          rows.map(_._2).min)
      }.toSeq.sortBy(r => (-r._2, r._1)).take(15)
    val got = SelectionQueries.t43UrlCanonical(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == grouped)
  }

  // ---- t44: the MOSS winnowing guarantee ----

  private def winnowRef(text: String, k: Int = 8, w: Int = 4): Set[(Long, Int)] = {
    if (text.length < k) return Set.empty
    val hs = (0 to text.length - k).map(i => md5h32(text.substring(i, i + k)))
    if (hs.length < w) return Set.empty
    (0 to hs.length - w).flatMap { p =>
      // min hash, RIGHTMOST tie-break
      val j = (0 until w).minBy(j => (hs(p + j), -(p + j)))
      Some((hs(p + j), p + j + 1)) // 1-based position, matching the engine
    }.toSet
  }

  test("t44: winnowing guarantee — an 11-char shared run always yields a shared fingerprint hash") {
    import spark.implicits._
    // adversarial pair: different prefixes/suffixes, one shared 16-char core
    val core = "the shared core!"
    val a = s"alpha prefix $core omega"
    val b = s"Zz$core##differenttail"
    val df = Seq(a, b).toDF("text")
      .select(SelectionQueries.winnowFids(org.apache.spark.sql.functions.col("text")).as("f"))
    val fids = df.collect().map(_.getSeq[Long](0).toSet)
    val hashesA = fids(0).map(_ >> 26)
    val hashesB = fids(1).map(_ >> 26)
    assert(hashesA.intersect(hashesB).nonEmpty,
      "MOSS guarantee: shared run of >= k+w-1 chars must share a fingerprint")
    // and the engine agrees with the independent Scala winnow on both docs
    assert(fids(0) == winnowRef(a).map { case (h, pos) => h * 67108864L + pos })
    assert(fids(1) == winnowRef(b).map { case (h, pos) => h * 67108864L + pos })
  }

  test("t44: per-source stats recount on the fixture corpus") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (_, src, text) =>
      val fp = winnowRef(text)
      (src, fp.size.toLong, fp.map(_._1))
    }
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      // per-doc DISTINCT hashes, counted across the source's docs
      val byHash = rows.flatMap(r => r._3.toSeq.distinct)
        .groupBy(identity).map { case (h, o) => h -> o.length }
      val nHashes = byHash.size.toLong
      val nShared = byHash.count(_._2 >= 2).toLong
      (src, rows.length.toLong, rows.map(_._2).sum, nHashes, nShared,
        nShared * 10000 / math.max(nHashes, 1L))
    }.toSeq.sortBy(_._1)
    val got = SelectionQueries.t44Winnowing(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }
}
