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
}
