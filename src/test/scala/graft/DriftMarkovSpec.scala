package graft

import graft.queries.{CoreQueries, MiningQueries}
import org.apache.spark.sql.functions._

/** Behavior contracts for the dq02 drift monitor and the q65 Markov
  * transition matrix — distribution invariants the DuckDB hash check
  * doesn't state explicitly.
  */
class DriftMarkovSpec extends SparkSpec {

  test("dq02: per-period shares each sum to ~10000 bp and counts partition the table") {
    val rows = CoreQueries.dq02Drift(spark, sf()).collect()
    val nTotal = spark.read.parquet(sf() + "/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_ref")).sum +
      rows.map(_.getAs[Long]("n_cur")).sum == nTotal,
      "every order must land in exactly one (bin, period) cell")
    // integer floor division loses < 1 bp per bin
    val refBp = rows.map(_.getAs[Long]("ref_bp")).sum
    val curBp = rows.map(_.getAs[Long]("cur_bp")).sum
    assert(refBp > 10000 - rows.length && refBp <= 10000, s"ref share sum $refBp")
    assert(curBp > 10000 - rows.length && curBp <= 10000, s"cur share sum $curBp")
    // drift columns are consistent with the shares they summarize
    rows.foreach { r =>
      assert(r.getAs[Long]("l1_bp") ==
        math.abs(r.getAs[Long]("ref_bp") - r.getAs[Long]("cur_bp")))
      assert(r.getAs[Long]("chi2_bp") >= 0)
    }
  }

  test("q65: per-source transition shares sum to ~10000 bp and pairs conserve events") {
    val rows = MiningQueries.q65MarkovTransitions(spark, sf()).collect()
    val ev = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // each user's k events yield k-1 transitions
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, grp) =>
      val bp = grp.map(_.getAs[Long]("p_bp")).sum
      assert(bp > 10000 - grp.length && bp <= 10000, s"$ft share sum $bp")
    }
  }

  test("dq03: diff classes reconcile against directly-counted key populations") {
    val m = CoreQueries.dq03SnapshotDiff(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(sf() + "/orders.parquet")
    val n = o.count()
    val nIns = o.filter(col("o_orderkey") % 97 === 0).count()
    val nDel = o.filter(col("o_orderkey") % 101 === 0).count()
    val nChg = o.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 89 === 0).count()
    assert(m("1_inserted") == nIns)
    assert(m("2_deleted") == nDel)
    assert(m("3_changed") == nChg && m("7_col_price") == nChg)
    assert(m("5_col_custkey") == 0L && m("6_col_status") == 0L)
    assert(m("3_changed") + m("4_unchanged") == n - nIns,
      "changed + unchanged must cover the key intersection")
  }

  test("t26: hand-computed surprisal on a tiny corpus (repetition scores 0)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("t26spec").toString
    Seq(
      (1L, "a a a a a", "en", "s", 9L),
      (2L, "x y", "en", "s", 3L),
      (3L, "a a x y a a", "en", "s", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // model: c("a ·")=7, c("a a")=6 → ratio 1 → 0 bits; c("a x")=1 → ratio 7
    // → 2 bits; "x y" and "y a" are their prefix's only continuations → 0.
    val rows = graft.queries.LlmQueries.t26BigramSurprisal(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((3L, 5L, 2L, 400L), (1L, 4L, 0L, 0L), (2L, 1L, 0L, 0L)))
  }

  test("q65: transition counts are invariant to input partitioning") {
    val a = MiningQueries.q65MarkovTransitions(spark, sf()).collect()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = MiningQueries.q65MarkovTransitions(spark, sf()).collect()
      assert(a.sameElements(b), "partitioning changed the transition matrix")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("t28: hand-computed RAKE scores on a tiny corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("rake").toString
    Seq(
      (1L, "deep learning is the deep model", "en", "s", 31L),
      (2L, "the a the", "en", "s", 9L),      // delimiters only → no phrases
      (3L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // phrases: "deep learning is" (len 3), "deep model" (len 2)
    // deep: freq 2, deg 5 → 25000 bp; learning/is: freq 1, deg 3 → 30000;
    // model: freq 1, deg 2 → 20000
    val rows = graft.queries.LlmQueries.t28RakeKeywords(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("deep learning is", 1L, 3L, 85000L),
      ("deep model", 1L, 2L, 45000L)))
  }

  test("dq04: digit counts partition orders and Benford constants sum to 9995 bp") {
    val rows = CoreQueries.dq04Benford(spark, sf()).collect()
    val nOrders = spark.read.parquet(sf() + "/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders,
      "every order has exactly one leading digit")
    val obsBp = rows.map(_.getAs[Long]("obs_bp")).sum
    assert(obsBp > 10000 - rows.length && obsBp <= 10000, s"obs share sum $obsBp")
    // ⌊10⁴·log₁₀(1+1/d)⌋ for d=1..9 — floor loss leaves 9995
    assert(rows.map(_.getAs[Long]("exp_bp")).sum == 9995)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") ==
        math.abs(r.getAs[Long]("obs_bp") - r.getAs[Long]("exp_bp")))
    }
  }

  test("dq05: spine accounting is exact and matches the raw event day range") {
    val r = CoreQueries.dq05Completeness(spark, sf()).collect().head
    val days = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .selectExpr("(ts DIV 1000) DIV 86400000000 AS day")
    val lo = days.agg(min("day")).collect().head.getLong(0)
    val hi = days.agg(max("day")).collect().head.getLong(0)
    assert(r.getAs[Long]("n_days") == hi - lo + 1, "spine must span min..max")
    assert(r.getAs[Long]("n_present") + r.getAs[Long]("n_missing") ==
      r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("n_present") ==
      days.select("day").distinct().count())
    assert(r.getAs[Long]("median2") > 0 && r.getAs[Long]("n_low") >= 0)
  }

  test("dq06: masks partition the corpus and reasons decode the bits") {
    val rows = CoreQueries.dq06QuarantineProfile(spark, sf()).collect()
    val total = spark.read.parquet(sf() + "/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "every document lands in exactly one mask bucket")
    val names = Seq(1L -> "null_text", 2L -> "len_mismatch", 4L -> "too_short",
      8L -> "unknown_lang", 16L -> "pii_email")
    rows.foreach { r =>
      val mask = r.getAs[Long]("mask")
      val want =
        if (mask == 0) "clean"
        else names.collect { case (b, n) if (mask & b) != 0 => n }.mkString("+")
      assert(r.getAs[String]("reasons") == want, s"mask $mask decoded wrong")
    }
  }

  test("q69: band ranks are consistent and the last band closes at 10000 bp") {
    val rows = CoreQueries2.q69RankBands(spark, sf()).collect()
      .groupBy(_.getAs[String]("segment"))
    rows.foreach { case (seg, rs) =>
      val n = rs.map(_.getAs[Long]("n_at")).sum
      // rank of each band = 1 + rows in prior bands; cum of last = n
      var cum = 0L
      rs.sortBy(_.getAs[Long]("band")).foreach { r =>
        assert(r.getAs[Long]("rnk") == cum + 1, s"$seg rank chain broken")
        cum += r.getAs[Long]("n_at")
        assert(r.getAs[Long]("cd_bp") == cum * 10000 / n)
        assert(r.getAs[Long]("pr_bp") >= 0 && r.getAs[Long]("pr_bp") <= 10000)
      }
      assert(rs.maxBy(_.getAs[Long]("band")).getAs[Long]("cd_bp") == 10000,
        s"$seg cumulative distribution must close at 10000 bp")
    }
  }

  private val CoreQueries2 = graft.queries.AnalyticsQueries

  test("q70: offset-0 retention is 10000 bp and cohorts partition the users") {
    val rows = CoreQueries2.q70CohortRetention(spark, sf()).collect()
    val nUsers = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .select("user_id").distinct().count()
    val zero = rows.filter(_.getAs[Long]("offset") == 0L)
    zero.foreach { r =>
      assert(r.getAs[Long]("retention_bp") == 10000L)
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_users"),
        "every cohort member is active on day 0 by definition")
    }
    assert(zero.map(_.getAs[Long]("n_users")).sum == nUsers,
      "cohort sizes must partition the user base")
    rows.foreach(r => assert(r.getAs[Long]("retention_bp") <= 10000L))
  }

  test("q71: rules match a driver-side brute-force over the raw baskets") {
    val items = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sup = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = baskets.size.toLong
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { b =>
      for (x <- b; y <- b if x != y)
        pairCnt((x, y)) = pairCnt.getOrElse((x, y), 0L) + 1L
    }
    val expected = pairCnt.toSeq.collect { case ((a, c), np) if np >= 3 =>
      (a, c, np, np * 10000 / sup(a), np * nOrders * 1000 / (sup(a) * sup(c)))
    }.sortBy { case (a, c, _, conf, _) => (-conf, a, c) }.take(30)
    val got = CoreQueries2.q71AssocRules(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, "engine rules must equal the brute-force rules")
  }

  test("q72: CUSUM argmax lands on an injected level shift") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("cusum").toString
    // one $1000 order per day for 50 days, then $2000 for 50 days:
    // dev = n*y - tot is -500 then +500; |cusum| peaks on the last
    // pre-shift day (day index 49)
    (0 until 100).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i).atStartOfDay()),
        if (i < 50) 1000.0 else 2000.0)
    }.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = CoreQueries2.q72Changepoint(spark, d).collect().head
    val day49 = java.time.LocalDate.of(2020, 2, 19).toEpochDay
    assert(r.getAs[Long]("change_day") == day49,
      s"changepoint ${r.getAs[Long]("change_day")} != expected $day49")
    assert(r.getAs[Long]("n_days") == 100L)
    assert(math.abs(r.getAs[Long]("cusum")) == 500L * 50)
  }

  test("q68: integer least-squares sums reproduce under driver-side BigInt arithmetic") {
    // proves no BIGINT overflow lurks in the engine's slope formula: redo
    // the regression from the per-brand daily frame in arbitrary precision
    val daily = spark.read.parquet(sf() + "/lineitem.parquet")
      .join(spark.read.parquet(sf() + "/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand AS brand",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT) AS x",
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents")
      .groupBy("brand", "x").agg(expr("sum(cents) div 10000").as("y"))
      .collect().groupBy(_.getAs[String]("brand"))
    val expected = daily.map { case (b, rs) =>
      val xs = rs.map(r => BigInt(r.getAs[Long]("x")))
      val ys = rs.map(r => BigInt(r.getAs[Long]("y")))
      val n = BigInt(rs.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, c) => a * c }.sum
      val sxx = xs.map(a => a * a).sum
      val den = n * sxx - sx * sx
      b -> (if (den == 0) BigInt(0) else ((n * sxy - sx * sy) * 10000) / den)
    }
    val got = CoreQueriesTrend(spark).map(r =>
      r.getAs[String]("brand") -> BigInt(r.getAs[Long]("slope_bp"))).toMap
    assert(got == expected, "engine slope must equal exact BigInt slope")
  }

  private def CoreQueriesTrend(s: org.apache.spark.sql.SparkSession) =
    graft.queries.AnalyticsQueries.q68Trend(s, sf()).collect()

  test("q76: lag-k ACF reproduces under driver-side BigInt arithmetic") {
    // q68's no-overflow proof, for the autocorrelation sums: recompute
    // acf_bp per lag from the monthly series in arbitrary precision and
    // require bit-equality with the engine's BIGINT pipeline
    val ser = spark.read.parquet(sf() + "/orders.parquet")
      .selectExpr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS t",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents")
      .groupBy("t").agg(expr("sum(cents) div 10000000").as("x"))
      .collect().map(r => r.getAs[Long]("t") -> BigInt(r.getAs[Long]("x"))).toMap
    val n = BigInt(ser.size)
    val s0 = ser.values.sum
    val dev = ser.map { case (t, x) => t -> (n * x - s0) }
    val den = dev.values.map(d => d * d).sum
    val expected = (1L to 12L).flatMap { k =>
      val pairs = dev.toSeq.flatMap { case (t, d1) => dev.get(t + k).map(d1 * _) }
      if (pairs.isEmpty) None
      else Some(k -> (if (den == 0) BigInt(0) else (pairs.sum * 10000) / den))
    }.toMap
    val got = graft.queries.AnalyticsQueries.q76Autocorr(spark, sf()).collect()
      .map(r => r.getAs[Long]("lag") -> BigInt(r.getAs[Long]("acf_bp"))).toMap
    assert(got == expected, s"engine ACF must equal exact BigInt ACF; got=$got expected=$expected")
  }
}
