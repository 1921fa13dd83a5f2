package graft

import graft.queries.{AnalyticsQueries, LlmQueries, SketchQueries}
import org.apache.spark.sql.functions._

/** Behavior contracts for the deterministic sketch/median/substring-dedupe
  * queries — properties the DuckDB hash check can't express (error bounds,
  * one-sidedness, phase independence).
  */
class SketchQueriesSpec extends SparkSpec {

  test("d11: HLL estimate lands within 25% of the exact distinct count") {
    val r = SketchQueries.d11HllDistinct(spark, sf()).head
    val (est, exact) = (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
    assert(r.getAs[Long]("n_buckets") == 256L)
    assert(exact >= 640, s"fixture must keep HLL in the raw regime (n >= 2.5m), n=$exact")
    // 256 buckets → σ ≈ 1.04/√256 = 6.5%; 25% is ~4σ
    assert(math.abs(est - exact).toDouble / exact < 0.25, s"est=$est exact=$exact")
    assert(r.getAs[Long]("err_bp") == math.abs(est - exact) * 10000 / exact)
  }

  test("d11: registers are merge-stable — estimate identical across partitionings") {
    val a = SketchQueries.d11HllDistinct(spark, sf()).head.getAs[Long]("est_distinct")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SketchQueries.d11HllDistinct(spark, sf()).head.getAs[Long]("est_distinct")
      assert(a == b, s"partitioning changed the sketch: $a vs $b")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("d15: merged-register union estimate == sketch built directly on the union stream") {
    import graft.operators.Dedupe
    val d = sf()
    val r = SketchQueries.d15HllSetops(spark, d).head
    // direct union sketch: one HLL over ALL (part, supplier) pairs, no sides
    val keys = graft.core.Tables.lineitem(spark, d).select(
      concat(col("l_partkey").cast("string"), lit("#"),
        col("l_suppkey").cast("string")).as("w"))
    val direct = keys
      .select((Dedupe.md5Hash32(col("w")) % 256).as("bucket"),
        conv(substring(md5(col("w")), 9, 8), 16, 10).cast("long").as("wd"))
      .select(col("bucket"), when(col("wd") === 0, lit(32))
        .otherwise(lit(33) - length(bin(col("wd")))).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - r)")).as("sp"),
        count(lit(1)).as("nb"))
      .selectExpr("(718273 * (CAST(281474976710656 AS BIGINT) div " +
        "(sp + (256 - nb) * CAST(4294967296 AS BIGINT)))) div 1000000 AS est")
      .head.getAs[Long]("est")
    assert(r.getAs[Long]("est_union") == direct,
      s"register merge diverged from direct union sketch: ${r.getAs[Long]("est_union")} vs $direct")
    // inclusion-exclusion exacts are internally consistent
    assert(r.getAs[Long]("exact_intersect") >= 0)
    assert(r.getAs[Long]("exact_intersect") <=
      math.min(r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b")))
  }

  test("d18: Bloom has NO false negatives; absent-probe FPR within the fill-rate bound") {
    val rows = SketchQueries.d18BloomMembership(spark, sf()).collect()
    val present = rows.find(_.getAs[Long]("truly_present") == 1L).get
    assert(present.getAs[Long]("n_hits") == present.getAs[Long]("n_probes"),
      "a Bloom filter must never miss a present key")
    val absent = rows.find(_.getAs[Long]("truly_present") == 0L).get
    // expected FPR ≈ fill^k with k=4 at this bit density; generous headroom
    val fill = absent.getAs[Long]("bits_set").toDouble / (1 << 20)
    val bound = math.max(3.0, 5 * math.pow(fill, 4) * absent.getAs[Long]("n_probes"))
    assert(absent.getAs[Long]("n_hits") <= bound,
      s"absent hits ${absent.getAs[Long]("n_hits")} above bound $bound (fill=$fill)")
  }

  test("d19: cumulative estimates are monotone and the final month equals d15's union sketch") {
    val rows = SketchQueries.d19HllTimeseries(spark, sf()).collect().sortBy(_.getAs[Long]("ym"))
    assert(rows.length > 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("est_cum") <= b.getAs[Long]("est_cum"),
        s"register merge must be monotone: ${a.getAs[Long]("ym")} -> ${b.getAs[Long]("ym")}")
      assert(a.getAs[Long]("exact_cum") <= b.getAs[Long]("exact_cum"))
    }
    // the last cumulative sketch covers the whole (part, supplier) stream —
    // exactly what d15's union registers cover, so the estimates must agree
    val d15union = SketchQueries.d15HllSetops(spark, sf()).head.getAs[Long]("est_union")
    assert(rows.last.getAs[Long]("est_cum") == d15union,
      s"final cumulative ${rows.last.getAs[Long]("est_cum")} != d15 union $d15union")
  }

  test("d20: each sliding-window estimate == a direct sketch over that window's months") {
    import graft.operators.Dedupe
    val rows = SketchQueries.d20HllSliding(spark, sf()).collect()
    assert(rows.length > 3)
    val li = graft.core.Tables.lineitem(spark, sf()).select(
      (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long").as("mi"),
      concat(col("l_partkey").cast("string"), lit("#"),
        col("l_suppkey").cast("string")).as("w"))
    // spot-check first, middle, last windows against a from-scratch sketch
    for (r <- Seq(rows.head, rows(rows.length / 2), rows.last)) {
      val m = r.getAs[Long]("mi")
      val direct = li.filter(col("mi") >= m - 2 && col("mi") <= m)
        .select((Dedupe.md5Hash32(col("w")) % 256).as("bucket"),
          conv(substring(md5(col("w")), 9, 8), 16, 10).cast("long").as("wd"))
        .select(col("bucket"), when(col("wd") === 0, lit(32))
          .otherwise(lit(33) - length(bin(col("wd")))).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - r)")).as("sp"),
          count(lit(1)).as("nb"))
        .selectExpr("(718273 * (CAST(281474976710656 AS BIGINT) div " +
          "(sp + (256 - nb) * CAST(4294967296 AS BIGINT)))) div 1000000 AS est")
        .head.getAs[Long]("est")
      assert(r.getAs[Long]("est_win") == direct,
        s"window $m: rolled ${r.getAs[Long]("est_win")} != direct $direct")
    }
  }

  test("t24: the Bloom tier never changes the answer — contaminated set == t13's exact screen") {
    val viaBloom = graft.queries.MiningQueries.t24BloomDecontaminate(spark, sf())
      .filter(col("contaminated") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = graft.queries.MiningQueries.t13Contamination(spark, sf())
      .filter(col("contaminated") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact,
      s"bloom-tiered screen diverged: only-bloom=${viaBloom -- exact} only-exact=${exact -- viaBloom}")
    // and candidates always cover the exact hits (no false negatives)
    val r = graft.queries.MiningQueries.t24BloomDecontaminate(spark, sf()).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_bloom_candidates") >= row.getAs[Long]("n_exact_hits"))
      assert(row.getAs[Long]("n_bloom_fp") >= 0)
    }
  }

  test("t22: largest-remainder allocation sums EXACTLY to the budget, each within +1 of its floor") {
    val rows = LlmQueries.t22DomainMix(spark, sf()).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("tokens")).sum
    val budget = total / 3
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == budget,
      s"allocation must sum exactly to the budget ($budget)")
    rows.foreach { r =>
      val base = budget * r.getAs[Long]("tokens") / total
      val a = r.getAs[Long]("alloc_tokens")
      assert(a == base || a == base + 1,
        s"${r.getString(0)}: alloc=$a outside [base, base+1] base=$base")
    }
  }

  test("t25: greedy take fills every allocation, overshooting by at most the straddling doc") {
    val rows = LlmQueries.t25MixExecute(spark, sf()).collect()
    assert(rows.nonEmpty)
    val srcTokens = LlmQueries.t22DomainMix(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("tokens")).toMap
    rows.foreach { r =>
      val (src, taken, alloc) =
        (r.getString(0), r.getAs[Long]("tokens_taken"), r.getAs[Long]("alloc_tokens"))
      if (srcTokens(src) >= alloc)
        assert(taken >= alloc, s"$src under-filled: $taken < $alloc")
      assert(r.getAs[Long]("n_docs_taken") > 0 || alloc == 0)
    }
  }

  test("t21: shards are contiguous per source and conserve docs and tokens") {
    val rows = LlmQueries.t21TokenShards(spark, sf()).collect()
    assert(rows.nonEmpty)
    val docCounts = graft.core.Tables.documents(spark, sf())
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val shards = rs.map(_.getAs[Long]("shard")).sorted
      assert(shards.head == 0 && shards.last == shards.length - 1,
        s"$src shard ids must be contiguous from 0: ${shards.toList}")
      assert(rs.map(_.getAs[Long]("n_docs")).sum == docCounts(src),
        s"$src manifest lost documents")
    }
  }

  test("d13: every segment's grouped-HLL estimate within 4σ of exact") {
    val rows = SketchQueries.d13HllGrouped(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      assert(exact >= 640, s"segment ${r.getString(0)} below the raw-HLL regime: $exact")
      assert(math.abs(est - exact).toDouble / exact < 0.26,
        s"segment ${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("t16: CMS is one-sided — every estimate >= true count, 20 probes") {
    val rows = SketchQueries.t16CmsHeavyHitters(spark, sf()).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"), r.toString)
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("true_cnt"))
    }
    // ordered by true frequency, then word
    val freqs = rows.map(_.getAs[Long]("true_cnt")).toSeq
    assert(freqs == freqs.sorted.reverse)
  }

  test("q47: window-median matches a driver-side exact median per group") {
    val got = AnalyticsQueries.q47GroupedMedian(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_orders"), r.getAs[Double]("median_price")))
      .toMap
    val byGroup = spark.read.parquet(sf() + "/orders.parquet")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(got.keySet == byGroup.keySet)
    byGroup.foreach { case (k, xs) =>
      val expect =
        if (xs.length % 2 == 1) xs(xs.length / 2)
        else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
      assert(got(k)._1 == xs.length.toLong, s"group $k count")
      assert(got(k)._2 == expect, s"group $k median: got ${got(k)._2} want $expect")
    }
  }

  test("d12: gram selection is content-defined — shared run found at ANY offset") {
    import spark.implicits._
    val run = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = Seq(
      (1L, "A" * 13 + run + " totally different tail content here"),
      // same run at a different offset AND different phase mod 16
      (2L, "zzz unrelated prefix of another length 9q8w7e " + run + " end"),
      (3L, "completely disjoint text with no overlap whatsoever in its grams x")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("d12spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.d12SubstringDedupe(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("is_dup")).toMap
    assert(got(1L) == 0, "first owner must not be flagged")
    assert(got(2L) == 1, "doc sharing the run at a shifted offset must be flagged")
    assert(got(3L) == 0, "disjoint doc must not be flagged")
  }

  test("g04: star-graph PageRank — hub dominates, leaves tie, mass ≈ conserved") {
    import graft.queries.MiningQueries
    import spark.implicits._
    // co-purchase star: one order containing part 1 with parts 2..5 only
    // (same-order pairs (1,2),(1,3),(1,4),(1,5) but never leaf-leaf) is not
    // expressible in one order — use 4 two-item orders sharing part 1
    val dir = java.nio.file.Files.createTempDirectory("g04spec").toString
    Seq((100L, 1L), (100L, 2L), (200L, 1L), (200L, 3L),
      (300L, 1L), (300L, 4L), (400L, 1L), (400L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = MiningQueries.g04PageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaves = Set(2L, 3L, 4L, 5L).map(got)
    assert(leaves.size == 1, s"leaves must tie: $got")
    assert(got(1L) > leaves.head * 5, s"hub must dominate: $got")
    // total mass stays within truncation loss of the scale (≤ a few ULP·N)
    val total = got.values.sum
    assert(math.abs(total - 1000000000000L) < 1000000L, s"mass drifted: $total")
  }

  test("d12: every doc present exactly once, flags only 0/1") {
    val df = LlmQueries.d12SubstringDedupe(spark, sf())
    val n = spark.read.parquet(sf() + "/documents.parquet").count()
    assert(df.count() == n)
    val flags = df.select(col("is_dup")).distinct().collect().map(_.getInt(0)).toSet
    assert(flags.subsetOf(Set(0, 1)))
  }

  test("d14: approx never exceeds exact and relative error stays under 2^-6") {
    val rows = graft.queries.SketchQueries.d14QuantileSketch(spark, sf()).collect()
    assert(rows.length == 15) // 5 segments x p50/p90/p99
    rows.foreach { r =>
      val (approx, exact, errBp) =
        (r.getAs[Long]("approx_q"), r.getAs[Long]("exact_q"), r.getAs[Long]("err_bp"))
      assert(approx <= exact, s"bucket lower bound above the exact value: $r")
      // bucket width / bucket base = 2^-6 => at most ~156 bp + div truncation
      assert(errBp >= 0 && errBp <= 160, s"error bound violated: $r")
    }
  }

  test("d17 imperative HLL == d11 relational estimate, invariant to partitioning") {
    import spark.implicits._
    val relational = graft.queries.SketchQueries.d11HllDistinct(spark, sf())
      .select("est_distinct").head.getLong(0)
    val imperative = graft.queries.SketchQueries.d17HllAgg(spark, sf())
      .head.getLong(0)
    assert(imperative == relational,
      s"buffer path $imperative != relational $relational")
    // merge is elementwise max — any partitioning must land on the same
    // registers and therefore the identical estimate
    val keys = spark.read.parquet(sf() + "/orders.parquet")
      .select(col("o_orderkey").cast("string").as("w"))
    for (parts <- Seq(1, 7)) {
      val est = keys.repartition(parts)
        .agg(graft.plans.HllSketchAgg.hllDistinct(col("w")))
        .head.getLong(0)
      assert(est == imperative, s"estimate drifted at $parts partitions")
    }
    // grouped: the same buffer per GROUP must reproduce d13's relational
    // per-segment estimates
    val d13 = graft.queries.SketchQueries.d13HllGrouped(spark, sf())
      .select("segment", "est_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val grouped = spark.read.parquet(sf() + "/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(graft.plans.HllSketchAgg.hllDistinct(
        col("o_custkey").cast("string")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == d13, s"grouped buffer path diverges from d13")
  }

  test("d14 buckets are mergeable: sketch(whole) == sum of split sketches") {
    import spark.implicits._
    // the bucketing expression from d14, applied to a toy value column
    def buckets(vals: Seq[Long]) = vals.toDF("v").selectExpr(
      """CASE WHEN length(bin(v)) <= 7 THEN v
        | ELSE CAST(length(bin(v)) AS BIGINT) * 64 +
        |      (shiftright(v, length(bin(v)) - 7) & CAST(63 AS BIGINT)) END AS b"""
        .stripMargin)
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    val rnd = new scala.util.Random(3)
    val all = Seq.fill(2000)(rnd.nextInt(5000000).toLong + 1)
    val (h1, h2) = all.splitAt(900)
    val (b1, b2) = (buckets(h1), buckets(h2))
    val merged = (b1.keySet ++ b2.keySet).map { b =>
      b -> (b1.getOrElse(b, 0L) + b2.getOrElse(b, 0L))
    }.toMap
    assert(buckets(all) == merged)
  }

  test("d22: linear regime is exact when distinct keys fit under k") {
    // sf0.001 has only ~150 customers — every group sits below k=256
    val rows = SketchQueries.d22KmvDistinct(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") < 256)
      assert(r.getAs[Long]("est_distinct") == r.getAs[Long]("exact_distinct"),
        s"linear-regime KMV must be exact: ${r.mkString(",")}")
    }
  }

  test("d22: sketch regime stays within 4σ and merged ALL equals sketch-of-union") {
    val rows = SketchQueries.d22KmvDistinct(spark, sf("sf0.01")).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") == 256)
      val (est, exact) =
        (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      // k=256 → σ ≈ 1/√(k−2) ≈ 6.3%; 25% ≈ 4σ
      assert(math.abs(est - exact).toDouble / exact < 0.25,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
    // independent union sketch: hash every custkey from scratch, take the
    // 256th smallest, apply the same integer estimator
    val hk = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
      .selectExpr("conv(substring(md5(CAST(o_custkey AS STRING)), 1, 10)," +
        " 16, 10) AS h")
      .select(col("h").cast("long")).distinct()
      .orderBy("h").limit(256).collect().map(_.getLong(0)).max
    val fromScratch = 280375465082880L / hk
    val allRow = rows.find(_.getString(0) == "ALL").get
    assert(allRow.getAs[Long]("est_distinct") == fromScratch,
      "merged sketch must equal the sketch of the union")
  }

  test("d23: imperative KMV aggregate equals the relational formulation per group") {
    for (dir <- Seq(sf(), sf("sf0.01"))) {
      val rel = SketchQueries.d22KmvDistinct(spark, dir).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
      val imp = SketchQueries.d23KmvAgg(spark, dir).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
      assert(imp == rel, s"imperative vs relational KMV diverged at $dir")
    }
  }

  test("d23: bounded-heap sketch is invariant to input partitioning") {
    val a = SketchQueries.d23KmvAgg(spark, sf("sf0.01")).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SketchQueries.d23KmvAgg(spark, sf("sf0.01")).collect().toSeq
      assert(a == b, "partitioning changed the KMV sketch")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
