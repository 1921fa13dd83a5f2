package graft

import graft.queries.OpsQueries
import org.apache.spark.sql.functions._

/** Behavior contracts for the round-8 operations/audit family — each test
  * re-derives the query's arithmetic with an independent driver-side
  * (BigInt / plain-Scala) implementation, the DriftMarkovSpec discipline:
  * the DuckDB hash proves cross-engine agreement, these prove the shared
  * formula is the INTENDED one and cannot wrap.
  */
class OpsQueriesSpec extends SparkSpec {

  test("co-purchase vertex ids are non-negative (lpaAssign argmax invariant)") {
    // lpaAssign (and its test-scope mirrors) encode (count DESC, label ASC)
    // as max(struct(c, -label)) — correct ONLY for non-negative labels.
    // Labels are co-purchase vertex ids; pin the invariant at the source.
    // vertex ids ARE part keys (coPurchaseEdges projects l_partkey) — pin
    // the invariant at the raw source the edge builder reads
    val minPk = spark.read.parquet(sf() + "/lineitem.parquet")
      .agg(min(col("l_partkey"))).head().getLong(0)
    assert(minPk >= 0L,
      "negative vertex id would flip the max(struct(c, -label)) tie-break")
  }

  test("g10: modularity recomputes under driver-side BigInt from raw edges + g06 labels") {
    val rows = OpsQueries.g10Modularity(spark, sf()).collect()
    // independent edge derivation straight from lineitem
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("a").join(li.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val comm = graft.queries.MiningQueries.g06LabelProp(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = BigInt(edges.length)
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val eIntra = edges.groupBy { case (u, v) =>
      if (comm(u) == comm(v)) Some(comm(u)) else None
    }.collect { case (Some(c), es) => c -> BigInt(es.length) }
    val degSum = comm.toSeq.groupBy(_._2)
      .map { case (c, vs) => c -> vs.map(x => BigInt(deg(x._1))).sum }
    assert(rows.map(_.getAs[Long]("n_vertices")).sum == comm.size,
      "communities must partition the vertex set")
    assert(rows.map(_.getAs[Long]("e_intra")).sum <= edges.length)
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val ei = eIntra.getOrElse(c, BigInt(0))
      val ds = degSum(c)
      assert(BigInt(r.getAs[Long]("e_intra")) == ei, s"community $c e_intra")
      assert(BigInt(r.getAs[Long]("deg_sum")) == ds, s"community $c deg_sum")
      val expect = (ei * 1000000 / m) -
        ((ds * 1000000 / (2 * m)) * (ds * 1000000 / (2 * m)) / 1000000)
      assert(BigInt(r.getAs[Long]("q_ppm")) == expect, s"community $c q_ppm")
      assert(r.getAs[Long]("q_ppm") <= 1000000L)
      val cut = ds - 2 * ei
      assert(BigInt(r.getAs[Long]("cut_edges")) == cut, s"community $c cut")
      val denom = ds.min(2 * m - ds)
      assert(BigInt(r.getAs[Long]("conductance_ppm")) ==
        (if (denom > 0) cut * 1000000 / denom else BigInt(0)), s"community $c conductance")
    }
    // total degree mass must equal 2m (handshake lemma over the report)
    assert(rows.map(r => BigInt(r.getAs[Long]("deg_sum"))).sum == 2 * m)
  }

  test("s13: covariance numerators recompute under driver-side BigInt; diagonal is a variance (≥ 0)") {
    val rows = OpsQueries.s13EmbeddingCovariance(spark, sf()).collect()
    assert(rows.length == 16 * 17 / 2, "upper triangle of a 16x16 matrix")
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(16)
        .map(v => BigInt(math.floor(v.toDouble * 1000).toLong)).toArray)
    val n = BigInt(vecs.length)
    rows.foreach { r =>
      val (j, k) = (r.getAs[Long]("j").toInt - 1, r.getAs[Long]("k").toInt - 1)
      val sx = vecs.map(_(j)).sum
      val sy = vecs.map(_(k)).sum
      val sxy = vecs.map(v => v(j) * v(k)).sum
      assert(BigInt(r.getAs[Long]("cov_num")) == sxy * n - sx * sy, s"pair ($j,$k)")
      if (j == k) assert(r.getAs[Long]("cov_num") >= 0L, "n²·Var(x) must be ≥ 0")
    }
  }

  test("dq10: bucket signatures recompute driver-side and rows partition the table") {
    val p = BigInt(1000000007L)
    val rows = OpsQueries.dq10TableChecksum(spark, sf()).collect()
    val li = spark.read.parquet(sf() + "/lineitem.parquet").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li.length)
    val expect = li.groupBy(r => r.getAs[Long]("l_orderkey") % 16).map { case (b, rs) =>
      b -> (rs.map { r =>
        (BigInt(3) * r.getAs[Long]("l_orderkey") +
          BigInt(5) * r.getAs[Long]("l_partkey") +
          BigInt(7) * r.getAs[Long]("l_suppkey") +
          BigInt(11) * r.getAs[Int]("l_linenumber") +
          BigInt(13) * math.floor(r.getAs[Double]("l_quantity") * 100).toLong +
          BigInt(17) * math.floor(r.getAs[Double]("l_extendedprice") * 100).toLong) mod p
      }.sum mod p)
    }
    rows.foreach { r =>
      assert(BigInt(r.getAs[Long]("sig")) == expect(r.getAs[Long]("bucket")),
        s"bucket ${r.getAs[Long]("bucket")}")
    }
    // the signature detects a single-row change: flipping one quantity cent
    // shifts the bucket sum by 13 mod p, which is nonzero
    assert((BigInt(13) mod p) != BigInt(0))
  }

  test("p04: greedy bin assignment recomputes driver-side; bins conserve files and bytes") {
    val target = 2000L
    val rows = OpsQueries.p04CompactionPlan(spark, sf()).collect()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("source"), col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("sz"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, id, sz) =>
        val bin = cum / target; cum += sz; ((src, bin), (id, sz))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      (k, (vs.size, vs.map(_._2._2).sum, vs.map(_._2._1).min, vs.map(_._2._1).max))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("bin"))
      val (nf, by, fd, ld) = expect(k)
      assert(r.getAs[Long]("n_files") == nf && r.getAs[Long]("bytes") == by &&
        r.getAs[Long]("first_doc") == fd && r.getAs[Long]("last_doc") == ld, s"bin $k")
    }
    assert(rows.map(_.getAs[Long]("n_files")).sum == docs.length,
      "every file lands in exactly one bin")
  }

  test("m15: stss round-trips through the synthesizer and the plan covers every gop-th sample") {
    import graft.functions.VideoCodec
    // direct codec round-trip across gop/frame shapes
    for (nf <- Seq(1, 2, 10, 41); gop <- Seq(1, 3, 7); fsz <- Seq(1, 5)) {
      val bytes = VideoCodec.mp4BytesWithKeyframes(30, nf.toLong, nf, fsz, gop)
      val nk = 1 + (nf - 1) / gop
      assert(bytes.length == 344 + 4 * nk + nf * fsz, s"size nf=$nf gop=$gop fsz=$fsz")
      val ks = VideoCodec.syncSampleIndices(bytes).get
      assert(ks.toSeq == (0 until nk).map(i => 1L + i.toLong * gop), s"nf=$nf gop=$gop")
      val g = VideoCodec.frameGeometry(bytes).get
      assert(g._4 == 344L + 4 * nk, "chunk offset must sit after the stss-widened moov")
      assert(VideoCodec.parse(bytes).nonEmpty, "container must stay a valid MP4")
    }
    // no stss ⇒ None (caller decides the all-sync semantic), never 1..n
    val plain = VideoCodec.mp4BytesWithFrames(30, 10, 1, 10, 2)
    assert(VideoCodec.syncSampleIndices(plain).isEmpty)
    // stss whose entry_count overruns its box ⇒ refused, not misread:
    // nk=4 ⇒ stss spans bytes [320, 352) with entry_count at 332
    val kf = VideoCodec.mp4BytesWithKeyframes(30, 10, 10, 1, 3)
    assert(VideoCodec.syncSampleIndices(kf).get.length == 4)
    val broken = kf.clone()
    broken(332 + 3) = 100.toByte // count 4 → 100, table would overrun the box
    assert(VideoCodec.syncSampleIndices(broken).isEmpty,
      "overrunning sync-sample table must be refused")
    // query-level conservation: row count = Σ nk over all docs
    val rows = OpsQueries.m15Keyframes(spark, sf()).collect()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expectRows = docs.map { id =>
      val nf = 10 + id % 41; val gop = 3 + id % 5
      1 + (nf - 1) / gop
    }.sum
    assert(rows.length == expectRows, "one row per keyframe per document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gop = 3 + id % 5
      assert((r.getAs[Long]("sample_no") - 1) % gop == 0, s"doc $id keyframe stride")
    }
  }

  test("q81: grid-blocked pairs equal the brute-force quadratic spec") {
    // sf0.01: 150 points in the 10⁶ square are too sparse for any pair
    val dir = sf("sf0.01")
    val r = 5000L
    val rows = OpsQueries.q81SpatialPairs(spark, dir).collect()
      .map(x => ((x.getAs[Long]("id_a"), x.getAs[Long]("id_b")), x.getAs[Long]("dist2")))
    val pts = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey AS id", "c_custkey % 999983 AS km")
      .selectExpr("id",
        "(km * km * 3 + km * 7919) % 1000000 AS x",
        "(km * km * 11 + km * 104729) % 1000000 AS y")
      .collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val brute = for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield ((ia, ib), d2)
    assert(rows.toMap == brute.toMap,
      s"blocked join must be lossless: got ${rows.length}, brute ${brute.length}")
    assert(rows.nonEmpty, "fixture must exercise at least one close pair")
    // pairs crossing a cell boundary are the blocking's hard case — ensure
    // the fixture exercises them (cells differ on at least one axis)
    val crossing = brute.count { case ((ia, ib), _) =>
      val a = pts.find(_._1 == ia).get; val b = pts.find(_._1 == ib).get
      a._2 / r != b._2 / r || a._3 / r != b._3 / r
    }
    assert(crossing > 0, "no boundary-crossing pair — blocking untested")
  }

  test("grid blocking is lossless on RANDOM point sets (3 seeded trials, direct operator check)") {
    // the q81 spec proves losslessness on the hashed-corpus layout; this
    // proves the blocking math on arbitrary layouts — boundary clusters,
    // duplicate coordinates, near-r distances
    import spark.implicits._
    val r = 1000L
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(500 + seed)
      val pts = (1L to 300L).map { id =>
        // clump points so cells are dense and boundary pairs are common
        val cx = rnd.nextInt(8) * 900L
        (id, cx + rnd.nextInt(2000), rnd.nextInt(8) * 900L + rnd.nextInt(2000))
      }
      val df = pts.toDF("id", "x", "y")
      val cell = df.selectExpr("id", "x", "y", s"x div $r AS cx", s"y div $r AS cy")
      val aRep = cell.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
          explode(expr("flatten(transform(sequence(-1, 1), dx -> " +
            "transform(sequence(-1, 1), dy -> " +
            "named_struct('cx', cx + dx, 'cy', cy + dy))))")).as("c"))
        .select(col("id_a"), col("xa"), col("ya"),
          col("c.cx").as("cx"), col("c.cy").as("cy"))
      val bHome = cell.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy"))
      val got = aRep.join(bHome, Seq("cx", "cy"))
        .filter(col("id_a") < col("id_b"))
        .filter(expr(s"(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= ${r * r}"))
        .select(col("id_a"), col("id_b"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.distinct.length,
        s"seed=$seed: a pair met in more than one cell")
      val brute = for {
        (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
        if ia < ib && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= r * r
      } yield (ia, ib)
      assert(got.toSet == brute.toSet, s"seed=$seed: blocking lost or invented pairs")
      assert(brute.nonEmpty, s"seed=$seed: degenerate trial")
    }
  }

  test("q82: radius-bounded kNN equals the brute-force ranking") {
    val dir = sf("sf0.01")
    val r = 5000L
    val rows = OpsQueries.q82SpatialKnn(spark, dir).collect()
    val pts = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey AS id", "c_custkey % 999983 AS km")
      .selectExpr("id",
        "(km * km * 3 + km * 7919) % 1000000 AS x",
        "(km * km * 11 + km * 104729) % 1000000 AS y")
      .collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val brute = pts.flatMap { case (ia, xa, ya) =>
      pts.collect { case (ib, xb, yb) if ib != ia &&
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= r * r =>
        (ia, (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb), ib)
      }.sortBy(t => (t._2, t._3)).take(3).zipWithIndex
        .map { case ((a, d2, b), i) => ((a, i + 1L), (b, d2)) }
    }.toMap
    assert(rows.length == brute.size, "kNN row count")
    rows.foreach { r2 =>
      val k = (r2.getAs[Long]("id_a"), r2.getAs[Long]("rank"))
      assert(brute(k) == ((r2.getAs[Long]("id_b"), r2.getAs[Long]("dist2"))), s"row $k")
    }
  }

  test("m16: decimation recomputes from the ramp formula, independent of the WAV parser") {
    val rows = OpsQueries.m16AudioResample(spark, sf()).collect()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == docs.length)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, nChars) =>
      val n = (nChars % 400 + 50).toInt
      val seed = (id % 251).toInt
      val smp = (0 until n).map { k =>
        val v = ((seed + 2 * k) % 256) + ((seed + 2 * k + 1) % 256) * 256
        if (v >= 32768) v - 65536 else v
      }
      val ys = (0 until n / 2).map(i => (smp(2 * i) + smp(2 * i + 1)) / 2)
      val row = byId(id)
      assert(row.getAs[Long]("n_out") == n / 2)
      assert(row.getAs[Long]("sum_abs") == ys.map(y => math.abs(y).toLong).sum, s"doc $id")
      assert(row.getAs[Long]("max_abs") == ys.map(y => math.abs(y).toLong).max)
      assert(row.getAs[Long]("pos_checksum") ==
        ys.zipWithIndex.map { case (y, i) => (y + 32768L) * (i + 1) }.sum, s"doc $id")
    }
  }

  test("s14: ablation recall reproduces under a driver-side recount with the same fold") {
    val rows = OpsQueries.s14DimAblation(spark, sf()).collect()
    assert(rows.map(_.getAs[Long]("dims")).toSeq == Seq(8L, 16L, 32L))
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // identical accumulation order to CosineSimilarityExpr.nullSafeEval
    def cos(a: Array[Float], b: Array[Float], dims: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dims) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def top5(qid: Long, dims: Int): Set[Long] =
      vecs.keys.filter(_ != qid).toSeq
        .map(id => (id, cos(vecs(id), vecs(qid), dims)))
        .sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSet
    val qids = vecs.keys.filter(_ < 3).toSeq
    rows.foreach { r =>
      val d = r.getAs[Long]("dims").toInt
      val hits = qids.map(q => (top5(q, d) & top5(q, 64)).size).sum
      assert(r.getAs[Long]("n_queries") == qids.length)
      assert(r.getAs[Long]("sum_hits") == hits, s"dims=$d")
      assert(r.getAs[Long]("recall_bp") == hits.toLong * 10000 / (5 * qids.length))
    }
  }

  test("d27: band-sweep precision/recall reproduce under a full driver-side minhash recount") {
    val P = 2147483647L
    val rows = OpsQueries.d27LshTuning(spark, sf()).collect()
    assert(rows.map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"))).toSeq ==
      Seq((8L, 2L), (4L, 4L), (2L, 8L)))
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .selectExpr("doc_id", "coalesce(text, '') AS text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5h32(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(4).map("%02x".format(_)).mkString, 16)
    }
    val shingled = docs.map { case (id, t) =>
      val w = t.trim.toLowerCase.split("\\s+")
      id -> (if (w.length >= 3) (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
             else Seq.empty[String])
    }.filter(_._2.nonEmpty)
    val fam = graft.operators.Dedupe.hashFamily(16)
    val sigs = shingled.map { case (id, shs) =>
      val hs = shs.map(sh => md5h32(sh) % P)
      id -> fam.map { case (a, b) => hs.map(x => (x * a + b) % P).min }.toArray
    }.toMap
    val sets = shingled.map { case (id, shs) => id -> shs.toSet }.toMap
    val ids = sigs.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      (a, b) = (ids(i), ids(j))
      inter = (sets(a) & sets(b)).size
      if inter * 3 >= sets(a).size + sets(b).size
    } yield (a, b)).toSet
    rows.foreach { r =>
      val b = r.getAs[Long]("bands").toInt; val rr = 16 / b
      val cand = (for {
        i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
        (x, y) = (ids(i), ids(j))
        if (0 until b).exists(bi =>
          sigs(x).slice(bi * rr, bi * rr + rr).sameElements(sigs(y).slice(bi * rr, bi * rr + rr)))
      } yield (x, y)).toSet
      assert(r.getAs[Long]("n_candidates") == cand.size, s"bands=$b candidates")
      assert(r.getAs[Long]("n_truth") == truth.size)
      val tp = (cand & truth).size
      assert(r.getAs[Long]("tp") == tp, s"bands=$b tp")
      assert(r.getAs[Long]("precision_bp") ==
        (if (cand.nonEmpty) tp.toLong * 10000 / cand.size else 0L))
      assert(r.getAs[Long]("recall_bp") ==
        (if (truth.nonEmpty) tp.toLong * 10000 / truth.size else 0L))
    }
    // nesting guarantee: a 2r-row band equals iff both constituent r-row
    // bands equal, so cand(2,8) ⊆ cand(4,4) ⊆ cand(8,2) — recall is
    // monotone in band count BY CONSTRUCTION; pin it
    val byBands = rows.map(r => r.getAs[Long]("bands") -> r.getAs[Long]("recall_bp")).toMap
    assert(byBands(8L) >= byBands(4L) && byBands(4L) >= byBands(2L),
      "recall must be monotone in band count (nested band structure)")
  }

  test("dq10: the signature actually catches a single-cell mutation, localized to its bucket") {
    import spark.implicits._
    val p = 1000000007L
    def sigs(rows: Seq[(Long, Long, Long, Int, Double, Double)]): Map[Long, Long] = {
      val df = rows.toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice")
      df.selectExpr("l_orderkey % 16 AS bucket",
          s"""(3 * l_orderkey + 5 * l_partkey + 7 * l_suppkey
             | + 11 * CAST(l_linenumber AS BIGINT)
             | + 13 * CAST(floor(l_quantity * 100) AS BIGINT)
             | + 17 * CAST(floor(l_extendedprice * 100) AS BIGINT)) % $p AS sig0""".stripMargin)
        .groupBy("bucket")
        .agg(expr(s"CAST(sum(CAST(sig0 AS DECIMAL(38,0))) % $p AS BIGINT)").as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val base = (1L to 64L).map(i => (i, i * 7, i * 3, i.toInt % 5, i * 1.25, i * 10.5))
    val clean = sigs(base)
    // flip one quantity cent in one row: ONLY that row's bucket moves
    val mutated = base.updated(9, base(9).copy(_5 = base(9)._5 + 0.01))
    val dirty = sigs(mutated)
    val moved = clean.keySet.filter(b => clean(b) != dirty(b))
    assert(moved == Set(base(9)._1 % 16),
      s"mutation must move exactly its own bucket, moved: $moved")
    // and a row swap BETWEEN buckets moves exactly those two buckets
    val swapped = base.updated(3, base(3).copy(_1 = 101L)) // bucket 4 → 5
    val swapSigs = sigs(swapped)
    val movedSwap = clean.keySet.filter(b => clean(b) != swapSigs(b))
    assert(movedSwap == Set(base(3)._1 % 16, 101L % 16), s"moved: $movedSwap")
  }

  test("q80: Holt fold matches the driver recurrence on RANDOM series (3 seeded trials, operator-level)") {
    // the q80 spec pins the corpus series; this pins the fold shape itself
    // on arbitrary integer series incl. negatives and short lengths
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(900 + seed)
      val n = 1 + rnd.nextInt(40)
      val xs = Seq.fill(n)(rnd.nextLong() % 1000000L) // signed values
      val got = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("t", "x")
        .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("ds"))
        .selectExpr(
          """aggregate(slice(ds, 2, size(ds) - 1),
            |  named_struct('l', ds[0].x, 'b', CAST(0 AS BIGINT)),
            |  (acc, e) -> named_struct(
            |    'l', (e.x + acc.l + acc.b) div 2,
            |    'b', (((e.x + acc.l + acc.b) div 2) - acc.l + acc.b) div 2)) AS st""".stripMargin)
        .selectExpr("st.l AS l", "st.b AS b").collect().head
      var l = xs.head; var b = 0L
      xs.tail.foreach { y =>
        val l2 = (y + l + b) / 2; b = (l2 - l + b) / 2; l = l2
      }
      assert(got.getLong(0) == l && got.getLong(1) == b, s"seed=$seed n=$n")
    }
  }

  test("dq11: k/l census recomputes driver-side and classes partition the table") {
    val rows = OpsQueries.dq11KAnonymity(spark, sf()).collect()
    val cust = spark.read.parquet(sf() + "/customer.parquet")
      .selectExpr("c_mktsegment AS s", "c_nationkey AS n",
        "CAST(floor(c_acctbal) AS BIGINT) div 1000 AS b")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("class_size")).sum == cust.length,
      "classes must partition the customer table")
    val expect = cust.groupBy(c => (c._1, c._2)).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._3).distinct.length.toLong)
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("qi_segment"), r.getAs[Int]("qi_nation"))
      val (sz, ld) = expect(k)
      assert(r.getAs[Long]("class_size") == sz, s"class $k size")
      assert(r.getAs[Long]("l_diversity") == ld, s"class $k l-diversity")
      assert(r.getAs[Long]("below_k5") == (if (sz < 5) 1L else 0L))
      assert(ld <= sz, "l can never exceed k")
    }
  }

  test("m17: tile grid covers every pixel exactly once and clamps at the edges") {
    val rows = OpsQueries.m17TilePlan(spark, sf()).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(byDoc.keySet == docs.toSet, "every document plans a grid")
    byDoc.foreach { case (id, ts) =>
      val w = 100 + id % 500; val h = 80 + id % 333
      val nx = (w + 127) / 128; val ny = (h + 127) / 128
      assert(ts.length == nx * ny, s"doc $id tile count")
      // exact coverage: tile areas sum to the pixel count (no overlap by
      // construction of the disjoint 128-grid)
      assert(ts.map(t => t.getAs[Long]("tile_w") * t.getAs[Long]("tile_h")).sum == w * h,
        s"doc $id pixel coverage")
      ts.foreach { t =>
        assert(t.getAs[Long]("tile_w") >= 1 && t.getAs[Long]("tile_w") <= 128)
        assert(t.getAs[Long]("tile_h") >= 1 && t.getAs[Long]("tile_h") <= 128)
        assert(t.getAs[Long]("x0") + t.getAs[Long]("tile_w") <= w)
        assert(t.getAs[Long]("y0") + t.getAs[Long]("tile_h") <= h)
      }
    }
  }

  test("dq12: lattice levels recompute driver-side; coarsening is monotone") {
    val rows = OpsQueries.dq12GeneralizationLattice(spark, sf()).collect()
      .sortBy(_.getAs[Long]("level"))
    assert(rows.map(_.getAs[String]("qi")).toSeq ==
      Seq("segment x nation", "segment x region", "segment"))
    val cust = spark.read.parquet(sf() + "/customer.parquet")
      .selectExpr("c_mktsegment AS s", "c_nationkey AS n").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val n2r = spark.read.parquet(sf() + "/nation.parquet")
      .selectExpr("n_nationkey", "n_regionkey").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    def audit[K](key: ((String, Int)) => K): (Long, Long, Long, Long) = {
      val ks = cust.groupBy(key).map(_._2.length.toLong)
      (ks.size.toLong, ks.min, ks.count(_ < 5).toLong, ks.filter(_ < 5).sum)
    }
    val expect = Seq(audit(identity), audit(c => (c._1, n2r(c._2))), audit(_._1))
    rows.zip(expect).foreach { case (r, (nc, mk, below, sup)) =>
      assert(r.getAs[Long]("n_classes") == nc, s"level ${r.getAs[Long]("level")}")
      assert(r.getAs[Long]("min_k") == mk)
      assert(r.getAs[Long]("classes_below_k5") == below)
      assert(r.getAs[Long]("suppressed") == sup)
      assert(r.getAs[Long]("suppressed_bp") == sup * 10000 / cust.length)
    }
    // coarsening merges classes: counts shrink, the minimum k cannot drop
    val ncs = rows.map(_.getAs[Long]("n_classes"))
    val mks = rows.map(_.getAs[Long]("min_k"))
    assert(ncs(0) >= ncs(1) && ncs(1) >= ncs(2), "class count must shrink with coarsening")
    assert(mks(0) <= mks(1) && mks(1) <= mks(2), "min k cannot drop when classes merge")
  }

  test("d28: matrix pair totals reconcile with the d27 truth set and its doc→source map") {
    val rows = OpsQueries.d28CrossSourceOverlap(spark, sf()).collect()
    // d27's spec recomputes the truth set independently; here reconcile the
    // MATRIX against the truth reported by d27 (same session, same corpus)
    val d27 = OpsQueries.d27LshTuning(spark, sf()).collect()
    val nTruth = d27.head.getAs[Long]("n_truth")
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nTruth,
      "matrix cells must partition the truth pair set")
    val srcDocs = spark.read.parquet(sf() + "/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"),
        "cells are canonical (source_a <= source_b)")
      assert(r.getAs[Long]("n_docs_a") == srcDocs(r.getAs[String]("source_a")))
      assert(r.getAs[Long]("pair_rate_bp") ==
        r.getAs[Long]("n_pairs") * 10000 / r.getAs[Long]("n_docs_a"))
    }
  }

  private def tokCount(text: String): Long =
    if (text == null || text.isEmpty) 0L
    else "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(text.toLowerCase).length.toLong

  test("t39: temperature weights recompute with exact integer sqrt; shares sum to ~10000 bp") {
    val rows = OpsQueries.t39TemperatureMix(spark, sf()).collect()
    val perSrc = spark.read.parquet(sf() + "/documents.parquet")
      .selectExpr("source", "coalesce(text, '') AS text").collect()
      .map(r => (r.getString(0), tokCount(r.getString(1))))
      .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sum }
    def isqrt(n: Long): Long = { // exact: correct the double sqrt by ±1
      var s = math.floor(math.sqrt(n.toDouble)).toLong
      if ((s + 1) * (s + 1) <= n) s += 1
      if (s * s > n) s -= 1
      s
    }
    val tTotal = perSrc.values.sum
    val sTotal = perSrc.values.map(isqrt).sum
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val n = perSrc(src)
      assert(r.getAs[Long]("tokens") == n, s"$src tokens")
      assert(r.getAs[Long]("sqrt_tokens") == isqrt(n), s"$src isqrt")
      assert(isqrt(n) * isqrt(n) <= n && (isqrt(n) + 1) * (isqrt(n) + 1) > n,
        "isqrt must be the exact integer square root")
      assert(r.getAs[Long]("w_t1_bp") == n * 10000 / tTotal)
      assert(r.getAs[Long]("w_t2_bp") == isqrt(n) * 10000 / sTotal)
      assert(r.getAs[Long]("w_inf_bp") == 10000L / perSrc.size)
    }
    for (cName <- Seq("w_t1_bp", "w_t2_bp", "w_inf_bp")) {
      val tot = rows.map(_.getAs[Long](cName)).sum
      assert(tot > 10000 - rows.length && tot <= 10000, s"$cName sums to $tot")
    }
    // temperature flattens: the smallest source's tau=2 weight can't be
    // below its tau=1 weight, and the largest source's can't be above
    val smallest = rows.minBy(_.getAs[Long]("tokens"))
    val largest = rows.maxBy(_.getAs[Long]("tokens"))
    assert(smallest.getAs[Long]("w_t2_bp") >= smallest.getAs[Long]("w_t1_bp"))
    assert(largest.getAs[Long]("w_t2_bp") <= largest.getAs[Long]("w_t1_bp"))
  }

  test("t40: next-fit packing recomputes under a driver-side fold for both policies") {
    val rows = OpsQueries.t40PackingEfficiency(spark, sf()).collect()
      .map(r => r.getAs[String]("policy") -> r).toMap
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .selectExpr("source", "doc_id", "coalesce(text, '') AS text").collect()
      .map(r => (r.getString(0), r.getLong(1), tokCount(r.getString(2))))
    assert(docs.forall(_._3 < 512), "window must exceed every doc (no split path)")
    def pack(ordered: Seq[Long]): Long = {
      var wins = 1L; var used = 0L
      ordered.foreach { t => if (used + t <= 512) used += t else { wins += 1; used = t } }
      wins
    }
    def total(by: Array[(String, Long, Long)] => Seq[Long]): (Long, Long) = {
      val bySrc = docs.groupBy(_._1)
      (bySrc.values.map(g => pack(by(g))).sum, docs.map(_._3).sum)
    }
    val (wIng, nTok) = total(_.sortBy(_._2).map(_._3))
    val (wSrt, _) = total(_.sortBy(d => (-d._3, d._2)).map(_._3))
    assert(rows("ingest_order").getAs[Long]("n_windows") == wIng)
    assert(rows("length_sorted").getAs[Long]("n_windows") == wSrt)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == nTok)
      val w = r.getAs[Long]("n_windows")
      assert(w >= (nTok + 511) / 512, "windows can never beat the volume bound")
      assert(r.getAs[Long]("padding_tokens") == w * 512 - nTok)
      assert(r.getAs[Long]("padding_bp") == (w * 512 - nTok) * 10000 / (w * 512))
    }
  }

  test("q80: Holt recursion reproduces under a driver-side BigInt fold") {
    val rows = OpsQueries.q80HoltForecast(spark, sf()).collect()
    assert(rows.length == 3)
    val monthly = spark.read.parquet(sf() + "/orders.parquet")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("t"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("t").agg(sum("c").as("x")).orderBy("t")
      .collect().map(_.getAs[Long]("x"))
    // BigInt fold; / on BigInt truncates toward zero for the signs involved
    var l = BigInt(monthly.head); var b = BigInt(0)
    monthly.tail.foreach { y =>
      val l2 = (y + l + b) / 2
      b = (l2 - l + b) / 2
      l = l2
    }
    rows.foreach { r =>
      val h = r.getAs[Long]("h")
      assert(BigInt(r.getAs[Long]("level_cents")) == l)
      assert(BigInt(r.getAs[Long]("trend_cents")) == b)
      assert(BigInt(r.getAs[Long]("forecast_cents")) == l + h * b, s"h=$h")
    }
  }
}
