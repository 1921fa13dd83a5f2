package graft

import graft.operators.Dedupe
import org.apache.spark.sql.functions._

class DedupeSpec extends SparkSpec {

  test("exactFirstWins keeps exactly one row per hash, lowest order wins") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "other text"), (4L, "same text"))
      .toDF("id", "text")
    val out = Dedupe.exactFirstWins(df, sha2(col("text"), 256), col("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("lineDedupe flags only the global first occurrence of each line") {
    import spark.implicits._
    val df = Seq(
      (1L, "copyright footer\nunique one\ncopyright footer"),
      (2L, "  copyright footer  \nunique two"),
      (3L, "\n\n")) // no non-empty lines → absent from output
      .toDF("id", "text")
    val out = Dedupe.lineDedupe(df, col("id"), col("text"))
      .orderBy("id", "line_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, "copyright footer", 1), // global first
      (1L, 1, "unique one", 1),
      (1L, 2, "copyright footer", 0), // repeat within the same doc
      (2L, 0, "copyright footer", 0), // trimmed match across docs
      (2L, 1, "unique two", 1)))
  }

  test("shingles builds n-gram word shingles; short text gives empty array") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("s")
    val got = df.select(Dedupe.shingles(col("s"), 3)).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("shingles ignores a leading tab/newline (trim strips only spaces)") {
    import spark.implicits._
    // trim() removes spaces but NOT \t or \n, so split would yield a
    // leading "" token; shingles must filter it — the same tokenization
    // as MiningQueries.docShingles, by construction (round-13 fix for the
    // r12 advisory: the two truth sets must not diverge on such texts)
    val df = Seq("\ta b c d", "\na b c d", "a b c d").toDF("s")
    val got = df.select(Dedupe.shingles(col("s"), 3)).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq("a b c", "b c d"),
      Seq("a b c", "b c d")))
  }

  test("minhash signature is deterministic and identical for identical text") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val sigs = df.select(Dedupe.minhashSignature(Dedupe.shingles(col("text"), 3), 16))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(sigs(0) == sigs(1))
    assert(sigs(0).size == 16)
  }

  test("signatures from a distinct pre-shingled frame equal the text path") {
    import spark.implicits._
    // min-lanes are duplicate-insensitive, so signatures built over the
    // memoized DISTINCT shingle artifact (docShingles) must be
    // byte-identical to the raw text path — the r14 shared-signature
    // refactor (d01/d09/d27/d29) rests on this equality
    val df = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta alpha beta"),
      (2L, "  tab\tseparated words with  extra   spaces one two three "),
      (3L, "short doc"), // < 3 words: empty shingle set, absent both ways
      (4L, "one two three four five six seven eight nine ten")).toDF("id", "text")
    val fromText = Dedupe.minhashSignatures(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val shingled = df.select(col("id"),
      array_distinct(Dedupe.shingles(col("text"), 3)).as("gs"))
    val fromArt = Dedupe.minhashSignaturesFromShingles(shingled, col("id"), col("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fromText == fromArt)
    assert(!fromText.contains(3L)) // sub-3-word docs have no signature
  }

  test("minhashLshPairs finds exact duplicates and near-duplicates") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val near = base + "lambda mu"
    val other = "completely different words entirely unrelated content here now " * 5
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, other)).toDF("id", "text")
    val pairs = Dedupe.minhashLshPairs(df, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhashPairs: identical docs collide with hamming 0, distinct do not match") {
    import spark.implicits._
    val a = "one two three four five six seven eight nine ten " * 3
    val z = "apple orange banana cherry grape melon peach plum kiwi fig " * 3
    val df = Seq((1L, a), (2L, a), (3L, z)).toDF("id", "text")
    val pairs = Dedupe.simhashPairs(df, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash pigeonhole banding catches pairs differing only in high bits") {
    import spark.implicits._
    // fp 0x8001 vs 0x0001: hamming 1, but the differing bit (15) is in the
    // top byte — the old high-byte bucketing (fp >> 8) silently missed this
    // pair. Pigeonhole 4x4-bit segments guarantee a shared segment for any
    // hamming <= 3 pair (segments 0..2 here), so it must surface.
    val fps = Seq((1L, 0x8001L), (2L, 0x0001L), (3L, 0xFFFFL ^ 0x8001L))
      .toDF("id", "simhash")
    val pairs = Dedupe.simhashCandidatePairs(fps, bits = 16, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 1)))        // high-bit-only diff: now found
    assert(!pairs.exists(p => p._3 > 3))       // verification still exact
    assert(!pairs.exists(p => (p._1, p._2) == (1L, 3L))) // hamming 15: absent
  }

  test("ngramJaccardPairs computes exact word-set jaccard within blocks") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e", "blk"), (2L, "a b c d f", "blk"), (3L, "x y z", "blk"),
      (4L, "a b c d e", "other")).toDF("id", "text", "src")
    val out = Dedupe.ngramJaccardPairs(df, col("id"), col("text"), col("src"), 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // |{a,b,c,d} ∩| = 4, union = 6 → 4/6
    assert(math.abs(out((1L, 2L)) - 4.0 / 6.0) < 1e-12)
    assert(!out.contains((1L, 3L)))
    assert(!out.contains((1L, 4L))) // different block never compared
  }

  test("embeddingNearDupPairs finds same-direction vectors within a block") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 0), (4L, Seq(1.0f, 0.0f), 1))
      .toDF("id", "vec", "blk")
    val out = Dedupe.embeddingNearDupPairs(df, col("id"), col("vec"), col("blk"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("containmentPairs catches a subset-style dup that Jaccard misses") {
    import spark.implicits._
    // doc 1 is fully contained in doc 2, but doc 2 is 4x larger:
    // Jaccard = 4/16 = 0.25 (missed at 0.8); containment = 4/4 = 1.0
    val small = "alpha beta gamma delta"
    val big = small + " " + (1 to 12).map(i => s"filler$i").mkString(" ")
    val df = Seq((1L, small, "s"), (2L, big, "s"), (3L, "unrelated words here", "s"))
      .toDF("doc_id", "text", "source")
    val jac = Dedupe.ngramJaccardPairs(df, col("doc_id"), col("text"),
      col("source"), 0.8).count()
    assert(jac == 0, "Jaccard should miss the subset pair at 0.8")
    val out = Dedupe.containmentPairs(df, col("doc_id"), col("text"),
      col("source"), 0.9).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getAs[Double]("containment") == 1.0)
    assert(out.head.getAs[Long]("sz_min") == 4L)
  }

  test("d29: driver-side incremental-dedupe recount; classes partition the batch") {
    val P = 2147483647L
    def md5h32(s: String): Long = {
      val dd = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dd.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val fam = Dedupe.hashFamily(16) // the pinned (a,b) constants are data
    def sigOf(text: String): Option[Seq[Long]] = {
      val w = text.trim.toLowerCase.split("\\s+")
      if (w.length < 3) return None
      val hs = w.sliding(3).map(g => md5h32(g.mkString(" ")) % P).toSeq
      Some(fam.map { case (a, b) => hs.map(x => (x * a + b) % P).min })
    }
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val isHist = docs.map { case (id, _, _) => id -> (md5h32(id.toString) % 100 < 80) }.toMap
    val thash = docs.map { case (id, _, t) => id -> md5h32(t.trim.toLowerCase) }.toMap
    val sigs = docs.flatMap { case (id, _, t) => sigOf(t).map(id -> _) }.toMap
    def bandsOf(sig: Seq[Long]): Seq[(Int, String)] =
      (0 until 4).map(b => b -> sig.slice(b * 4, b * 4 + 4).mkString(":"))
    val histBands = sigs.filter { case (id, _) => isHist(id) }
      .toSeq.flatMap { case (id, sg) => bandsOf(sg).map(bk => bk -> id) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val histHashes = docs.collect { case (id, _, _) if isHist(id) => thash(id) }.toSet
    val batch = docs.filter { case (id, _, _) => !isHist(id) }
    val firstIn = batch.groupBy { case (id, _, _) => thash(id) }
      .map { case (h, rows) => h -> rows.map(_._1).min }
    val expected = batch.map { case (id, src, _) =>
      val nearHit = sigs.get(id).exists { sg =>
        bandsOf(sg).flatMap(histBands.getOrElse(_, Nil)).distinct.exists { hid =>
          sigs(hid).zip(sg).count { case (x, y) => x == y } >= 8
        }
      }
      val cls =
        if (histHashes(thash(id))) "dup_exact_hist"
        else if (nearHit) "dup_near_hist"
        else if (id != firstIn(thash(id))) "dup_in_batch"
        else "net_new"
      (src, cls)
    }.groupBy(_._1).map { case (src, rows) =>
      (src, rows.length.toLong,
        rows.count(_._2 == "dup_exact_hist").toLong,
        rows.count(_._2 == "dup_near_hist").toLong,
        rows.count(_._2 == "dup_in_batch").toLong,
        rows.count(_._2 == "net_new").toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.LlmQueries.d29IncrementalDedupe(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the four classes partition every batch row
    got.foreach { case (_, n, a, b, c, d) => assert(a + b + c + d == n) }
  }
}
