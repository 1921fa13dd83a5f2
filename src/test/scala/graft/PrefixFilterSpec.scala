package graft

import graft.operators.Dedupe
import org.apache.spark.sql.functions._

/** d25 — PPJoin-style prefix-filtered Jaccard join. The CORRECTNESS claim
  * is losslessness: the prefix-filtered pair set must EQUAL the full
  * inverted-index pair set (d03's formulation) for the same threshold.
  * The DuckDB oracle pins that at sf0.01/0.1; here we pin it in-engine on
  * the fixture corpus AND on seeded random corpora engineered to sit at
  * the τ boundary, where an off-by-one prefix length actually loses pairs.
  */
class PrefixFilterSpec extends SparkSpec {

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet

  test("d25 equals d03 on the fixture corpus (losslessness at τ=0.8)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val full = Dedupe.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      col("source"), minJaccard = 0.8)
    val pref = Dedupe.prefixFilterJaccardPairs(docs, col("doc_id"), col("text"),
      col("source"), minJaccard = 0.8)
    val (f, p) = (pairsOf(full), pairsOf(pref))
    assert(f.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(f == p, s"missing=${(f diff p).take(3)} extra=${(p diff f).take(3)}")
  }

  test("lossless on random near-threshold corpora (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // vocabulary with a skewed frequency profile: a few stopword-ish
    // tokens plus a long rare tail — the regime prefix filtering exploits
    val vocab = (0 until 40).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val docs = (0 until 60).map { i =>
        // clone-with-edits corpus: half the docs are perturbed copies of a
        // base doc, so many pairs land NEAR τ = 0.8 on both sides
        val base = (0 until 10 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).distinct
        val drop = if (rnd.nextBoolean()) base.drop(1) else base
        val add = if (rnd.nextBoolean()) drop :+ vocab(rnd.nextInt(vocab.size)) else drop
        (i.toLong, add.distinct.mkString(" "), "s" + (i % 2))
      }.toDF("doc_id", "text", "source")
      for (tau <- Seq(0.5, 0.8, 0.9)) {
        val f = pairsOf(Dedupe.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          col("source"), minJaccard = tau))
        val p = pairsOf(Dedupe.prefixFilterJaccardPairs(docs, col("doc_id"), col("text"),
          col("source"), minJaccard = tau))
        assert(f == p, s"trial=$trial tau=$tau missing=${(f diff p).take(3)} extra=${(p diff f).take(3)}")
      }
    }
  }

  test("lossless at τ whose double product rounds UP (ceil(0.55·100) regression)") {
    import spark.implicits._
    // 0.55 * 100 = 55.00000000000001 in IEEE doubles: a plain
    // ceil(sz·τ) computes 56, shortening the prefix and tightening the
    // length filter — both silently drop the exact-boundary pair below
    // (a 55-token doc fully contained in a 100-token doc has Jaccard
    // exactly 0.55). ceilTau's ε guard keeps the filter lossless.
    val big = (0 until 100).map(i => f"tok$i%03d")
    val small = big.take(55)
    val docs = Seq(
      (1L, big.mkString(" "), "s"),
      (2L, small.mkString(" "), "s")).toDF("doc_id", "text", "source")
    for (tau <- Seq(0.55, 0.54999999, 0.1, 0.33)) {
      val f = pairsOf(Dedupe.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        col("source"), minJaccard = tau))
      val p = pairsOf(Dedupe.prefixFilterJaccardPairs(docs, col("doc_id"), col("text"),
        col("source"), minJaccard = tau))
      assert(f == p, s"tau=$tau missing=${(f diff p).take(3)} extra=${(p diff f).take(3)}")
      if (tau <= 0.55) assert(f.exists(t => t._1 == 1L && t._2 == 2L),
        s"tau=$tau expected the contained pair to qualify")
    }
  }

  test("prefix index is strictly smaller than the full inverted index") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    // the efficiency claim behind the operator: tokens entering the
    // candidate join ≈ (1-τ)·sz+1 per doc vs sz for the full index
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(Dedupe.words(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
    val fullCount = tok.count()
    val szs = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      .agg(sum((ceil(col("sz") * 0.2) + 1).cast("double"))).head.getDouble(0)
    assert(szs < fullCount * 0.35,
      s"prefix bound $szs not well below full index $fullCount")
  }
}
