package graft

import org.apache.spark.sql.functions._

/** Adversarial-input net: every documents-consuming declared query must
  * EXECUTE (no exception, no hang) on a corpus of edge-case rows — null
  * text, empty text, single char, mixed CJK/emoji, a 20k-char single
  * line, pathological whitespace. At 100 TB every one of these rows
  * exists somewhere in the corpus; an operator that throws on one poisons
  * its whole task (and with it the stage, job and pipeline).
  *
  * Queries that also read other tables get those fixtures copied in from
  * sf0.001 so the documents table is the only adversarial variable.
  */
class AdversarialInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("advspec").toString
    val docs = Seq(
      (1L, null.asInstanceOf[String], "en", "src0", 0L),
      (2L, "", "en", "src1", 0L),
      (3L, "a", "", "src2", 1L),
      (4L, "汉字テスト🙂 مرحبا мир a b the of and", "en", "src3", 30L),
      (5L, "x" * 20000, "en", "src0", 20000L),
      (6L, " \t\n\n  the   and of \n\n\n lines\n", "en", "src1", 30L),
      (7L, "the quick brown fox jumps over the lazy dog. " * 40, "en", "src2", 1800L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    // real embeddings sized to the doc ids so vector-join queries still run
    for (t <- Seq("embeddings", "events", "orders", "customer", "lineitem",
      "part", "nation", "region", "supplier")) {
      spark.read.parquet(sf() + s"/$t.parquet")
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  // documents-consuming queries (embeddings/events/orders fixtures are real)
  private val docQueries = Seq(
    "q03_filter", "q07_dedupe_first_wins", "q10_scalar_enrich",
    "q19_string_kernel", "q21_chunk_fixed", "q21_chunk_recursive",
    "t01_lang_id", "t02_quality", "t03_token_count", "t04_fingerprint",
    "t05_bpe_token_count", "t06_repetition", "t07_hash_split",
    "t08_top_vocab", "t09_c4_gates", "t10_pii_count", "t11_tfidf",
    "t12_stratified_sample", "t13_contamination", "t14_char_stats",
    "t15_weighted_sample", "t16_cms_heavy_hitters", "t17_phrase_search",
    "t18_familiarity", "t19_length_histogram",
    "d01_minhash_lsh", "d02_simhash", "d03_ngram_jaccard", "d16_containment",
    "d06_line_dedupe", "d07_line_rebuild", "d12_substring_dedupe",
    "r01_anonymize", "r03_conversation_explode", "m01_multimodal_meta",
    "m02_frame_sample", "m03_image_stats", "m04_audio_meta",
    "t20_bm25", "t23_bigram_novelty",
    "t21_token_shards", "t22_domain_mix", "t24_bloom_decontaminate",
    "t25_mix_execute", "dq01_expectations", "t26_bigram_surprisal",
    "t27_zipf_profile", "t28_rake_keywords", "dq06_quarantine_profile",
    "p01_pipeline",
    // round-11 selection family: t41's feature explode must survive the
    // null/empty/CJK rows, p05/t42's GlobalRank the tiny 7-row corpus
    // (fewer rows than range partitions), m14 the arbitrary doc_ids
    "t41_dsir_weights", "p05_skipping_index", "t42_vocab_coverage",
    "m14_jpeg_quality",
    // round-11 session-2 family: t43's URL parse on arbitrary ids/sources,
    // t44's winnow kernel on null/empty/1-char/20k-char texts, t45's KN
    // model on a 7-row corpus (singleton-heavy), d29's band join when one
    // side of the split may be EMPTY, s19's margin folds when a side has
    // fewer than k neighbors
    "t43_url_canonical", "t44_winnowing", "t45_kneser_ney",
    "d29_incremental_dedupe", "s19_bitext_mining")

  docQueries.foreach { name =>
    test(s"$name survives the adversarial corpus") {
      // execution is the assertion: no exception on null/empty/unicode/huge
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n >= 0)
    }
  }

  test("vector queries survive zero-norm and null embeddings, and emit no NaN") {
    val vdir = java.nio.file.Files.createTempDirectory("advvec").toString
    val base = spark.read.parquet(sf() + "/embeddings.parquet").limit(50)
    val dim = base.head.getAs[Seq[Float]]("embedding").length
    val zero = spark.range(1).select(
      lit(9001L).as("vec_id"),
      array_repeat(lit(0.0f), dim).as("embedding"), lit(1).as("label"))
    val nul = spark.range(1).select(
      lit(9002L).as("vec_id"),
      lit(null).cast(s"array<float>").as("embedding"), lit(2).as("label"))
    base.unionByName(zero).unionByName(nul)
      .write.mode("overwrite").parquet(s"$vdir/embeddings.parquet")
    spark.read.parquet(sf() + "/documents.parquet")
      .write.mode("overwrite").parquet(s"$vdir/documents.parquet")
    for (name <- Seq("s01_ann_brute_force", "q13_topk_cosine", "q13_topk_l2",
      "d04_embedding_near_dup", "s02_ann_lsh", "s06_ann_graph",
      // round-11: Lloyd/prune on null+zero-norm vectors (L2 basis — zero
      // norm is a VALID point there), NN contamination audit likewise
      "s16_kmeans_refine", "s17_d4_prune", "s18_semantic_contamination")) {
      val rows = SparkEntry.queries(name)(spark, vdir).collect()
      val nan = rows.exists(r => (0 until r.length).exists(i =>
        !r.isNullAt(i) && r.get(i).isInstanceOf[Double] &&
          r.getDouble(i).isNaN))
      assert(!nan, s"$name emitted NaN on zero-norm/null vectors")
    }
  }

  test("d29: every batch row receives a verdict — null text included (round-12 fix)") {
    // the r11 advisory scenario: a null-text batch row used to get a null
    // thash and vanish from n_batch through the firstInBatch inner join;
    // now text coalesces to '' before hashing, so the four classes
    // partition EVERY batch row of the adversarial corpus
    val out = SparkEntry.queries("d29_incremental_dedupe")(spark, dir).collect()
    val nBatch = out.map(_.getAs[Long]("n_batch")).sum
    val classed = out.map(r => r.getAs[Long]("n_exact_hist") +
      r.getAs[Long]("n_near_hist") + r.getAs[Long]("n_dup_in_batch") +
      r.getAs[Long]("n_net_new")).sum
    val batchRows = spark.read.parquet(s"$dir/documents.parquet")
      .filter(graft.operators.Sampling.hashBucket(col("doc_id")) >= 80)
      .count()
    assert(nBatch == batchRows,
      s"batch rows dropped from the report: n_batch=$nBatch, corpus=$batchRows")
    assert(classed == nBatch, "the four classes do not partition the batch")
  }

  test("chunkers cover the 20k-char single line completely") {
    val rows = SparkEntry.queries("q21_chunk_fixed")(spark, dir)
      .filter(col("doc_id") === 5L).collect()
    assert(rows.nonEmpty, "huge doc produced no chunk stats")
  }
}
