package graft

/** Physical-plan shape assertions: the plans we designed for, pinned so a
  * regression (lost broadcast, lost pushdown, lost TakeOrdered) fails a
  * spec instead of silently costing a shuffle at scale. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.queryExecution.executedPlan.toString
  }

  test("t43: canonicalization is one scan + one agg + TakeOrdered") {
    val p = plan("t43_url_canonical")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      s"canonicalization re-scans documents:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-15 degraded to a full sort:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"unexpected join in a pure projection+agg plan:\n${p.take(2000)}")
  }

  test("t44: the fused winnowing kernel is in the plan — the 29x-slower HOF spelling is not") {
    // the declared query materializes the per-doc frame (the kernel runs
    // at checkpoint-build time), so pin the pre-checkpoint projection
    import org.apache.spark.sql.functions.col
    val p = graft.core.Tables.documents(spark, sf())
      .select(graft.queries.SelectionQueries.winnowFids(col("text")).as("f"))
      .queryExecution.executedPlan.toString
    assert(p.contains("winnowed_fingerprints"),
      s"native winnow kernel missing from the plan:\n${p.take(2000)}")
    assert(!p.contains("array_min(transform("),
      s"interpreted HOF winnow crept back:\n${p.take(2000)}")
  }

  test("s18: eval side broadcasts (bounded benchmark artifact); argmax is a partial agg, not a window") {
    val p = plan("s18_semantic_contamination")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval-side broadcast lost:\n${p.take(2000)}")
    assert(p.contains("partial_max"),
      s"per-eval argmax lost map-side combine:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      s"argmax degraded to a window:\n${p.take(2000)}")
  }

  test("s19: exactly the two k-NN rank windows — nomination stays an argmax agg") {
    val p = plan("s19_bitext_mining")
    // "Window [" counts the window operators themselves, not the
    // WindowGroupLimit pushdowns the rk<=4 filter legitimately earns
    assert("Window \\[".r.findAllIn(p).size == 2,
      s"expected exactly 2 window operators (k-NN ranks):\n${p.take(3000)}")
    assert(p.contains("partial_max"),
      s"nomination argmax lost map-side combine:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-20 degraded to a full sort:\n${p.take(2000)}")
  }

  test("s19: candidate generation is the LSH bucket equi-join — never a product join") {
    // the round-12 contract: the |en|x|de| cross join is gone; candidates
    // come through the s02 sign-LSH tables as an equi-join on (tbl, bucket)
    // (pinned on the pre-checkpoint frame — the checkpoint hides it)
    val p = graft.queries.SelectionQueries.s19CandidatePairs(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"bitext candidate stage degraded to a product join:\n${p.take(3000)}")
    assert(p.contains("bucket"),
      s"LSH bucket key missing from the candidate join:\n${p.take(3000)}")
  }

  test("round-12 artifacts: s16/s17/d03/d05 read session-persisted builds, not rebuilt lineage") {
    // the build-once/read-many contract: after the artifact exists (first
    // invocation builds it), the query's own plan is rooted at the
    // checkpointed scan — no Lloyd rounds / shingle joins re-planned
    def p(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf())
      df.queryExecution.executedPlan.toString
    }
    Seq("s16_kmeans_refine", "s17_d4_prune", "d03_ngram_jaccard",
      "d05_dup_clusters").foreach { name =>
      val plan = p(name)
      assert(plan.contains("Scan ExistingRDD"),
        s"$name no longer reads its persisted artifact:\n${plan.take(2000)}")
      assert(!plan.contains("posexplode") && !plan.contains("Generate"),
        s"$name re-plans its build stage:\n${plan.take(2000)}")
    }
  }

  test("d29: the exact history check is a semi-join; verification never a product join") {
    val p = plan("d29_incremental_dedupe")
    assert(p.contains("LeftSemi"),
      s"exact-history check lost its semi-join shape:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"candidate verification degraded to a product join:\n${p.take(3000)}")
  }

  test("g11: top-25 is TakeOrdered; rounds never produce a product join") {
    val p = plan("g11_ppr")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(3000))
    // round-13 fold: the teleport full-outer is GONE — seed membership
    // rides the contribution aggregate's union
    assert(!p.contains("FullOuter"),
      s"teleport full-outer crept back into the round shape:\n${p.take(3000)}")
  }

  test("dq08: leakage audit is joinless — one scan, bit_or agg, no self-join (round 15)") {
    val p = plan("dq08_split_leakage")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      s"dq08 re-scans documents:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"the r15 redesign removed the gram self-join — a join is a regression:\n${p.take(2000)}")
    assert(p.contains("bit_or"),
      s"split-incidence mask agg missing:\n${p.take(2000)}")
  }

  test("g08: existing-edge anti-join folded into the wedge agg (round 13)") {
    val p = plan("g08_link_prediction")
    assert(!p.contains("LeftAnti"),
      s"adjacency screen regressed to the post-agg anti-join:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(3000))
  }

  test("g09: fused simultaneous rounds — both TakeOrdereds, no product join") {
    val p = plan("g09_hits")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(3000))
    // the doubled (side, vertex) frame is built ONCE as a checkpoint:
    // every round reads ExistingRDD blocks, not a re-derived edge join
    assert(p.contains("Scan ExistingRDD"),
      s"doubled edge frame lost its one-shot checkpoint:\n${p.take(3000)}")
  }

  test("t17: phrase search is the one-pass shingle shape (round 13)") {
    // pin the PRE-checkpoint frame (the final ckpt hides the probe
    // stage from the query's own plan — the s19CandidatePairs pattern)
    val p = graft.queries.LlmQueries.t17Scored(spark, sf())
      .queryExecution.executedPlan.toString
    // top-1 bigram via TakeOrdered over the vocab agg, probe via a
    // broadcast of that single row — the positional posting self-join
    // (two corpus-sized SortMergeJoins on doc_id) is gone
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      s"positional self-join crept back:\n${p.take(3000)}")
  }

  test("q81: spatial grid join stays an equi-join on the cell key — never a product join") {
    val p = plan("q81_spatial_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"grid blocking degraded to a product join:\n${p.take(3000)}")
  }

  test("dq10: checksum is ONE scan + one map-side-combinable agg") {
    val p = plan("dq10_table_checksum")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      s"checksum re-scans the table:\n${p.take(2000)}")
    assert(p.contains("partial_count"),
      s"bucket counts lost map-side combine:\n${p.take(2000)}")
  }

  test("p04: compaction agg reuses the per-source window clustering — one hash exchange") {
    val p = plan("p04_compaction_plan")
    // window needs hashpartitioning(source); the (source, bin) agg is
    // satisfied by that subset clustering — a second exchange is a regression
    assert("hashpartitioning".r.findAllIn(p).size <= 1,
      s"compaction plan reshuffled after the window:\n${p.take(3000)}")
  }

  test("q01: column pruning reaches the parquet scan") {
    val p = plan("q01_scan_project")
    // only the 3 needed columns (2 projected + sort tie-break) are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "scan reads unneeded columns")
    assert(!p.contains("l_shipdate"), "scan reads unneeded columns")
  }

  test("q03: equality predicate pushed to the scan") {
    val p = plan("q03_filter")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(lang,en)"), p.take(2000))
  }

  test("q06: dimension joins broadcast (no sort-merge for nation/region)") {
    val p = plan("q06_multi_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("q12: order+limit plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q12_order_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q13: single-query top-k is scan + TakeOrdered — no corpus shuffle") {
    val p = plan("q13_topk_l2")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query vector should broadcast")
  }

  test("q22: as-of join plans as ONE key shuffle + window — no join operator") {
    val p = plan("q22_asof_join")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(2000)}")
    assert(p.contains("Window"), "running-window match carrier missing")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one key shuffle:\n${p.take(2000)}")
    assert(p.contains("EqualTo(event_type,error)"), "event-type filter not pushed to scan")
  }

  test("t06: repetition aggs have map-side partial combine, no cartesian") {
    val p = plan("t06_repetition")
    assert(p.contains("partial_count"), "map-side partial aggregation lost")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "repetition signals degraded to a product join")
  }

  test("d02: simhash candidates = segment equi-join with hamming pushed into it") {
    val p = plan("d02_simhash")
    assert(p.contains("posexplode"), "pigeonhole segment explode missing")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "candidate generation degraded to all-pairs")
    assert(p.contains("bit_count"), "hamming verification missing from the plan")
  }

  test("s01: batched knn gets map-side WindowGroupLimit before the qid shuffle") {
    val p = plan("s01_ann_brute_force")
    // Spark's InferWindowGroupLimit turns rank<=k into a partial per-partition
    // top-k BEFORE the exchange — only <=k rows per query survive the map side.
    assert(p.contains("WindowGroupLimit"), s"rank-filter pushdown lost:\n${p.take(2000)}")
    assert(p.contains("Partial"), "map-side partial top-k lost")
  }

  test("q29: per-group top-k gets map-side WindowGroupLimit before the shuffle") {
    val p = plan("q29_group_topk")
    assert(p.contains("WindowGroupLimit"), s"rank-filter pushdown lost:\n${p.take(2000)}")
    assert(p.contains("Partial"), "map-side partial top-k lost")
  }

  test("q27: CUBE is one Expand + one aggregate pass — no per-grouping-set re-scan") {
    val p = plan("q27_cube")
    assert(p.contains("Expand"), s"cube should plan an Expand:\n${p.take(2000)}")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      "cube re-scans the input per grouping set")
  }

  test("q28: range join plans as the custom sort-merge interval exec") {
    val p = plan("q28_range_join")
    // RangeJoinExec prints as "RangeJoin <keys>" (nodeName strips "Exec")
    assert(p.contains("RangeJoin "),
      s"custom interval-join exec not planned:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"range join degraded to a product join:\n${p.take(2000)}")
    // the exec's key clustering feeds the per-left-row aggregation directly:
    // exactly one hashpartitioning per join side, none added for the agg
    assert("hashpartitioning".r.findAllIn(p).size <= 2,
      s"aggregation after the interval join reshuffled:\n${p.take(3000)}")
  }

  test("d14: sketch build is ONE map-side-combinable hash agg, no product joins") {
    val p = plan("d14_quantile_sketch")
    assert(p.contains("partial_count"), "bucket counts lost map-side combine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quantile sketch degraded to a product join:\n${p.take(2000)}")
  }

  test("s06: graph build and walk stay equi-joins — never a product join") {
    val p = plan("s06_ann_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"graph ANN degraded to a product join:\n${p.take(3000)}")
  }

  test("q39: both funnel stages plan the custom interval exec") {
    val p = plan("q39_funnel")
    // qc's subtree appears twice (feeds both qp and the s2 branch) + qp's
    assert("RangeJoin ".r.findAllIn(p).size >= 2,
      s"expected RangeJoinExec stages:\n${p.take(3000)}")
  }

  test("q31/q32: as-of variants keep the one-key-shuffle window plan (no join op)") {
    for (q <- Seq("q31_asof_tolerance", "q32_asof_forward")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not plan a join:\n${p.take(2000)}")
      assert(p.contains("Window"), s"$q: window match carrier missing")
      assert("hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: expected exactly one key shuffle:\n${p.take(2000)}")
    }
  }

  test("q30: pivot pre-aggregates per (key, value) before pivoting — no re-scan per value") {
    val p = plan("q30_pivot")
    // Spark's two-phase pivot: shuffle 1 aggregates to one row per
    // (returnflag, linestatus) — the data-shrinking step — and shuffle 2
    // pivots those tiny rows (pivotfirst). Both phases have map-side
    // partials; the fact table is scanned exactly once.
    assert(p.contains("pivotfirst"), s"pivot aggregation missing:\n${p.take(2000)}")
    assert(p.contains("partial_pivotfirst"), "map-side partial pivot lost")
    assert("hashpartitioning".r.findAllIn(p).size <= 2,
      s"pivot should need at most two key shuffles:\n${p.take(2000)}")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      "pivot re-scans the input per pivot value")
  }

  test("d06: first-occurrence choice is a PARTIAL min aggregate (map-side combine)") {
    val p = plan("d06_line_dedupe")
    // the whole point of the agg-join shape over a row_number window: a
    // boilerplate line repeated everywhere reduces per map task before the
    // line-keyed exchange instead of sorting in one task
    assert(p.contains("partial_min(struct"), s"map-side partial min lost:\n${p.take(2000)}")
    assert(!p.contains("row_number"), "first-occurrence degraded to a hot-key window sort")
  }

  test("t11: per-doc top-k terms gets map-side WindowGroupLimit before the shuffle") {
    val p = plan("t11_tfidf")
    assert(p.contains("WindowGroupLimit"), s"rank-filter pushdown lost:\n${p.take(2000)}")
    assert(p.contains("Partial"), "map-side partial top-k lost")
  }

  test("q35: salted join fans the dim out with explode under the join") {
    val p = plan("q35_salted_join")
    // the 0..buckets-1 sequence constant-folds to an array literal, so pin
    // the Generate node + the composite (key, __salt) join keys instead
    assert(p.contains("Generate explode("), s"salt fan-out missing:\n${p.take(2000)}")
    assert(p.contains("__salt"), "join keys lost the salt component")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "salted join degraded to a product join")
  }

  test("r01: anonymization is a narrow projection (no Exchange beyond the input repartition)") {
    val p = plan("r01_anonymize")
    // one round-robin repartition of the single-row-group input is expected;
    // the regex work itself must not introduce additional exchanges
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n${p.take(2000)}")
  }

  test("q40: global decile has no window operator at all — rank comes from the range shuffle") {
    val p = plan("q40_decile")
    assert(!p.contains("Window"),
      s"global rank degraded to a window (one-task sort at scale):\n${p.take(2000)}")
    assert(p.contains("rangepartitioning"), s"range shuffle missing:\n${p.take(2000)}")
  }

  test("t13: eval shingle set joins via broadcast — corpus side never shuffles for it") {
    val p = plan("t13_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval-set broadcast lost:\n${p.take(2000)}")
  }

  test("d08: centroid argmax is a partial hash agg, not a window sort") {
    // the full query checkpoints the assignment frame (3 consumers), which
    // truncates the visible plan to a LogicalRDD scan — pin the assignment
    // stage's shape on the pre-checkpoint helper instead
    val p = graft.queries.MiningQueries.d08Assignment(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max"), s"map-side argmax combine lost:\n${p.take(2000)}")
    assert(!p.contains("row_number"), "assignment degraded to a window sort")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "centroids should broadcast")
    val full = plan("d08_semdedup")
    assert(!full.contains("row_number"), "pair stage degraded to a window sort")
  }

  test("dq01: all six doc-side rules fuse into ONE wide documents scan") {
    val p = plan("dq01_expectations")
    // exactly 3 scans: the fused six-rule documents scan (wide), the
    // embeddings scan, and the referential join's documents scan — which
    // must stay pruned to doc_id alone (reusing the wide frame there
    // would read text twice; a 4th scan means a rule family fell out of
    // the fused aggregate)
    val scans = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toSeq
    assert(scans.size == 3, s"expected 3 scans:\n${scans.mkString("\n")}")
    assert(scans.count(_.contains("text:string")) == 1,
      s"text must be read exactly once:\n${scans.mkString("\n")}")
    assert(scans.count(_ == "ReadSchema: struct<doc_id:bigint>") == 1,
      s"referential check must prune to doc_id alone:\n${scans.mkString("\n")}")
  }

  test("dq07: FD audit is single-phase — no distinct-aggregate Expand") {
    val p = plan("dq07_fd_audit")
    assert(!p.contains("Expand"),
      s"count_distinct rewrite crept back (extra exchange per candidate):\n${p.take(3000)}")
    assert(p.contains("partial_min") || p.contains("partial_max"),
      s"min/max lost map-side combine:\n${p.take(2000)}")
  }

  test("q43: bucketed join reads co-located buckets — no exchange below the join") {
    val p = plan("q43_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n${p.take(2000)}")
    assert(p.contains("SelectedBucketsCount: 8 out of 8"),
      s"bucketed scan lost:\n${p.take(2000)}")
    // the ONLY exchanges are the post-join aggregate + final order — the
    // join itself must consume the bucketed layout directly
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"join re-shuffled bucketed inputs ($exchanges):\n${p.take(3000)}")
  }

  test("q41: range frame is one key shuffle + window, no self-join") {
    val p = plan("q41_range_frame")
    assert(!p.contains("Join"), s"range frame degraded to a join:\n${p.take(2000)}")
    assert(p.contains("Window"), "window operator missing")
  }

  test("q47: both median windows share ONE key shuffle") {
    val p = plan("q47_grouped_median")
    assert("hashpartitioning".r.findAllIn(p).size <= 2, // window + final agg
      s"median windows re-shuffled:\n${p.take(2000)}")
    assert(p.contains("Window"), "window operator missing")
  }

  test("q50: pigeonhole blocking stays an equi-join — never a product join") {
    val p = plan("q50_fuzzy_link")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy link degraded to a product join:\n${p.take(2000)}")
  }

  test("q49: skyline sweep has no product join (the O(n²) the sweep replaces)") {
    val p = plan("q49_skyline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline degraded to the quadratic plan:\n${p.take(2000)}")
  }

  test("d11: HLL registers partial-aggregate map-side before the bucket shuffle") {
    val p = plan("d11_hll_distinct")
    assert(p.contains("partial_max"), s"register max lost its partial:\n${p.take(2000)}")
  }

  test("q53: CDC merge is ONE hash aggregate — no window sort over the changelog") {
    val p = plan("q53_cdc_merge")
    assert(!p.contains("Window"), s"argmax degraded to a window:\n${p.take(2000)}")
    assert(p.contains("partial_max") || p.contains("partial_count"),
      "map-side partial aggregation lost")
  }

  test("q63: unpivot is a single-scan Expand — never a union of per-measure scans") {
    val p = plan("q63_unpivot")
    assert(p.contains("Expand"), s"unpivot lost the Expand shape:\n${p.take(2000)}")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"unpivot degraded to $scans scans:\n${p.take(2000)}")
  }

  test("q60: z-value is row-local — one shuffle to the tile aggregate (+ result sort)") {
    val p = plan("q60_zorder")
    // the bit-interleave fold must stay a projection; clustering must not
    // need a global sort — tile stats are one map-side-combinable aggregate
    assert(!p.contains("Join"), s"z-order clustering must not join:\n${p.take(2000)}")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"z-order clustering over-shuffles ($exchanges):\n${p.take(3000)}")
  }

  test("m19: video pixel decode is narrow — one scan, no join, only the fan-out + result-sort exchanges") {
    val p = plan("m19_mjpeg_pixels")
    assert("(?i)FileScan|BatchScan".r.findAllIn(p).size == 1,
      s"m19 re-scans documents:\n${p.take(2000)}")
    assert(!p.contains("Join"),
      s"synthesize->plan->decode->reduce must not join:\n${p.take(2000)}")
    // exactly 2: the documented Tables.table round-robin fan-out (heavy
    // narrow decode work parallelized off a single-file scan) + the
    // final ORDER BY range exchange — decode parallelism IS scan
    // parallelism, nothing else shuffles
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"m19 over-shuffles ($exchanges):\n${p.take(3000)}")
  }

  test("t21: shard window is partitioned by source — never a single-partition window") {
    val p = plan("t21_token_shards")
    assert(!p.contains("SinglePartition"),
      s"shard manifest degraded to a global window:\n${p.take(2000)}")
    assert(p.contains("Window"), "running-sum window missing")
  }

  test("t46: the pack's running total is the TeraSort shape — no SinglePartition window") {
    val p = plan("t46_sequence_pack")
    assert(!p.contains("Window"),
      s"global cumsum degraded to a window operator:\n${p.take(2000)}")
    assert(!p.contains("SinglePartition"),
      s"pack funnels the corpus through one task:\n${p.take(2000)}")
    assert(p.contains("RangePartitioning") || p.contains("rangepartitioning"),
      s"range shuffle missing from the prefix-sum plan:\n${p.take(2000)}")
  }

  test("minhash signatures over the shingle artifact aggregate exchange-free (r14)") {
    // The r14 shared-signature build rides docShingles' doc_id-clustered
    // checkpoint: Generate preserves its child's partitioning and the
    // per-id min-lane HashAggregate's ClusteredDistribution(id) is
    // satisfied by the checkpoint's HashPartitioning — so the signature
    // agg must plan with ZERO exchanges above the artifact. At 100 TB
    // this is a full corpus shuffle the text path paid and the artifact
    // path must never re-acquire. (Same expressions as the build body —
    // the memoized artifact itself returns an opaque checkpoint, so the
    // pin reconstructs the pre-checkpoint plan, the t44 discipline.)
    import org.apache.spark.sql.functions._
    val shingled = graft.core.Materialize.partitionedCheckpoint(
      graft.core.Tables.documents(spark, sf()).select(
        col("doc_id").as("id"),
        array_distinct(graft.operators.Dedupe.shingles(col("text"), 3)).as("gs")),
      "id")
    val p = shingled.select(col("id"), explode(col("gs")).as("sh"))
      .select(col("id"),
        (conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long") % 2147483647L).as("h"))
      .groupBy(col("id")).agg(min(col("h")).as("m"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"signature agg re-shuffles the clustered shingle artifact:\n${p.take(3000)}")
    assert(p.contains("HashAggregate") && p.contains("partial_min"),
      s"min-lane agg lost hash/partial form:\n${p.take(3000)}")
  }
}
