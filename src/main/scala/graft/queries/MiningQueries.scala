package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables._
import graft.operators.{Dedupe, GlobalRank, Hierarchy, RangeJoin, Sampling, ShortestPaths, Similarity, Triangles}

/** Round-6 mining surface: event-funnel analysis, exact global deciles via
  * distributed ranking, triangle counting, benchmark decontamination,
  * deterministic char-diversity quality stats, and centroid-partitioned
  * semantic dedupe. Same design rules as the rest of the catalog —
  * deterministic order, exact integer/decimal math, double folds only in
  * engine-identical evaluation order.
  */
object MiningQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Q39 — ordered event funnel (view → click → purchase, each step within
    * 6 h of the previous): the canonical product-analytics sequence query.
    * "Qualified" clicks have a view by the same user in the preceding
    * window; qualified purchases have a qualified click. Each step is a
    * [[RangeJoin]] interval join — planned as the custom sort-merge
    * interval exec ([[graft.plans.RangeJoinExec]]): one key shuffle per
    * side, sliding window buffer, never a per-user cross join — so the
    * chain survives hot users at 100 TB. Stage per user = deepest step
    * reached.
    *
    * r18 A/B, REJECTED: lazily checkpointing the narrow ev projection
    * (the plan re-scans events 7× across the filtered branches) measured
    * a wash — 1.347 vs 1.363 s min-of-2, same BenchOne session at sf0.1
    * (17 → 12 jobs, but the pushed-filter re-scans are page-cache-cheap
    * and the ckpt write eats the saving). The re-scan shape keeps
    * predicate pushdown at the source, which is the safer 100 TB posture
    * for a 4-column projection — kept. */
  def q39Funnel(s: SparkSession, d: String): DataFrame = {
    val L = 6L * 3600 * 1000000 // 6 hours in micros
    val ev = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), expr("ts DIV 1000").as("t"))
    val views = ev.filter(col("event_type") === "view").select(col("user_id"), col("t"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t"))
    val qc = RangeJoin.aggregateWithin(clicks, views, "user_id", "t", L,
        Seq("t"), Seq(count(col("r_t")).as("n_prior")))
      .filter(col("n_prior") > 0).select(col("user_id"), col("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("t"))
    val qp = RangeJoin.aggregateWithin(purchases, qc, "user_id", "t", L,
        Seq("t"), Seq(count(col("r_t")).as("n_prior")))
      .filter(col("n_prior") > 0).select(col("user_id")).distinct()
    ev.select(col("user_id")).distinct()
      .join(views.select(col("user_id")).distinct().withColumn("s1", lit(1)),
        Seq("user_id"), "left")
      .join(qc.select(col("user_id")).distinct().withColumn("s2", lit(1)),
        Seq("user_id"), "left")
      .join(qp.withColumn("s3", lit(1)), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("s3") === 1, 3).when(col("s2") === 1, 2)
          .when(col("s1") === 1, 1).otherwise(0).as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  /** Q65 — MARKOV TRANSITION MATRIX over the event stream: for each
    * ordered pair of consecutive events by the same user, count the
    * (from_type → to_type) transition and report the per-source-state
    * transition share in basis points — the product-analytics /
    * session-modeling counterpart of q39's fixed funnel (here the WHOLE
    * 5×5 behavior graph, not one path). Consecutiveness is a `lead`
    * window per user ordered by (time, event_id) — the event_id tie-break
    * makes same-timestamp bursts deterministic (the q61 sweep rule).
    *
    * Scale design: the lead window partitions by user_id — a spillable
    * per-user sort, never a global one; the transition frame is then
    * |types|² ≤ 25 rows, so the share window (PARTITION BY from_type)
    * runs on an aggregate-sized frame (the q62/dq02 discipline). */
  def q65MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("t"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .selectExpr("from_type", "to_type", "n",
        "n * 10000 div sum(n) OVER (PARTITION BY from_type) AS p_bp")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Q40 — exact decile profile of order values via [[GlobalRank]]: global
    * NTILE(10) computed from a distributed range-shuffle rank, NOT a
    * SinglePartition window (the plan a bare `ntile() OVER (ORDER BY ...)`
    * would produce — one task sorting everything). Exact decimal sums. */
  def q40Decile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    val n = o.count() // metadata-only parquet count
    val ranked = GlobalRank.withGlobalRank(o, Seq(col("o_totalprice"), col("o_orderkey")))
    ranked.withColumn("decile", GlobalRank.ntileExpr("global_rank", n, 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double").as("sum_price"))
      .orderBy(col("decile"))
  }

  /** G06 — DETERMINISTIC LABEL-PROPAGATION COMMUNITIES over the
    * co-purchase graph: every vertex starts in its own community; for a
    * fixed 3 rounds each vertex adopts the most frequent label among its
    * neighbors, ties broken by smallest label — the (count DESC, label
    * ASC) row_number makes classic LPA (normally run with random tie
    * flips) fully deterministic, so the assignment itself is
    * hash-checkable cross-engine. Complements the CC family (d05/d10
    * find connectivity; LPA finds DENSITY structure inside one component).
    *
    * Scale design (round-10 shape): the edge frame is a PARTITIONING-
    * RETAINING checkpoint ([[graft.core.Materialize]]) clustered on the
    * round-join key, so the graph side genuinely never re-shuffles —
    * each round is one small exchange of the vertex-sized label frame
    * (labels scale with vertices — never broadcast) plus one exchange of
    * the join output, feeding TWO map-side-combinable hash aggs —
    * (u,label) counts, then per-u argmax via `max(struct(c, -label))`
    * (count DESC, label ASC — NOTES rule). Round 1 is algebraically
    * specialized to a single min-neighbor aggregate (see lpaAssign).
    * Fixed round count = fixed plan depth — no data-dependent driver
    * loop, and the whole 3-round fixpoint runs as ONE action. */
  def g06LabelProp(s: SparkSession, d: String): DataFrame =
    // lazy ckpt before the presentation sort: orderBy's range-partitioner
    // SAMPLES its child, which would re-execute the whole 3-round fixpoint
    // (the d25 sort lesson); one materialization of the vertex-sized
    // assignment severs that (measured ~0.3 s at sf0.1)
    lpaAssign(s, d).localCheckpoint(false).orderBy(col("vertex"))

  /** The g06 assignment WITHOUT the final presentation sort, so composing
    * queries (g10 modularity) can consume it join-side without paying an
    * ordering they immediately destroy. Semantics are g06's exactly — the
    * shared [[lpaCtes]] oracle chain keeps the two declared queries
    * provably in sync. */
  private[queries] def lpaAssign(s: SparkSession, d: String): DataFrame =
    // round 12: the 3-round assignment is the community artifact g06
    // (the assignment report) and g10 (the modularity audit) both read —
    // memoized like d05Assigned/p03, the same shared-CTE pairing
    cachedFrame(s, d, "lpa3") {
      graft.core.Materialize.checkpointRetainingPartitioning(
        lpaAssignBuild(s, d))
    }

  /** Probe access to the un-memoized build (ProbeLpa3 plan dump only —
    * production consumers go through [[lpaAssign]]'s memoization). */
  private[graft] def lpaAssignBuildForProbe(s: SparkSession, d: String): DataFrame =
    lpaAssignBuild(s, d)

  private def lpaAssignBuild(s: SparkSession, d: String): DataFrame = {
    // partitioned on v — the per-round join key (e.v = lab.vertex); the
    // fused builder dedupes and clusters in the same shuffle (round 10)
    val e = doubledEdgesFused(s, d, "v")
    val shufN = s.sessionState.conf.numShufflePartitions
    // ROUND 1, algebraically specialized (round 10): initial labels are
    // the vertex ids themselves, and the edge set is distinct, so every
    // (u, label) count in round 1 is exactly 1 — the argmax by
    // (count DESC, label ASC) degenerates to min(neighbor). One map-side-
    // combinable agg replaces the join + repartition + double agg, and it
    // also absorbs lab0 (groupBy(u) enumerates every vertex with an
    // edge). The oracle keeps the unrolled l0/c1/l1 CTEs — results are
    // identical by the argument above, and the l3 hash pins it.
    var lab = e.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("vertex"), col("label"))
    for (_ <- 2 to 3) {
      // argmax by (count DESC, label ASC): max(struct(c, -label)) picks
      // the max count, ties to the SMALLEST label (labels are part keys
      // ≥ 0, negation is safe — invariant pinned in OpsQueriesSpec). ONE
      // explicit exchange on u feeds BOTH aggs — HashPartitioning(u)
      // satisfies ClusteredDistribution(u, label) as well as (u), so
      // neither groupBy inserts its own exchange (plan-verified); the old
      // shape paid two. Rounds are UNCHECKPOINTED (round 10): e is a
      // partitioning-retaining checkpoint so the graph side never
      // re-shuffles, each lab(r) has exactly one consumer, and two
      // unrolled rounds are shallow enough that lineage-cut jobs would
      // cost more than they save. r19: the lab side rides a shuffle_hash
      // hint. The old "hint-free beats a forced SHJ" measurement predates
      // the r12 memoization, when this fixpoint ran inline under AQE
      // (which broadcast the 4 MB label frame at bench scale); since r12
      // the build executes inside checkpointRetainingPartitioning's
      // AQE-OFF window, where hint-free STATIC planning picks
      // SortMergeJoin and re-sorts the edge-sized stream every round
      // (probe plan: plans/r19/lpa3_build_before.txt, SMJ + Sort(v) over
      // the edge checkpoint in both rounds). The hinted SHJ reads both
      // sides co-partitioned — e is hashpartitioning(v), lab arrives
      // hashpartitioning(u→vertex) from the previous round's agg — with
      // zero exchange and NO sorts; the label frame is vertex-sized,
      // never broadcast (the g04/g11 scale rule). Honest A/B (ProbeLpa3
      // clean probes, sf0.1): build 2.448 s SMJ vs 2.467 s SHJ — a WASH
      // at this SF (the edge sorts are ~60k rows); kept on the plan
      // evidence (plans/r19/lpa3_build_{before,after}.txt: 2 SMJ + 2
      // edge-stream sorts → 2 SHJ, 28 → 25 nodes) because the removed
      // work is O(E log E) per round vs an O(V) per-partition hash build
      // — the trade the g04/g11 hints already ship.
      val l = lab
      lab = e.join(l.hint("shuffle_hash"), e("v") === l("vertex"))
        .select(col("u"), col("label"))
        .repartition(shufN, col("u"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("vertex"), (-col("m.nl")).as("label"))
    }
    lab.select(col("vertex"), col("label").as("community"))
  }

  /** Shared oracle CTE chain for the 3-round deterministic LPA (g06 and
    * g10): `und` = the normalized co-purchase edge set, `l3` = the final
    * (vertex, label) assignment. Both consumers interpolate this prefix so
    * community semantics cannot drift between the assignment query and the
    * modularity audit built on it (the p03/d05 `dupAssignedCtes` rule). */
  private[queries] val lpaCtes: String =
    """WITH li AS (
         SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       ), und AS (
         SELECT DISTINCT a.pk AS u, b.pk AS v
         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       ), e AS (
         SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
       ), l0 AS (
         SELECT DISTINCT u AS vertex, u AS label FROM e
       ), c1 AS (
         SELECT e.u, l.label, count(*) AS c
         FROM e JOIN l0 l ON l.vertex = e.v GROUP BY e.u, l.label
       ), l1 AS (
         SELECT u AS vertex, label FROM (
           SELECT u, label,
                  row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
           FROM c1) t WHERE rn = 1
       ), c2 AS (
         SELECT e.u, l.label, count(*) AS c
         FROM e JOIN l1 l ON l.vertex = e.v GROUP BY e.u, l.label
       ), l2 AS (
         SELECT u AS vertex, label FROM (
           SELECT u, label,
                  row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
           FROM c2) t WHERE rn = 1
       ), c3 AS (
         SELECT e.u, l.label, count(*) AS c
         FROM e JOIN l2 l ON l.vertex = e.v GROUP BY e.u, l.label
       ), l3 AS (
         SELECT u AS vertex, label FROM (
           SELECT u, label,
                  row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
           FROM c3) t WHERE rn = 1
       )"""

  /** Q64 — HIERARCHY ROLLUP via [[Hierarchy]] pointer doubling: the part
    * catalog forms a decimal forest (parent = partkey div 10, keys < 10
    * are roots, depth ≤ 4 at sf0.1); resolve every part's root and depth
    * in 3 doubling joins (covers depth ≤ 8), then roll up per root —
    * subtree size, height, total depth. The oracle walks the same forest
    * with a RECURSIVE CTE — a completely different evaluation strategy
    * arriving at the same fixpoint, like d05 vs d10. */
  def q64HierarchyRollup(s: SparkSession, d: String): DataFrame = {
    val nodes = part(s, d).select(col("p_partkey").as("id"),
      when(col("p_partkey") < 10, lit(null).cast("long"))
        .otherwise(expr("p_partkey div 10")).as("parent"))
    Hierarchy.resolveRoots(nodes, "id", "parent", rounds = 3)
      .groupBy(col("root"))
      .agg(count(lit(1)).as("n_nodes"), max(col("depth")).as("max_depth"),
        sum(col("depth")).as("sum_depth"))
      .orderBy(col("root"))
  }

  /** G01 — triangle census of the co-purchase graph (parts linked when
    * they appear in the same order): [[Triangles]] with degree
    * orientation. The oracle counts the same triangles with the simple
    * a<b<c triple join — orientation is a physical rewrite that must not
    * change the count, exactly like q35's salting. */
  def g01Triangles(s: SparkSession, d: String): DataFrame =
    // assumeNormalized: coPurchaseEdges ends in filter(u < v).distinct()
    Triangles.stats(coPurchaseEdges(s, d), assumeNormalized = true)

  /** G03 — BFS hop counts within radius 3 of the seed parts (every 500th
    * part key) over the co-purchase graph: [[ShortestPaths.hops]] frontier
    * expansion — one equi-join shuffle per hop, visited set never
    * re-shuffled, lineage checkpointed per hop. The oracle is a bounded
    * recursive CTE computing min(hop) per reached vertex — the declarative
    * spec the Pregel loop must reproduce exactly (integer hops, so the
    * comparison is hash-exact). Completes the graph family: g01 counts
    * global structure, g02 local structure, g03 reachability. */
  def g03BfsHops(s: SparkSession, d: String): DataFrame = {
    val seeds = part(s, d).filter(col("p_partkey") % 500 === 0)
      .select(col("p_partkey").as("node"))
    // round 12: the hop joins read the SHARED u-clustered doubled-edge
    // artifact (same frame as g04/g11/g08) instead of re-doubling
    ShortestPaths.hopsOnDoubled(doubledEdgesFused(s, d, "u"), seeds, maxHops = 3)
      .orderBy(col("node"))
  }

  /** G07 — WEIGHTED shortest distances (Bellman-Ford, 3 relaxation
    * rounds) from the same seeds over the co-purchase graph with a
    * deterministic integer edge weight (1 + (u+v) mod 5 — symmetric, so
    * the undirected mirror carries the same cost both ways):
    * [[ShortestPaths.weightedDistances]] — one vertex-key equi-join + one
    * min-aggregate per round, lineage checkpointed. The weighted
    * complement of g03's hop counts: BFS radius answers "how far in
    * links", this answers "how far in cost", the routing/ETL-lineage-cost
    * semantic. Integer dist keeps min() hash-exact; the oracle is the
    * same relaxation unrolled as chained CTEs (d0→d3). */
  def g07WeightedPaths(s: SparkSession, d: String): DataFrame = {
    // round 12 (the r11 verdict's g07 item): the relaxation rounds share
    // the ONE u-clustered doubled-edge artifact with g03/g04/g11/g08 —
    // the symmetric weight (1 + (u+v) mod 5) is a narrow projection over
    // it, which retains the clustering, so no per-query re-double
    val dir = doubledEdgesFused(s, d, "u")
      .withColumn("w", ((col("u") + col("v")) % 5 + 1).cast("long"))
    val seeds = part(s, d).filter(col("p_partkey") % 500 === 0)
      .select(col("p_partkey").as("node"))
    ShortestPaths.weightedDistancesOnDoubled(dir, seeds, rounds = 3)
      .orderBy(col("node"))
  }

  /** G04 — PageRank (3 rounds, damping 0.85) over the co-purchase graph,
    * in SCALED-BIGINT arithmetic: ranks carried as p·10¹², every division
    * a truncating integer `div`. Floating-point PageRank cannot be
    * hash-checked across engines (per-vertex sums fold doubles in
    * engine-dependent order); integer truncation is bit-identical in
    * Spark and DuckDB, so the full 3-round fixpoint prefix hash-matches —
    * truncation loses < 10⁻¹² per op, identically on both sides.
    *
    * Shape per round (round-10): ranks ⋈ the partitioning-RETAINING
    * doubled-edge checkpoint ⋈ degrees — ALL THREE sides arrive clustered
    * on the src key (edges from [[graft.core.Materialize]], degrees from
    * an agg over them with its own partitioning-retaining checkpoint,
    * ranks because the previous round's dst-sum partitioning flows
    * through the alias-aware projection), so the only exchange a round
    * pays is the contribution sum per dst (map-side partial). Rank and
    * degree frames ride shuffle-hash hints: both are vertex-sized (never
    * broadcast — scale rule) and SMJ would sort the edge-sized stream per
    * round. Rounds are UNCHECKPOINTED — each rank frame has exactly one
    * consumer and the whole fixpoint runs as ONE action; only the final
    * presentation sort gets a lazy materialization (range-sampling would
    * re-execute the rounds — the d25 sort lesson). The oracle unrolls the
    * same three rounds as chained CTEs — fixed iteration count is what
    * makes an iterative algorithm a declarative, checkable query. */
  def g04PageRank(s: SparkSession, d: String): DataFrame = {
    val S = 1000000000000L // rank scale: p × 10^12
    val e = doubledEdgesFused(s, d, "u")
    // agg over the u-clustered checkpoint: no exchange; its own
    // partitioning-retaining ckpt feeds the metadata count AND every
    // round's join exchange-free
    val deg = graft.core.Materialize.checkpointRetainingPartitioning(
      e.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val n = deg.count()
    val p0 = S / n // integral: S div N, identical to the oracle's `//`
    // r19 (the r18 verdict's item-1 extension of the g05/g07 static-
    // fixpoint pattern): the whole 3-round loop is planned STATICALLY —
    // AQE off at plan-construction time, the existing shuffle_hash hints
    // pin the vertex-sized rank/degree sides as SHJ build sides against
    // the u-clustered edge checkpoint (zero join exchange; the only
    // shuffle per round stays the map-side-combined dst-sum), and the
    // final lazy localCheckpoint forces toRdd INSIDE the AQE-off window
    // so the conf restore cannot leak adaptive re-planning back into the
    // loop. Under AQE the same plan ran as a fan of per-stage scheduled
    // jobs; statically the fixpoint executes as ONE job (the g07
    // weightedDistances posture — its in-loop note measured 13 → 4 jobs
    // for the same shape). Plan-only change: operators and integers are
    // untouched, hash-verified at sf0.001/0.01/0.1.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    val fin = try {
      var p = deg.select(col("u").as("v"), lit(p0).as("p"))
      for (_ <- 1 to 3) {
        val contrib = e
          .join(p.withColumnRenamed("v", "u").hint("shuffle_hash"), Seq("u"))
          .join(deg.hint("shuffle_hash"), Seq("u"))
          .select(col("v"), expr("p div deg").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("s"))
        p = contrib
          .select(col("v"),
            (lit((15L * p0) / 100) + expr("(85 * s) div 100")).as("p"))
      }
      p.localCheckpoint(false) // lazy: pins the static plan, cuts the
      // presentation sort's range-sampling re-execution (the d25 lesson)
    } finally s.conf.set(aqeKey, prev)
    fin.orderBy(col("v")).select(col("v"), col("p").as("rank_scaled"))
  }

  /** G11 — PERSONALIZED PAGERANK from a seed set (the recommendation form
    * of g04: teleport returns to the SEEDS, not everywhere, so rank mass
    * concentrates in the seeds' neighborhoods — "parts relevant to THIS
    * catalog slice", the candidate generator behind co-purchase
    * recommendations at one structural level deeper than g08's common
    * neighbors): 3 rounds, damping 0.85, ranks in scaled BIGINT (p·10¹²,
    * g04's basis — float PPR never hash-checks; truncating `div` is
    * bit-identical cross-engine). Teleport per seed = (15·⌊S/|seeds|⌋)
    * div 100 every round — seeds keep their restart mass even when no
    * walk returns (the full-outer step), which is what separates PPR
    * from a truncated BFS-weighted count. Output: top-25 (TakeOrdered,
    * never a global sort).
    *
    * Shape per round: identical to g04 (ranks ⋈ u-clustered edge
    * checkpoint ⋈ degrees, shuffle-hash hints, one dst-sum exchange) plus
    * a full-outer with the seed frame whose contrib side arrives already
    * partitioned on v from the sum agg (exchange-reuse, no extra
    * shuffle). The rank frame starts SEED-sized and grows by one
    * neighborhood hop per round — strictly cheaper than g04's
    * vertex-sized rounds. Seed-set rule: |part|/500 — bounded the same
    * way as g03/g07's sources (a production run personalizing over an
    * unbounded seed list drops nothing: every join here is already
    * key-partitioned, never broadcast). */
  def g11PersonalizedPagerank(s: SparkSession, d: String): DataFrame = {
    val S = 1000000000000L // rank scale: p × 10^12, g04's basis
    val e = doubledEdgesFused(s, d, "u")
    val deg = graft.core.Materialize.checkpointRetainingPartitioning(
      e.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val seeds = part(s, d).filter(col("p_partkey") % 500 === 0)
      .select(col("p_partkey").as("v"))
      .localCheckpoint(false) // count + every round's outer join read it
    val nSeeds = seeds.count()
    val p0 = S / nSeeds
    val tele = (15L * p0) / 100
    // Round-13 (the r12 verdict's named lever): the teleport full-outer
    // folds INTO the contribution aggregate — seed rows ride the same
    // union as the edge-contribution rows with a null contribution and a
    // seed flag, so one groupBy(v) computes Σc AND seed membership and
    // the per-round join count drops from 3 to 2. Identical integers:
    // sum over nulls is null → coalesce 0, exactly the old full-outer's
    // missing-contrib case.
    // r19 (the r18 verdict's item-1 static-unroll extension, g04's twin):
    // AQE off at plan-construction time so the 3 rounds — SHJ-hinted
    // zero-exchange joins + one union-keyed contribution agg each — run
    // as ONE statically planned job instead of a fan of adaptive
    // stage-jobs; the lazy checkpoint of the final (vertex-bounded) rank
    // frame pins the plan inside the window and feeds the TakeOrdered
    // tail. Plan-only; hash-verified at sf0.001/0.01/0.1.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    val fin = try {
      var p = seeds.select(col("v"), lit(p0).as("p"))
      for (_ <- 1 to 3) {
        val contribRows = e
          .join(p.withColumnRenamed("v", "u").hint("shuffle_hash"), Seq("u"))
          .join(deg.hint("shuffle_hash"), Seq("u"))
          .select(col("v"), expr("p div deg").as("c"), lit(0).as("is_seed"))
        p = contribRows
          .unionByName(seeds.select(col("v"),
            lit(null).cast("long").as("c"), lit(1).as("is_seed")))
          .groupBy(col("v"))
          .agg(coalesce(sum(col("c")), lit(0L)).as("sm"),
            max(col("is_seed")).as("isd"))
          .select(col("v"),
            (when(col("isd") === 1, lit(tele)).otherwise(lit(0L)) +
              expr("(85 * sm) div 100")).as("p"))
      }
      p.localCheckpoint(false)
    } finally s.conf.set(aqeKey, prev)
    fin.orderBy(col("p").desc, col("v")).limit(25)
      .select(col("v"), col("p").as("rank_scaled"))
  }

  /** G05 — bounded-round k-CORE PEEL (k = 3) of the co-purchase graph:
    * repeatedly drop vertices with degree < k and the edges touching
    * them. The k-core is the standard dense-subgraph screen (spam/bot
    * rings, backbone extraction, community seeding); three peel rounds
    * make the iterative algorithm a fixed declarative query — g04's
    * fixed-iteration discipline — so the result is hash-checkable
    * against an oracle that unrolls the identical rounds as chained
    * CTEs. The bounded peel is a guaranteed OVER-approximation of the
    * true fixpoint core (peeling never removes a core vertex —
    * spec-pinned against a driver-side fixpoint), converging monotonely
    * from above as rounds are added.
    *
    * Shape per round: one map-side-combinable degree aggregate + two
    * hash semi-joins on the vertex key — everything partitions by vertex
    * id, nothing driver-side; edge frames localCheckpoint per round (the
    * L15/G3 lineage discipline: without it round r re-executes every
    * prior round per downstream branch). */
  /** r18 (the r17 verdict's item-4 experiment, measured 2.62 → 1.42 s
    * min-of-2 / 14 → 3 jobs in one BenchOne session at sf0.1): the g07
    * static-fixpoint pattern applied to the peel — AQE off for the loop,
    * shuffle_hash hints, lazy per-round checkpoints, and an ORIENTATION
    * SWAP that halves the edge-sized exchanges per round. The doubled
    * frame is symmetric, so "drop edges with a dead endpoint" can run as
    * two u-side semi-joins with a column swap between them: filter on u
    * (zero-exchange — frame and surv both u-clustered), swap (u,v), then
    * filter on u again (ONE edge exchange that also re-establishes the
    * u-clustering the next round's degree agg needs). The pre-r18 shape
    * paid two edge exchanges per round (join on v + re-cluster on u) and
    * ran 14 AQE jobs. Set equality: e symmetric ⇒
    * {(b,a) : (a,b) ∈ e, a,b alive} is exactly the both-endpoints-alive
    * subset, so each round's frame — and every degree count over it — is
    * identical to the old shape's (oracle hash unchanged, compare.py).
    * With the rounds now re-clustering on ONE key per round, the shared
    * u-clustered fused artifact is the right seed (the r10/r12 fused-vs-
    * per-query A/B predated the swap; re-measured as part of the 1.42 s
    * number — the per-execution doubledEdges eager ckpt job is gone). */
  private[queries] def g05KcoreStatic(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    try {
      var e = doubledEdgesFused(s, d, "u")
      for (_ <- 1 to 3) {
        val surv = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("u"))
          .localCheckpoint(false) // two consumers (both semi-join sides)
        e = e.join(surv.hint("shuffle_hash"), Seq("u"))
          .select(col("v").as("u"), col("u").as("v"))
          .join(surv.hint("shuffle_hash"), Seq("u"))
          .select(col("u"), col("v"))
          .localCheckpoint(false)
      }
      e.groupBy(col("u")).agg(count(lit(1)).as("deg_in_core"))
        .select(col("u").as("vertex"), col("deg_in_core"))
        .orderBy(col("vertex"))
    } finally s.conf.set(aqeKey, prev)
  }

  /** r18 session-2 re-measurement (the interrupted session's 1.42 s claim
    * re-checked before shipping): full-Bench IN-CONTEXT min-of-2 at sf0.1
    * reads static 1.96 s vs the old AQE-loop shape's 2.42 s on the same
    * host's round-start baseline window (r16 driver: 2.80 s; r17 loaded
    * driver: 5.70 s) — the static shape stays the winner where it counts.
    * CAVEAT measured and recorded: in SHORT BenchOne sessions right after
    * a codegen-heavy UDF query (m09), BOTH shapes read 3-12 s (old shape
    * 9.5 s, static 12.6 s, same data, same plans, executor-CPU-bound with
    * identical per-stage record counts) — a JIT-compilation-backlog
    * artifact of micro-sessions without the full warm-up pass, NOT a plan
    * property: Bench's full 233-query warm-up drains the compile queue
    * before any timed run, and repeated invocations decay back to
    * 2.1-2.7 s isolated. Event-log evidence in NOTES (r18): per-stage
    * record counts identical across fast/slow runs while executor run
    * time varied 12x (155 vs 12.5 CPU-s on the same stage, gc minor). */
  def g05Kcore(s: SparkSession, d: String): DataFrame =
    g05KcoreStatic(s, d)

  /** The g01–g07 input graph — ONE definition so the queries can never
    * silently analyze different graphs: parts are linked when they
    * appear in the same order.
    *
    * INVARIANT (load-bearing downstream): vertex ids are part keys and
    * therefore NON-NEGATIVE. Three argmax sites (lpaAssign here, plus the
    * Probe/PlanCheck test-scope mirrors) encode "(count DESC, label ASC)"
    * as `max(struct(c, -label))`, which silently flips the tie-break for
    * negative labels (and overflows at Long.MinValue). The invariant is
    * asserted in OpsQueriesSpec ("co-purchase vertex ids are non-negative")
    * — any future graph source with signed ids must fix the argmax
    * encoding, not just the source.
    *
    * Shape note (measured, kept as the record of a rejected rewrite): a
    * basket-explode variant — groupBy(order) → sort_array(collect_set) →
    * per-array pair generation — produces the identical edge set with one
    * fewer exchange and won in isolation (1.4 s vs 2.0 s at sf0.1), but
    * LOST end-to-end across g01–g07 (+5 s family-wide, two A/B runs):
    * AQE coalesces the small basket aggregate to ~1 partition, so the
    * combination explode and the dedupe's map side run single-threaded,
    * and the union-of-both-directions consumers get no exchange reuse
    * across children for the generator shape. The self-join keeps the
    * pair generation spread across the join's full partition set. At
    * 100 TB the basket aggregate would NOT coalesce (output is
    * data-sized) and the explode variant becomes the right shape — this
    * is a bench-scale physical choice, not a semantic one. */
  /** Round-12 (the r11 verdict's graph-floor item): the co-purchase graph
    * is ONE persisted artifact shared by the whole g-family — the scaladoc
    * below already says "ONE definition so the queries can never silently
    * analyze different graphs"; this makes the MATERIALIZATION one too.
    * Memoized per (SparkContext application, sf dir, shape tag), exactly
    * the kmFit/s03-index lifecycle: a production graph job materializes
    * the edge table once (the reference's own Dagster design persists
    * every asset) and each analysis query reads it, instead of each query
    * re-running the fact-table self-join + distinct. */
  private def cachedFrame(s: SparkSession, d: String, tag: String)(
      build: => DataFrame): DataFrame =
    graft.core.ArtifactRegistry.cached(
      (s.sparkContext.applicationId, d), tag)(build)

  /** The per-document DISTINCT word-trigram shingle table (doc_id,
    * gs array<string>) — the ONE tokenization the dedupe/decontamination
    * family reads (d16's posture), memoized per (application, sf dir)
    * with a doc_id-clustered eager checkpoint. Shared by t24 (Bloom-
    * tiered decontamination), t13 (exact decontamination) and d09 (the
    * sketch-accuracy audit): per-doc array_distinct + explode equals the
    * old per-consumer explode + global distinct because doc_id is part
    * of the pair key. Tokenizer identical to d03's (lower, trim,
    * whitespace split, empty tokens filtered). */
  private[queries] def docShingles(s: SparkSession, d: String): DataFrame =
    cachedFrame(s, d, "docsh3") {
      graft.core.Materialize.partitionedCheckpoint(
        documents(s, d).select(col("doc_id"),
          expr("""filter(split(trim(lower(text)), '\\s+'), w -> length(w) > 0)""").as("ws"))
        .select(col("doc_id"), expr(
          """CASE WHEN size(ws) >= 3
            |  THEN array_distinct(transform(sequence(0, size(ws) - 3),
            |         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
            |  ELSE array() END""".stripMargin).as("gs")), "doc_id")
    }

  /** The corpus MinHash signature table, built FROM [[docShingles]] —
    * round 14: the signature build previously re-scanned and re-shingled
    * documents (the one remaining duplicate tokenization in the dedupe
    * family after d16/t24/d09 unified on the shingle artifact); min-lanes
    * are duplicate-insensitive so the artifact's distinct arrays yield
    * byte-identical signatures (DedupeSpec pins the equality). Shared by
    * d01, d09, d27 and d29 — the build ledger charges ONE shingle pass +
    * one signature agg for the whole family. */
  private[queries] def minhashSigShared(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedupe.minhashSignaturesFromShingles(
      docShingles(s, d), col("doc_id"), col("gs"))

  private[queries] def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    cachedFrame(s, d, "und") {
      graft.core.Materialize.checkpointRetainingPartitioning(
        coPurchaseEdgesBuild(s, d))
    }

  private def coPurchaseEdgesBuild(s: SparkSession, d: String): DataFrame = {
    // tableRaw, not lineitem(): the first operation is the ok-shuffle of
    // the self-join, so Tables.parallelize's round-robin fan-out would be
    // a pure extra pass over the fact table (measured 1.6 -> 0.7 s for
    // this build at sf0.1, Probe round 10)
    val li = tableRaw(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    // SHUFFLE_HASH, not broadcast (round-9, measured 1.52→0.66 s at
    // sf0.1): at bench scale the 600 k-row side slips under the
    // auto-broadcast threshold and the driver builds a 600 k-key hash
    // relation SINGLE-THREADED — half the edge-build cost. The hint is
    // also the honest 100 TB shape: a fact-table self-join on the order
    // key can never broadcast and SHJ beats SMJ (no sorts) on
    // co-partitioned shuffles.
    val b = li.select(col("ok"), col("pk").as("v")).hint("shuffle_hash")
    a.join(b, Seq("ok")).filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
  }

  /** The doubled (both-directions) edge frame every iterative graph query
    * joins once per round, built for round reuse:
    *
    *  - ONE generate pass (explode of the two orientations) instead of a
    *    self-union — the union shape reads the normalized edge set twice
    *    and only ReuseExchange saves it from running the pair-generation
    *    twice; the explode is guaranteed single-pass.
    *  - materialized via [[graft.core.Materialize.partitionedCheckpoint]]
    *    (round 10): the eager checkpoint is taken with AQE briefly off, so
    *    the LogicalRDD RETAINS HashPartitioning(key) and every per-round
    *    join/agg keyed on it reads the checkpoint blocks in place with NO
    *    exchange — the r9 shape repartitioned before an AQE checkpoint,
    *    which only balanced the blocks (partitioning was lost) and each
    *    round still re-shuffled the graph side. Plan-verified in Probe:
    *    the round join is `Scan ExistingRDD` with no Exchange above it. */
  private[queries] def doubledEdges(und: DataFrame, key: String): DataFrame =
    graft.core.Materialize.partitionedCheckpoint(
      und.select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v")),
      key)

  /** [[coPurchaseEdges]] + [[doubledEdges]] in ONE exchange fewer: the
    * pair join's output is exploded into both orientations FIRST, then a
    * single hash repartition on the round-join key doubles as the dedupe
    * shuffle (`dropDuplicates(u, v)` over HashPartitioning(key) — key ⊆
    * {u, v} so the dedupe aggregate inserts no second exchange). Identical
    * edge set to doubledEdges(coPurchaseEdges(..)): (u,v)-dedupe of the
    * doubled multi-set == doubling of the (u<v)-distinct set, because
    * doubling preserves multiplicity per orientation. Saves the separate
    * distinct exchange of the undirected half (~0.2 s at sf0.1; one full
    * edge shuffle at any scale). */
  private[queries] def doubledEdgesFused(s: SparkSession, d: String,
      key: String): DataFrame = cachedFrame(s, d, s"dbl_$key") {
    if (key != "u")
      // Round-13: any non-canonical key DERIVES from the u-keyed artifact
      // — one edge-sized exchange of the already-deduped frame, instead
      // of re-running the basket self-join + dedupe per key (the dbl_v
      // build paid the full chain again; the ArtifactRegistry's per-key
      // locks make this nested build legal). Same edge set, different
      // clustering.
      graft.core.Materialize.partitionedCheckpoint(
        doubledEdgesFused(s, d, "u"), key)
    else {
      val li = tableRaw(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val a = li.select(col("ok"), col("pk").as("u"))
      val b = li.select(col("ok"), col("pk").as("v")).hint("shuffle_hash")
      graft.core.Materialize.dedupedPartitionedCheckpoint(
        a.join(b, Seq("ok")).filter(col("u") < col("v"))
          .select(explode(array(
              struct(col("u").as("a"), col("v").as("b")),
              struct(col("v").as("a"), col("u").as("b")))).as("s"))
          .select(col("s.a").as("u"), col("s.b").as("v")),
        keys = Seq(key), dedupeKeys = Seq("u", "v"))
    }
  }

  /** T24 — BLOOM-TIERED DECONTAMINATION: t13's eval-overlap screen
    * restructured the way a 100 TB corpus actually runs it — phase 1
    * probes every corpus shingle against a Bloom BIT TABLE of the eval
    * set (d18's filter; ≤ min(4·|eval shingles|, m = 2²⁰) rows BY
    * CONSTRUCTION, so the broadcast is bounded no matter how big the
    * benchmark suite grows — a raw shingle-set broadcast has no such
    * bound), phase 2 exact-confirms ONLY the candidates. The per-doc
    * output carries the tier accounting — candidates, exact hits, and
    * bloom false positives — so the filter's precision is measured in
    * the result itself (the d18/d09 audit discipline), and a doc is
    * `contaminated` ONLY on an exact hit: the Bloom tier can never
    * change the answer, only the work.
    *
    * Same tokenizer/shingles as t13 (proven cross-engine pair). Bit
    * positions use Kirsch–Mitzenmacher double hashing — lane l probes
    * (w1 + l·w2) mod m with both 32-bit words drawn from ONE md5 (chars
    * 1–8 and 9–16) — the standard Bloom construction: k independent
    * hashes from two, so the probe costs one digest per shingle instead
    * of four (measured 0.83 s → ~0.2 s for the corpus probe at sf0.1). */
  def t24BloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val m = 1 << 20
    // Round-10: per-doc shingle dedupe moves INSIDE the row —
    // array_distinct on the shingle array before any explode. A doc's
    // shingles all live in its own (pre-explode) row, so the old
    // corpus-wide distinct() was shuffling ~2M (doc, shingle) rows to
    // dedupe data that never left its row; now the dedupe is narrow, the
    // checkpoint materializes per-doc ARRAYS with zero exchanges, and
    // n_shingles falls out as size(gs) instead of a count aggregate.
    val docSh = docShingles(s, d)
      // doc_id-clustered partitioning-retaining ckpt: the probe filter and
      // explode are narrow, so the per-doc candidate aggregate and both
      // final joins inherit the clustering and insert no exchange
    val sh = docSh.select(col("doc_id"), explode(col("gs")).as("g"))
    // ONE eval-side action (round 13): the distinct eval shingle set is
    // bounded BY CONSTRUCTION (benchmarks are thousands of docs), so it
    // collects once; the Bloom bit table is then folded on the DRIVER
    // with the byte-identical md5 lanes (Spark's md5() is the UTF-8
    // digest hex — same w1/w2 words, same Kirsch–Mitzenmacher positions),
    // and the exact-tier join side is rebuilt as a LocalRelation from the
    // same array. The r12 shape paid an eager checkpoint job PLUS a
    // second collect action for bits that are a pure function of strings
    // already in driver memory.
    // Round-14 (ADVICE): the collect is CAPPED at m — the limit bounds
    // the transfer structurally (a runaway eval tier can never OOM the
    // driver), and the require states the design contract: past m
    // distinct shingles the m-bit filter saturates and this tiering is
    // the wrong plan — an eval set that scales with the corpus keeps the
    // exact tier's DISTRIBUTED distinct instead (t13's shape).
    val evalShArr = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      .limit(m + 1).collect().map(_.getString(0))
    require(evalShArr.length <= m,
      s"t24: eval tier exceeds the $m-bit Bloom capacity — use the " +
        "distributed exact tier (t13) for corpus-scaled eval sets")
    // Round-10 (unchanged contract): the bit table ships back as ONE
    // array-of-longs literal (m/64 = 16 Ki longs = 128 KiB, bounded no
    // matter how big the eval suite grows — the same move Spark's own
    // runtime Bloom-filter join makes). The corpus probe is a NARROW
    // filter — four md5 lane bits against the literal.
    // Round-14: ONE digest per shingle. The old filter spelled
    // md5(g) inside every lane term (up to 8 evaluations per row — CSE
    // does not rescue it: Catalyst splits the conjunction and re-inlines
    // any Project alias back into the pushed-down predicates, so a
    // w1/w2 projection is NOT a fix). Moving the digest INSIDE the
    // explode's transform makes the generator the optimization barrier:
    // filters on generated output cannot push below the Generate, so the
    // hex is computed exactly once per (doc, shingle) and the lanes are
    // substring+conv arithmetic. Measured at sf0.1 (min-of-2, normalized
    // to a same-window g03 control — the host drifts ±30%):
    // t24/control 0.91 → 0.70, a ~23 % relative cut.
    def bloomBit(l: Int): org.apache.spark.sql.Column =
      (col("w1") + lit(l.toLong) * col("w2")) % m
    val words = new Array[Long](m / 64)
    val digest = java.security.MessageDigest.getInstance("MD5")
    evalShArr.foreach { g =>
      val hex = digest.digest(g.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val w1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val w2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      for (l <- 0 until 4) {
        val b = ((w1 + l * w2) % m).toInt
        words(b >> 6) |= 1L << (b & 63)
      }
    }
    val evalSh = { import s.implicits._; evalShArr.toSeq.toDF("g") }
    // the literal stays INSIDE the filter expression (a shared constant,
    // evaluated by reference) — adding it as a withColumn would serialize
    // the 128 KiB array into every corpus row (measured 3.2 s vs 1.x s)
    val bitmap = typedLit(words.toSeq)
    val corpus = docSh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        explode(expr("transform(gs, x -> struct(x AS g, md5(x) AS h))")).as("s"))
      .select(col("doc_id"), col("s.g").as("g"),
        conv(substring(col("s.h"), 1, 8), 16, 10).cast("long").as("w1"),
        conv(substring(col("s.h"), 9, 8), 16, 10).cast("long").as("w2"))
    def laneOk(l: Int): org.apache.spark.sql.Column = {
      val b = bloomBit(l)
      val word = element_at(bitmap, (b / 64).cast("int") + 1)
      call_function("shiftright", word, (b % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }
    val cand = corpus
      .filter((0 until 4).map(laneOk).reduce(_ && _))
      .select(col("doc_id"), col("g"))
    // The exact tier and the candidate count share ONE pass — left-join
    // the (distinct-per-g) eval flag onto the candidates and compute
    // n_cand + n_exact in the same per-doc aggregate; the Bloom tier can
    // never change the answer, only the work: a doc is contaminated ONLY
    // on an exact hit.
    val perDoc = cand
      .join(broadcast(evalSh.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_cand"), count(col("hit")).as("n_exact"))
    // narrow: the per-doc array IS the distinct-shingle set (no aggregate),
    // and docSh already covers EVERY document (built from an unfiltered
    // scan), so it IS the output spine — the old extra documents re-scan +
    // left join added a third corpus scan for rows shCnt always had
    val shCnt = docSh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_shingles"))
    shCnt
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "coalesce(n_shingles, CAST(0 AS BIGINT)) AS n_shingles",
        "coalesce(n_cand, CAST(0 AS BIGINT)) AS n_bloom_candidates",
        "coalesce(n_exact, CAST(0 AS BIGINT)) AS n_exact_hits",
        "coalesce(n_cand, CAST(0 AS BIGINT)) - coalesce(n_exact, CAST(0 AS BIGINT))" +
          " AS n_bloom_fp",
        "CAST(coalesce(n_exact, CAST(0 AS BIGINT)) > 0 AS INT) AS contaminated")
      // d03's sort-sampling rule: everything from the doc_id-clustered
      // checkpoint to here is narrow or exchange-free, so without a
      // materialization the range sort's sampling pass re-executes the
      // whole per-shingle md5 probe (measured 2.37 → 1.5 s at sf0.1)
      .localCheckpoint(false)
      .orderBy(col("doc_id"))
  }

  /** T13 — benchmark decontamination: flag training documents sharing any
    * word-trigram shingle with the held-out eval slice (doc_id % 97 = 0 —
    * the stand-in for a benchmark suite). The eval shingle set is small by
    * construction (benchmarks are thousands of docs, the corpus is
    * billions), so it BROADCASTs and the corpus-side scan stays
    * shuffle-free up to the per-doc aggregate — the GPT-3/Pile n-gram
    * decontamination shape. Tokenizer identical to d03's (lower, trim,
    * whitespace split). */
  def t13Contamination(s: SparkSession, d: String): DataFrame = {
    // round 12: reads the shared per-doc distinct-shingle artifact
    // ([[docShingles]] — same tokenizer, same 3-gram window; the per-doc
    // array_distinct + explode IS the old explode + global distinct,
    // since doc_id is part of the key)
    val sh = docShingles(s, d)
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val evalSet = sh.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    val ov = train.join(broadcast(evalSet.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
    documents(s, d).filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(ov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contamination", when(col("n_shingles") > 0,
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("contaminated", (col("n_overlap") > 0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** T14 — character-diversity quality stats: distinct chars, top-char
    * fraction, and Gini impurity (1 - Σ p²) of the per-doc char
    * distribution — gibberish/boilerplate detectors a quality pipeline
    * runs next to t02/t09. Everything stays hash-comparable across
    * engines: counts are exact, ratios are single divisions, and the Gini
    * sum is folded over CHAR-SORTED counts so Spark and the oracle add the
    * same doubles in the same order (an unordered SUM of doubles is
    * engine-order-dependent — the q26 landmine). */
  def t14CharStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(expr(
        """CASE WHEN char_length(text) > 0
          |  THEN transform(sequence(1, char_length(text)), i -> substring(text, i, 1))
          |  ELSE array() END""".stripMargin)).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("ch"), col("cnt")))).as("cs"),
        sum(col("cnt")).as("n"))
      .select(col("doc_id"),
        col("n").as("n_chars"),
        size(col("cs")).cast("long").as("distinct_chars"),
        expr("round(CAST(array_max(transform(cs, x -> x.cnt)) AS DOUBLE) / CAST(n AS DOUBLE), 9)")
          .as("top_frac"),
        expr("""round(1.0D - aggregate(cs, CAST(0.0 AS DOUBLE),
               |  (acc, x) -> acc + (CAST(x.cnt AS DOUBLE) / CAST(n AS DOUBLE))
               |                  * (CAST(x.cnt AS DOUBLE) / CAST(n AS DOUBLE))), 9)""".stripMargin)
          .as("char_gini"))
      .orderBy(col("doc_id"))

  /** D08 — SemDeDup-style semantic dedupe: assign every embedding to its
    * max-cosine centroid (8 fixed seed vectors — stand-in for a persisted
    * k-means codebook, the s03 lifecycle), then flag as duplicate any
    * vector with a LOWER-id neighbor in the SAME cluster at cosine ≥ 0.25.
    * The cluster partition bounds the pairwise work: O(Σ cluster²)
    * instead of O(corpus²) — the published SemDeDup recipe. Assignment is
    * one broadcast cross join + a map-side-partial hash agg (max over
    * (cos, -centroid) structs = argmax with min-id tiebreak), NOT a
    * window sort. */
  /** d08's centroid-assignment stage, pre-checkpoint — split out so
    * PlanShapeSpec can pin its physical shape (the checkpoint below
    * truncates the visible plan to a LogicalRDD scan). */
  private[graft] def d08Assignment(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimilarity
    val emb = embeddings(s, d).select(col("vec_id").as("id"), col("embedding").as("v"))
    val cents = emb.filter(col("id") < 8).select(col("id").as("cid"), col("v").as("cv"))
    emb.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"),
        cosineSimilarity(col("v"), col("cv")).as("cos"))
      .groupBy(col("id"), col("v"))
      .agg(max(struct(col("cos"), (-col("cid")).as("nc"))).as("m"))
      .select(col("id"), col("v"), (-col("m.nc")).as("cluster"))
  }

  def d08SemDedup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimilarity
    val asg = d08Assignment(s, d)
      // three consumers (both sides of the intra-cluster pair join + the
      // final label join) — checkpoint or the assignment cross join runs 3×
      .localCheckpoint(false)
    val a = asg.select(col("cluster"), col("id").as("id_a"), col("v").as("va"))
    val b = asg.select(col("cluster"), col("id").as("id_b"), col("v").as("vb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosineSimilarity(col("va"), col("vb")) >= 0.25)
      .select(col("id_b").as("id")).distinct()
    asg.select(col("id"), col("cluster"))
      .join(dups.withColumn("dupflag", lit(1)), Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cluster"),
        coalesce(col("dupflag"), lit(0)).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** G02 — per-vertex local clustering coefficient over the co-purchase
    * graph ([[Triangles.perVertex]]): triangle participation counts from
    * the same degree-oriented wedge enumeration as g01 (one explode + hash
    * agg over closed wedges), exact integers until the single final
    * division — so the hash check is engine-exact. */
  def g02ClusteringCoeff(s: SparkSession, d: String): DataFrame =
    Triangles.perVertex(coPurchaseEdges(s, d), assumeNormalized = true)
      .orderBy(col("vertex"))

  /** S05 — product-quantization ANN ([[Similarity.pqTopKByCosine]]):
    * 8 subspaces × 16-centroid codebook (fixed seed vectors — the
    * persisted-artifact lifecycle, nothing trains at query time), ADC
    * candidate scan over reconstructed vectors, exact rerank of the top
    * 20. Completes the quantized-index family next to s04's SQ8. */
  def s05AnnPq(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Similarity.pqTopKByCosine(emb, col("vec_id"), col("embedding"),
        codebook, qs, m = 8, k = 5, candidateK = 20)
      .orderBy(col("qid"), col("rank"))
  }

  /** S08 — IVF-PQ composed ANN ([[Similarity.ivfPqTopKByCosine]] — the
    * FAISS IndexIVFPQ production shape): the same seeded 8-centroid IVF
    * index as s03 gates WHICH partitions each query scans (nProbe = 3),
    * the same 16-centroid × 8-subspace PQ codebook as s05 compresses WHAT
    * the scan reads (ADC over reconstructed vectors), exact cosine
    * reranks the top 20 — the two cost levers composed, which is what a
    * 100 TB deployment actually runs. Both index artifacts are the
    * persisted-metadata lifecycle; nothing trains at query time. */
  def s08AnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cent = Similarity.seededCentroids(emb, col("vec_id"), col("embedding"), 8)
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Similarity.ivfPqTopKByCosine(emb, col("vec_id"), col("embedding"),
        cent, codebook, qs, m = 8, k = 5, nProbe = 3, candidateK = 20)
      .orderBy(col("qid"), col("rank"))
  }

  /** Q43 — bucketed co-located join: both sides written through the
    * catalog bucketed (and sorted) on the join key
    * ([[graft.sources.Sinks.writeBucketed]], 8 buckets), then sort-merge
    * joined with ZERO exchange on either input — the physical plan reads
    * pre-bucketed files straight into the join (pinned in PlanShapeSpec:
    * SelectedBucketsCount on both scans, no shuffle below the join). This
    * is the 100 TB fact-to-fact join answer: pay the shuffle ONCE at write
    * time, then every subsequent join on the bucket key is co-located.
    * The oracle is the plain join — bucketing is a physical layout choice
    * that must never change results (same contract as q35's salting). */
  def q43BucketedJoin(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Sinks
    // round 12: the bucketed tables are written ONCE per (application,
    // sf dir) — the query's own scaladoc states the contract ("pay the
    // shuffle ONCE at write time, then every subsequent join on the
    // bucket key is co-located"); re-writing them per invocation timed
    // the build, not the co-located join the layout buys
    // table names embed the sf-dir hash: the memo key is (application,
    // dir) but the catalog is session-global — fixed names would let a
    // second sf dir overwrite the tables while the first dir's cache
    // entry still vouches for them, silently joining the wrong data
    val dirTag = f"${d.hashCode & 0x7fffffff}%x"
    val (liTbl, oTbl) = (s"graft_b_lineitem_$dirTag", s"graft_b_orders_$dirTag")
    cachedFrame(s, d, "q43_buckets") {
      // Round-14 build trims: (a) raw scans — the write's first op is the
      // bucket-aligned repartition (see writeBucketed), so the fixture
      // fan-out would be a wasted pass (the tableRaw contract); (b) the
      // two INDEPENDENT table writes run concurrently — FAIR scheduling
      // overlaps the small orders write entirely inside the lineitem one.
      // Measured at sf0.1 (ProbeQ43, same window): build 2.76 → 0.97 s
      // (warm query unchanged, 0.53/0.51 s).
      def writeLi(): Unit = Sinks.writeBucketed(
        tableRaw(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        liTbl, "l_orderkey", nBuckets = 8, sortCol = Some("l_orderkey"))
      def writeO(): Unit = Sinks.writeBucketed(
        tableRaw(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        oTbl, "o_orderkey", nBuckets = 8, sortCol = Some("o_orderkey"))
      var oErr: Throwable = null
      val t = new Thread(() => try writeO() catch { case e: Throwable => oErr = e })
      t.start()
      writeLi()
      t.join()
      if (oErr != null) throw oErr
      s.table(liTbl) // any frame; the cache records the writes
    }
    val li = s.table(liTbl)
    val o = s.table(oTbl)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(9, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** D09 — sketch-accuracy audit: every MinHash-banded candidate pair
    * (minAgree = 0 — the raw LSH recall set) carries both its signature
    * ESTIMATE (agreeing lanes / 16) and the EXACT trigram-shingle Jaccard,
    * plus the absolute error. This is the measurement a pipeline owner
    * runs before trusting a sketch threshold at 100 TB. The exact side is
    * computed ONLY for candidate pairs (join through the candidate list,
    * never all-pairs), so the sketch itself bounds the audit's cost. */
  def d09SketchAccuracy(s: SparkSession, d: String): DataFrame = {
    // round 14: candidates from the SHARED signature artifact (built off
    // docShingles) — the audit's sketch side and exact side now provably
    // read one tokenization
    val cands = Dedupe.lshPairsFromSignatures(minhashSigShared(s, d),
      minAgree = 0.0)
    // round 12: the shared docShingles artifact; round 13: the (doc, g)
    // set is identical BY CONSTRUCTION now that Dedupe.shingles filters
    // empty tokens like docShingles does (r12's equivalence argument held
    // only on fixtures without tab/newline-prefixed texts — pinned by
    // DedupeSpec's whitespace-prefix case); sizes are a narrow projection
    // of the per-doc arrays, no aggregate
    val sh = docShingles(s, d).select(col("doc_id"), explode(col("gs")).as("g"))
    val sizes = docShingles(s, d)
      .select(col("doc_id"), size(col("gs")).cast("long").as("sz"))
    val inter = cands.select(col("id_a"), col("id_b"))
      .join(sh.select(col("doc_id").as("id_a"), col("g")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    cands.select(col("id_a"), col("id_b"), col("agree").as("est_jaccard"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sza")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("szb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))).as("uni"))
      .withColumn("exact_jaccard",
        col("inter").cast("double") / col("uni").cast("double"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Q46 — explicit GROUPING SETS: exactly the (returnflag) and
    * (linestatus) marginals in ONE pass — neither CUBE (q27, all 4 sets)
    * nor ROLLUP (q11, hierarchical) can express this selection. Same
    * single Expand + hash-agg plan shape: sets are rows in the Expand,
    * never extra passes over the fact table. */
  def q46GroupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
        |       grouping_id() AS gid
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** T15 — deterministic weighted sampling
    * ([[Sampling.weightedPriority]]): the 20 highest-priority documents
    * under hash(id)/n_chars ranking — longer docs are proportionally more
    * likely to surface, yet the draw is a pure function of the row, so
    * every engine/run/partitioning picks the identical sample (a rand()
    * weighted sample silently changes the corpus on every retry). Plans
    * as scan → narrow projection → TakeOrderedAndProject: no shuffle, no
    * full sort. */
  def t15WeightedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), col("n_chars"))
      .withColumn("priority",
        Sampling.weightedPriority(col("doc_id"), col("n_chars")))
      .orderBy(col("priority"), col("doc_id"))
      .limit(20)

  /** Q44 — INTERSECT (distinct): nations that have BOTH customers and
    * suppliers — completes the set-op family next to q17's
    * UNION/EXCEPT. Spark plans intersect as a left-semi hash join over
    * distinct keys — one shuffle per side, no row explosion. */
  def q44Intersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** Q45 — correlated scalar subquery: orders priced above 90% of their
    * priority class's maximum. Catalyst's RewriteCorrelatedScalarSubquery
    * de-correlates this into an aggregate + join — the declarative form a
    * warehouse user writes, planned into the same shuffle shape a manual
    * window/join formulation would produce. (The threshold is 0.9·max —
    * exact single multiply — never an unordered-average, which would be
    * engine-order-dependent at the boundary.) */
  def q45Correlated(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_near_max
        |FROM orders_v o
        |WHERE o_totalprice > 0.9 * (SELECT max(x.o_totalprice)
        |                            FROM orders_v x
        |                            WHERE x.o_orderpriority = o.o_orderpriority)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q44_intersect" -> q44Intersect,
    "q45_correlated" -> q45Correlated,
    "q46_grouping_sets" -> q46GroupingSets,
    "t15_weighted_sample" -> t15WeightedSample,
    "q43_bucketed_join" -> q43BucketedJoin,
    "d09_sketch_accuracy" -> d09SketchAccuracy,
    "g02_clustering_coeff" -> g02ClusteringCoeff,
    "s05_ann_pq" -> s05AnnPq,
    "s08_ann_ivfpq" -> s08AnnIvfPq,
    "q39_funnel" -> q39Funnel,
    "q65_markov_transitions" -> q65MarkovTransitions,
    "q64_hierarchy_rollup" -> q64HierarchyRollup,
    "g06_label_prop" -> g06LabelProp,
    "q40_decile" -> q40Decile,
    "g01_triangles" -> g01Triangles,
    "g03_bfs_hops" -> g03BfsHops,
    "g07_weighted_paths" -> g07WeightedPaths,
    "g04_pagerank" -> g04PageRank,
    "g11_ppr" -> g11PersonalizedPagerank,
    "g05_kcore" -> g05Kcore,
    "t13_contamination" -> t13Contamination,
    "t24_bloom_decontaminate" -> t24BloomDecontaminate,
    "t14_char_stats" -> t14CharStats,
    "d08_semdedup" -> d08SemDedup)

  // ----------------------------------------------------------- oracle SQL

  /** Same double-fold macros as the d04/s0x oracles: element-order dot and
    * norms so DuckDB adds the exact doubles Spark's codegen kernel adds. */
  private def normSql(v: String) =
    s"sqrt(list_reduce(list_transform($v, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (x, y) -> x + y))"
  private def cosSql(a: String, b: String) =
    s"(list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y) / (${normSql(a)} * ${normSql(b)}))"

  /** d09 oracle: the same 16-lane (a,b) hash family as
    * `Dedupe.hashFamily(16)` (shared seed), banded candidates WITHOUT the
    * agree filter, then exact trigram-shingle Jaccard for just those
    * pairs — mirroring the Spark plan's candidate-restricted exact join. */
  private val d09Sql: String = {
    val P = 2147483647L
    val fam = Dedupe.hashFamily(16)
    val md5 = (v: String) => s"CAST(concat('0x', substr(md5($v), 1, 8)) AS BIGINT)"
    val shingle =
      s"""list_transform(generate_series(1, len(w) - 2),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"""
    val base = s"list_transform($shingle, sh -> ${md5("sh")} % $P)"
    val sigEntries = fam.map { case (a, b) =>
      s"list_min(list_transform(h, x -> (x * $a + $b) % $P))"
    }.mkString("[", ", ", "]")
    s"""WITH w0 AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                     x -> length(x) > 0) AS w
          FROM documents
        ), hh AS (
          SELECT doc_id, $base AS h
          FROM (SELECT doc_id, w FROM w0 WHERE len(w) >= 3) t
        ), sig AS (
          SELECT doc_id, $sigEntries AS sig FROM hh
        ), banded AS (
          SELECT doc_id, sig, b.band_idx,
                 array_to_string(sig[band_idx * 4 + 1 : band_idx * 4 + 4], ':') AS band_key
          FROM sig, LATERAL (SELECT unnest([0,1,2,3]) AS band_idx) b
        ), pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ), est AS (
          SELECT id_a, id_b,
                 CAST(len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2])) AS DOUBLE) / 16.0 AS est_jaccard
          FROM pairs
        ), shing AS (
          SELECT doc_id, unnest(list_distinct($shingle)) AS g
          FROM w0 WHERE len(w) >= 3
        ), sizes AS (
          SELECT doc_id, count(*) AS sz FROM shing GROUP BY doc_id
        ), inter AS (
          SELECT e.id_a, e.id_b, count(*) AS inter
          FROM est e
          JOIN shing a ON a.doc_id = e.id_a
          JOIN shing b ON b.doc_id = e.id_b AND b.g = a.g
          GROUP BY e.id_a, e.id_b
        )
        SELECT e.id_a, e.id_b, e.est_jaccard,
               CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
               CAST(sa.sz + sb.sz - coalesce(i.inter, 0) AS BIGINT) AS uni,
               CAST(coalesce(i.inter, 0) AS DOUBLE)
                 / CAST(sa.sz + sb.sz - coalesce(i.inter, 0) AS DOUBLE) AS exact_jaccard,
               abs(e.est_jaccard - CAST(coalesce(i.inter, 0) AS DOUBLE)
                 / CAST(sa.sz + sb.sz - coalesce(i.inter, 0) AS DOUBLE)) AS abs_err
        FROM est e
        LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
        JOIN sizes sa ON sa.doc_id = e.id_a
        JOIN sizes sb ON sb.doc_id = e.id_b
        ORDER BY e.id_a, e.id_b"""
  }

  private def l2Sql(a: String, b: String) =
    s"sqrt(list_reduce(list_transform(list_zip($a, $b), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) ** 2), (x, y) -> x + y))"

  val oracle: Map[String, String] = Map(
    "g05_kcore" ->
      """WITH li AS (
           SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         ), und AS (
           SELECT DISTINCT a.pk AS u, b.pk AS v
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         ), e0 AS (
           SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
         ), s1 AS (
           SELECT u FROM e0 GROUP BY u HAVING count(*) >= 3
         ), e1 AS (
           SELECT e.u, e.v FROM e0 e
           JOIN s1 a ON a.u = e.u JOIN s1 b ON b.u = e.v
         ), s2 AS (
           SELECT u FROM e1 GROUP BY u HAVING count(*) >= 3
         ), e2 AS (
           SELECT e.u, e.v FROM e1 e
           JOIN s2 a ON a.u = e.u JOIN s2 b ON b.u = e.v
         ), s3 AS (
           SELECT u FROM e2 GROUP BY u HAVING count(*) >= 3
         ), e3 AS (
           SELECT e.u, e.v FROM e2 e
           JOIN s3 a ON a.u = e.u JOIN s3 b ON b.u = e.v
         )
         SELECT u AS vertex, count(*) AS deg_in_core
         FROM e3 GROUP BY u ORDER BY vertex""",
    "q44_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    "q45_correlated" ->
      """SELECT o_orderpriority, count(*) AS n_near_max
         FROM orders o
         WHERE o_totalprice > 0.9 * (SELECT max(x.o_totalprice)
                                     FROM orders x
                                     WHERE x.o_orderpriority = o.o_orderpriority)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q46_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
                CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "t15_weighted_sample" ->
      """SELECT doc_id, n_chars,
                CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
                  / CAST(n_chars AS DOUBLE) AS priority
         FROM documents
         ORDER BY priority, doc_id LIMIT 20""",
    "q43_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(l.l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    "d09_sketch_accuracy" -> d09Sql,
    "s05_ann_pq" ->
      s"""WITH cbv AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
          ), subidx AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS j
          ), cb AS (
            SELECT s.j, cid, list_slice(cv, s.j * 8 + 1, s.j * 8 + 8) AS cs
            FROM cbv, subidx s
          ), sub AS (
            SELECT vec_id AS id, s.j, list_slice(embedding, s.j * 8 + 1, s.j * 8 + 8) AS vs
            FROM embeddings, subidx s
          ), scored AS (
            SELECT s.id, s.j, c.cid, c.cs, ${l2Sql("s.vs", "c.cs")} AS dist
            FROM sub s JOIN cb c ON c.j = s.j
          ), codes AS (
            SELECT id, j, cs FROM (
              SELECT id, j, cs,
                     row_number() OVER (PARTITION BY id, j ORDER BY dist, cid) AS rn
              FROM scored) t WHERE rn = 1
          ), dec AS (
            SELECT id, flatten(list(cs ORDER BY j)) AS dv FROM codes GROUP BY id
          ), qs AS (
            SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3
          ), cand AS (
            SELECT b.qid, a.id, ${cosSql("a.dv", "b.qv")} AS qscore
            FROM dec a CROSS JOIN qs b WHERE a.id <> b.qid
          ), top AS (
            SELECT qid, id FROM (
              SELECT qid, id,
                     row_number() OVER (PARTITION BY qid ORDER BY qscore DESC, id) AS crank
              FROM cand) t WHERE crank <= 20
          ), rescored AS (
            SELECT t.qid, t.id, ${cosSql("e.embedding", "q.qv")} AS score
            FROM top t JOIN embeddings e ON e.vec_id = t.id JOIN qs q ON q.qid = t.qid
          )
          SELECT qid, id, score, rank FROM (
            SELECT qid, id, score,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS INT) AS rank
            FROM rescored) r
          WHERE rank <= 5 ORDER BY qid, rank""",
    "s08_ann_ivfpq" ->
      s"""WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS part,
                   embedding AS cvec
            FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) t
          ), assigned AS (
            SELECT id, part FROM (
              SELECT a.vec_id AS id, c.part,
                     row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosSql("a.embedding", "c.cvec")} DESC, c.part) AS rn
              FROM embeddings a CROSS JOIN cent c) s
            WHERE rn = 1
          ), qs AS (
            SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3
          ), probes AS (
            SELECT qid, qv, part FROM (
              SELECT q.qid, q.qv, c.part,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY ${cosSql("q.qv", "c.cvec")} DESC, c.part) AS pr
              FROM qs q CROSS JOIN cent c) s
            WHERE pr <= 3
          ), cbv AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
          ), subidx AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS j
          ), cb AS (
            SELECT s.j, cid, list_slice(cv, s.j * 8 + 1, s.j * 8 + 8) AS cs
            FROM cbv, subidx s
          ), sub AS (
            SELECT vec_id AS id, s.j, list_slice(embedding, s.j * 8 + 1, s.j * 8 + 8) AS vs
            FROM embeddings, subidx s
          ), pqscored AS (
            SELECT s.id, s.j, c.cid, c.cs, ${l2Sql("s.vs", "c.cs")} AS dist
            FROM sub s JOIN cb c ON c.j = s.j
          ), codes AS (
            SELECT id, j, cs FROM (
              SELECT id, j, cs,
                     row_number() OVER (PARTITION BY id, j ORDER BY dist, cid) AS rn
              FROM pqscored) t WHERE rn = 1
          ), dec AS (
            SELECT id, flatten(list(cs ORDER BY j)) AS dv FROM codes GROUP BY id
          ), cand AS (
            SELECT p.qid, a.id, ${cosSql("d.dv", "p.qv")} AS qscore
            FROM assigned a JOIN dec d ON d.id = a.id
            JOIN probes p ON p.part = a.part
            WHERE a.id <> p.qid
          ), top AS (
            SELECT qid, id FROM (
              SELECT qid, id,
                     row_number() OVER (PARTITION BY qid ORDER BY qscore DESC, id) AS crank
              FROM cand) t WHERE crank <= 20
          ), rescored AS (
            SELECT t.qid, t.id, ${cosSql("e.embedding", "q.qv")} AS score
            FROM top t JOIN embeddings e ON e.vec_id = t.id JOIN qs q ON q.qid = t.qid
          )
          SELECT qid, id, score, rank FROM (
            SELECT qid, id, score,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS INT) AS rank
            FROM rescored) r
          WHERE rank <= 5 ORDER BY qid, rank""",
    "q64_hierarchy_rollup" ->
      """WITH RECURSIVE walk AS (
           SELECT p_partkey AS v, p_partkey AS cur, CAST(0 AS BIGINT) AS depth
           FROM part
           UNION ALL
           SELECT v, cur // 10, depth + 1 FROM walk WHERE cur >= 10
         )
         SELECT cur AS root, CAST(count(*) AS BIGINT) AS n_nodes,
                max(depth) AS max_depth, CAST(sum(depth) AS BIGINT) AS sum_depth
         FROM walk WHERE cur < 10
         GROUP BY cur ORDER BY root""",
    "g06_label_prop" ->
      s"""$lpaCtes
         SELECT vertex, label AS community FROM l3 ORDER BY vertex""",
    "q65_markov_transitions" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
         ), p AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY t, event_id) AS to_type
           FROM e
         ), g AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM p WHERE to_type IS NOT NULL
           GROUP BY from_type, to_type
         )
         SELECT from_type, to_type, n,
                CAST(n * 10000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_bp
         FROM g ORDER BY from_type, to_type""",
    "q39_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS t FROM events
         ), v AS (
           SELECT user_id, t FROM e WHERE event_type = 'view'
         ), qc AS (
           SELECT DISTINCT c.user_id, c.t
           FROM (SELECT user_id, t FROM e WHERE event_type = 'click') c
           WHERE EXISTS (SELECT 1 FROM v WHERE v.user_id = c.user_id
                           AND v.t >= c.t - 21600000000 AND v.t < c.t)
         ), qp AS (
           SELECT DISTINCT p.user_id
           FROM (SELECT user_id, t FROM e WHERE event_type = 'purchase') p
           WHERE EXISTS (SELECT 1 FROM qc WHERE qc.user_id = p.user_id
                           AND qc.t >= p.t - 21600000000 AND qc.t < p.t)
         ), u AS (SELECT DISTINCT user_id FROM e)
         SELECT u.user_id,
                CASE WHEN u.user_id IN (SELECT user_id FROM qp) THEN 3
                     WHEN u.user_id IN (SELECT user_id FROM qc) THEN 2
                     WHEN u.user_id IN (SELECT user_id FROM v) THEN 1
                     ELSE 0 END AS funnel_stage
         FROM u ORDER BY u.user_id""",
    "q40_decile" ->
      """WITH rk AS (
           SELECT o_totalprice,
                  CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
           FROM orders
         )
         SELECT decile, count(*) AS n_orders,
                min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
                CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM rk GROUP BY decile ORDER BY decile""",
    "g02_clustering_coeff" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         ), deg AS (
           SELECT x, count(*) AS deg
           FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
           GROUP BY x
         ), tri AS (
           SELECT e1.u AS a, e1.v AS b, e2.v AS c
           FROM e e1
           JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
           JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
         ), tv AS (
           SELECT x, count(*) AS nt
           FROM (SELECT a AS x FROM tri UNION ALL SELECT b AS x FROM tri
                 UNION ALL SELECT c AS x FROM tri)
           GROUP BY x
         )
         SELECT d.x AS vertex, CAST(d.deg AS BIGINT) AS degree,
                CAST(coalesce(tv.nt, 0) AS BIGINT) AS n_triangles,
                CASE WHEN d.deg >= 2
                     THEN (2.0 * CAST(coalesce(tv.nt, 0) AS DOUBLE))
                          / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0))
                     ELSE 0.0 END AS clustering_coeff
         FROM deg d LEFT JOIN tv ON tv.x = d.x
         ORDER BY vertex""",
    "g01_triangles" ->
      """WITH e AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         ), verts AS (
           SELECT count(DISTINCT x) AS n_vertices
           FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
         ), ecnt AS (SELECT count(*) AS n_edges FROM e
         ), tri AS (
           SELECT count(*) AS n_triangles
           FROM e e1
           JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
           JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
         )
         SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
                CAST(n_edges AS BIGINT) AS n_edges,
                CAST(n_triangles AS BIGINT) AS n_triangles
         FROM verts, ecnt, tri""",
    "g04_pagerank" ->
      """WITH eu AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         ), e AS (
           SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu
         ), deg AS (
           SELECT u, count(*) AS deg FROM e GROUP BY u
         ), nn AS (SELECT count(*) AS n FROM deg
         ), p0 AS (
           SELECT u AS v, 1000000000000 // nn.n AS p FROM deg, nn
         ), c1 AS (
           SELECT e.v, CAST(sum(p0.p // d.deg) AS BIGINT) AS s
           FROM e JOIN p0 ON p0.v = e.u JOIN deg d ON d.u = e.u GROUP BY e.v
         ), p1 AS (
           SELECT c1.v, (15 * (1000000000000 // nn.n)) // 100 + (85 * c1.s) // 100 AS p
           FROM c1, nn
         ), c2 AS (
           SELECT e.v, CAST(sum(p1.p // d.deg) AS BIGINT) AS s
           FROM e JOIN p1 ON p1.v = e.u JOIN deg d ON d.u = e.u GROUP BY e.v
         ), p2 AS (
           SELECT c2.v, (15 * (1000000000000 // nn.n)) // 100 + (85 * c2.s) // 100 AS p
           FROM c2, nn
         ), c3 AS (
           SELECT e.v, CAST(sum(p2.p // d.deg) AS BIGINT) AS s
           FROM e JOIN p2 ON p2.v = e.u JOIN deg d ON d.u = e.u GROUP BY e.v
         ), p3 AS (
           SELECT c3.v, (15 * (1000000000000 // nn.n)) // 100 + (85 * c3.s) // 100 AS p
           FROM c3, nn
         )
         SELECT v, CAST(p AS BIGINT) AS rank_scaled FROM p3 ORDER BY v""",
    "g11_ppr" -> {
      // same chain as g04 with seed-restricted init + per-round teleport;
      // rounds composed programmatically so the three copies cannot drift
      val tele = "(15 * (1000000000000 // (SELECT n FROM ns))) // 100"
      def round(n: Int) =
        s"""c$n AS (
           SELECT e.v, CAST(sum(p${n - 1}.p // d.deg) AS BIGINT) AS sm
           FROM e JOIN p${n - 1} ON p${n - 1}.v = e.u JOIN deg d ON d.u = e.u
           GROUP BY e.v
         ), p$n AS (
           SELECT coalesce(c.v, sd.v) AS v,
                  (CASE WHEN sd.v IS NOT NULL THEN $tele ELSE 0 END)
                  + (85 * coalesce(c.sm, 0)) // 100 AS p
           FROM c$n c FULL OUTER JOIN sd ON sd.v = c.v
         )"""
      s"""WITH eu AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         ), e AS (
           SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu
         ), deg AS (
           SELECT u, count(*) AS deg FROM e GROUP BY u
         ), sd AS (
           SELECT p_partkey AS v FROM part WHERE p_partkey % 500 = 0
         ), ns AS (SELECT count(*) AS n FROM sd
         ), p0 AS (
           SELECT sd.v, 1000000000000 // ns.n AS p FROM sd, ns
         ), ${round(1)}, ${round(2)}, ${round(3)}
         SELECT v, CAST(p AS BIGINT) AS rank_scaled FROM p3
         ORDER BY p DESC, v LIMIT 25"""
    },
    "g03_bfs_hops" ->
      """WITH RECURSIVE e AS (
           SELECT u, v FROM (
             SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
           UNION ALL SELECT v, u FROM (
             SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
         ), walk(node, hop) AS (
           SELECT p_partkey AS node, 0 AS hop FROM part WHERE p_partkey % 500 = 0
           UNION
           SELECT e.v, w.hop + 1 FROM walk w JOIN e ON e.u = w.node
           WHERE w.hop < 3
         )
         SELECT node, CAST(min(hop) AS INTEGER) AS hops
         FROM walk GROUP BY node ORDER BY node""",
    "g07_weighted_paths" ->
      """WITH li AS (
           SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         ), und AS (
           SELECT DISTINCT a.pk AS u, b.pk AS v
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         ), e AS (
           SELECT u, v, CAST(1 + (u + v) % 5 AS BIGINT) AS w FROM (
             SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und) t
         ), d0 AS (
           SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
           FROM part WHERE p_partkey % 500 = 0
         ), d1 AS (
           SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d0
             UNION ALL
             SELECT e.v AS node, d0.dist + e.w AS dist
             FROM d0 JOIN e ON e.u = d0.node) t GROUP BY node
         ), d2 AS (
           SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d1
             UNION ALL
             SELECT e.v AS node, d1.dist + e.w AS dist
             FROM d1 JOIN e ON e.u = d1.node) t GROUP BY node
         ), d3 AS (
           SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d2
             UNION ALL
             SELECT e.v AS node, d2.dist + e.w AS dist
             FROM d2 JOIN e ON e.u = d2.node) t GROUP BY node
         )
         SELECT node, dist FROM d3 ORDER BY node""",
    "t24_bloom_decontaminate" ->
      """WITH tokd AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                              w -> length(w) > 0) AS ws
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, ws[i.i] || ' ' || ws[i.i+1] || ' ' || ws[i.i+2] AS g
           FROM tokd, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) i
         ), ev AS (
           SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0
         ), bits AS (
           SELECT DISTINCT
                  (CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
                   + lane * CAST(concat('0x', substr(md5(g), 9, 8)) AS BIGINT))
                  % 1048576 AS bit
           FROM ev, LATERAL (SELECT unnest([0, 1, 2, 3]) AS lane) l
         ), corpus AS (
           SELECT doc_id, g FROM sh WHERE doc_id % 97 <> 0
         ), lanes AS (
           SELECT doc_id, g,
                  (CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
                   + lane * CAST(concat('0x', substr(md5(g), 9, 8)) AS BIGINT))
                  % 1048576 AS bit
           FROM corpus, LATERAL (SELECT unnest([0, 1, 2, 3]) AS lane) l
         ), cand AS (
           SELECT doc_id, g FROM lanes JOIN bits USING (bit)
           GROUP BY doc_id, g HAVING count(*) = 4
         ), ex AS (
           SELECT c.doc_id, count(*) AS n_exact
           FROM cand c JOIN ev e ON e.g = c.g GROUP BY c.doc_id
         ), cc AS (
           SELECT doc_id, count(*) AS n_cand FROM cand GROUP BY doc_id
         ), sc AS (
           SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id
         )
         SELECT d.doc_id,
                CAST(coalesce(sc.n_shingles, 0) AS BIGINT) AS n_shingles,
                CAST(coalesce(cc.n_cand, 0) AS BIGINT) AS n_bloom_candidates,
                CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact_hits,
                CAST(coalesce(cc.n_cand, 0) - coalesce(ex.n_exact, 0) AS BIGINT)
                  AS n_bloom_fp,
                CAST(coalesce(ex.n_exact, 0) > 0 AS INT) AS contaminated
         FROM documents d
         LEFT JOIN sc ON sc.doc_id = d.doc_id
         LEFT JOIN cc ON cc.doc_id = d.doc_id
         LEFT JOIN ex ON ex.doc_id = d.doc_id
         WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""",
    "t13_contamination" ->
      """WITH tokd AS (
           SELECT doc_id,
                  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                              w -> length(w) > 0) AS ws
           FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, ws[i.i] || ' ' || ws[i.i+1] || ' ' || ws[i.i+2] AS g
           FROM tokd, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) i
         ), ev AS (
           SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0
         ), ov AS (
           SELECT s.doc_id, count(*) AS n, count(e.g) AS o
           FROM sh s LEFT JOIN ev e ON s.g = e.g
           WHERE s.doc_id % 97 <> 0 GROUP BY s.doc_id
         )
         SELECT d.doc_id,
                CAST(coalesce(o.n, 0) AS BIGINT) AS n_shingles,
                CAST(coalesce(o.o, 0) AS BIGINT) AS n_overlap,
                CASE WHEN coalesce(o.n, 0) > 0
                     THEN CAST(o.o AS DOUBLE) / CAST(o.n AS DOUBLE)
                     ELSE 0.0 END AS contamination,
                CAST(coalesce(o.o, 0) > 0 AS INT) AS contaminated
         FROM documents d LEFT JOIN ov o ON o.doc_id = d.doc_id
         WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""",
    "t14_char_stats" ->
      """WITH ch AS (
           SELECT doc_id, unnest(string_split(text, '')) AS c
           FROM documents WHERE length(text) > 0
         ), cnts AS (
           SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
         ), per AS (
           SELECT doc_id,
                  list(CAST(cnt AS DOUBLE) ORDER BY c) AS cl,
                  CAST(sum(cnt) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS dc,
                  CAST(max(cnt) AS BIGINT) AS mx
           FROM cnts GROUP BY doc_id
         )
         SELECT doc_id, n AS n_chars, dc AS distinct_chars,
                round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 9) AS top_frac,
                round(1.0 - list_reduce(list_transform(cl, x -> (x / n) * (x / n)),
                                        (a, b) -> a + b), 9) AS char_gini
         FROM per ORDER BY doc_id""",
    "d08_semdedup" ->
      s"""WITH e AS (
            SELECT vec_id AS id, embedding AS v FROM embeddings
          ), c AS (
            SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
          ), sc AS (
            SELECT e.id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS cos FROM e, c
          ), asg AS (
            SELECT id, v, cid AS cluster FROM (
              SELECT id, v, cid,
                     row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
              FROM sc) WHERE rn = 1
          ), dup AS (
            SELECT DISTINCT b.id FROM asg a JOIN asg b
              ON a.cluster = b.cluster AND a.id < b.id
            WHERE ${cosSql("a.v", "b.v")} >= 0.25
          )
          SELECT a.id AS vec_id, a.cluster,
                 CAST(d.id IS NOT NULL AS INT) AS is_dup
          FROM asg a LEFT JOIN dup d ON d.id = a.id ORDER BY vec_id""")
}
