package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the clustering step
  * of near-duplicate deduplication (pairs from MinHash/SimHash/Jaccard →
  * duplicate CLUSTERS → one canonical doc per cluster). The reference's
  * dedupe (resources/refine/dedupe.py:31-107) only handles exact-hash
  * groups; transitive near-dup clustering is the missing piece a
  * training-corpus pipeline needs (A near B, B near C ⇒ {A,B,C} is one
  * cluster even when A–C themselves score below threshold).
  *
  * Algorithm: iterative hash-min label propagation, fully relational —
  * each vertex starts labeled with itself; every round each vertex takes
  * the min label over itself and its neighbors; fixpoint = every vertex
  * holds the minimum id of its component.
  *
  * Scale design (100 TB):
  *  - one round = one shuffle-join of labels with the (symmetrized,
  *    checkpointed-once) edge list on vertex id, plus one hash aggregate —
  *    the same per-round cost profile as GraphX/GraphFrames CC, with no
  *    extra dependency and full Catalyst/AQE planning per round;
  *  - rounds needed = graph diameter. Near-dup graphs are cliques and
  *    short chains (diameter a handful), so propagation converges in a few
  *    rounds; for adversarially long chains the O(log n)-round
  *    large-star/small-star variant (Kiveris et al., "Connected Components
  *    in MapReduce and Beyond") swaps in without changing the interface;
  *  - each round `localCheckpoint`s its labels: lineage would otherwise
  *    double per iteration and re-execute the whole history at every
  *    convergence check;
  *  - round 0 is FUSED into label initialization — `label(v) = min(v,
  *    min(neighbors))` is one aggregate over the edge list, replacing a
  *    distinct + a full propagation round;
  *  - convergence is detected from the exact decimal SUM of labels:
  *    labels only ever decrease, so the sum strictly decreases iff any
  *    label changed. One cheap aggregate action per round doubles as the
  *    checkpoint materializer — no per-round change-detection join.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges over NUMERIC
    *              vertex ids (any orientation, duplicates fine; hash
    *              non-numeric ids first) — column names are taken
    *              positionally
    * @return (id, component) for every vertex that appears in `edges`;
    *         component = min vertex id of the connected component
    */
  def run(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    val e = edges.select(col(srcName).as("src"), col(dstName).as("dst"))
    // symmetrize so labels flow both ways, checkpoint ONCE — every round
    // re-reads this; keeping the lineage would re-run the (possibly
    // expensive) pair-generation job each round
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(false)
    // exact decimal sum — overflow-safe far beyond long ids × row counts.
    // Option: sum() over zero rows is NULL; an empty graph must not NPE.
    def sig(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0))
    var labels = sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(false)
    var cur = sig(labels)
    var iter = 0
    // empty graph: sig is None (NULL sum) and there is nothing to
    // propagate — the (empty) label frame is already the fixpoint
    var converged = cur.isEmpty
    while (!converged && iter < maxIters) {
      // one hop: each vertex offers its label to every neighbor
      val offered = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val next = labels.unionByName(offered)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val nextSig = sig(next)
      // compareTo, not equals: BigDecimal.equals is scale-sensitive
      converged = (nextSig, cur) match {
        case (Some(a), Some(b)) => a.compareTo(b) == 0
        case (a, b)             => a.isEmpty && b.isEmpty
      }
      cur = nextSig
      labels = next
      iter += 1
    }
    // a silent truncation would return wrong components with no signal:
    // a component chain longer than maxIters hops is still mid-propagation
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxIters rounds — " +
          "graph diameter exceeds maxIters; raise it (or switch to " +
          "runStar, the O(log n)-round variant for adversarial chains)")
    labels.select(col("id"), col("label").as("component"))
  }

  /** O(log n)-round connected components — the large-star/small-star
    * alternation of Kiveris et al., "Connected Components in MapReduce and
    * Beyond" (SoCC'14). [[run]]'s label propagation needs diameter rounds
    * (fine for near-dup graphs: cliques and short chains); this variant
    * HALVES long paths every alternation, so a 10⁶-hop chain — where
    * propagation would run 10⁶ shuffles — converges in ~20. Same
    * interface and output contract as [[run]].
    *
    * Each phase is two hash aggregates + an equi-join over the current
    * edge set (per-node minima via agg — neighbor lists are never
    * collected into rows, so hub vertices can't blow up a task):
    *  - large-star: every neighbor v > u re-attaches to m(u) = min(Γ(u) ∪ u);
    *  - small-star: every neighbor v < u (and u itself) re-attaches to
    *    m⁻(u) = min of u's smaller neighborhood.
    * The edge multiset shrinks toward stars rooted at component minima;
    * fixpoint = the edge set stops changing (checked with an exact
    * exceptAll, not a collision-prone checksum). */
  def runStar(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    var e = edges
      .select(least(col(srcName), col(dstName)).as("u"),
        greatest(col(srcName), col(dstName)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    var iter = 0
    var converged = e.isEmpty
    while (!converged && iter < maxIters) {
      // ---- large-star: (v, m(u)) for every neighbor v > u ----
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // m ≤ u < v, so (m, v) is already canonical and never a self-loop
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(minsL, Seq("u"))
        .select(col("m").as("u"), col("v"))
        .distinct()
        .localCheckpoint(false)
      // ---- small-star over larger→smaller edges ----
      val byBig = afterLarge.select(col("v").as("n"), col("u").as("w")) // w < n
      val minsS = byBig.groupBy(col("n")).agg(min(col("w")).as("m"))
      val emitNbrs = byBig.join(minsS, Seq("n"))
        .select(col("m").as("u"), col("w").as("v"))
        .filter(col("u") =!= col("v")) // the min itself re-emits as a loop
      val emitSelf = minsS.select(col("m").as("u"), col("n").as("v")) // m < n
      val newE = emitNbrs.union(emitSelf).distinct().localCheckpoint(false)
      converged = newE.count() == e.count() &&
        newE.exceptAll(e).isEmpty
      e = newE
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"runStar did not converge within $maxIters alternations")
    // fixpoint = disjoint stars: u is the component minimum of every edge
    val leaves = e.select(col("v").as("id"), col("u").as("component"))
    val roots = e.select(col("u").as("id"), col("u").as("component")).distinct()
    leaves.unionByName(roots).distinct()
  }
}
