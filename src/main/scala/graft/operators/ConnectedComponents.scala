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
  *  - convergence check is a `limit(1).count` on changed labels — it stops
  *    at the first changed row instead of counting all of them.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (any
    *              orientation, duplicates fine); column names are taken
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
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // one hop: each vertex offers its label to every neighbor
      val offered = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val next = labels.unionByName(offered)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val changed = next.as("n")
        .join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") =!= col("prev"))
        .limit(1).count() > 0L
      labels = next
      converged = !changed
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
