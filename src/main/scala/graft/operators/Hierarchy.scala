package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy resolution by POINTER DOUBLING: given a forest as
  * (id, parent) rows (parent NULL at roots), compute every node's root
  * and depth in O(log depth) self-joins instead of O(depth) parent hops —
  * the classic parallel shortcutting trick (same family as
  * [[ConnectedComponents]]' hash-min, but on a DAG with exact depth
  * accumulation). Round r advances each pointer from 2^(r-1) to 2^r
  * ancestor steps, clamped at the root because a root's state is
  * (root, root, 0) — the join adds zero forever after.
  *
  * Scale design: each round is ONE hash equi-join of the state against
  * itself on the ancestor key plus a projection — no window, no driver
  * data; `localCheckpoint` cuts the doubling lineage (the g05/CC
  * discipline). A 100 TB catalog hierarchy of depth ≤ 2^r resolves in r
  * joins; the org-chart / category-tree / thread-reply rollup every
  * metadata pipeline needs.
  */
object Hierarchy {

  /** Resolve (v, root, depth) for every node. `rounds` must satisfy
    * 2^rounds ≥ max tree depth; with `verifyConverged` (one count job on
    * the state frame joined to the non-root parent set) a too-shallow
    * round budget fails loudly instead of silently reporting a non-root
    * ancestor — the CC maxIters lesson. */
  def resolveRoots(nodes: DataFrame, idCol: String, parentCol: String,
      rounds: Int, verifyConverged: Boolean = true): DataFrame = {
    var st = nodes.select(col(idCol).as("v"),
        coalesce(col(parentCol), col(idCol)).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val j = st.select(col("v").as("j_v"), col("anc").as("j_anc"),
        col("depth").as("j_depth"))
      st = st.join(j, col("anc") === col("j_v"))
        .select(col("v"), col("j_anc").as("anc"),
          (col("depth") + col("j_depth")).as("depth"))
        .localCheckpoint(true)
    }
    if (verifyConverged) {
      val nonRoots = nodes.filter(col(parentCol).isNotNull)
        .select(col(idCol).as("nr"))
      val unresolved = st.join(nonRoots, col("anc") === col("nr")).count()
      if (unresolved > 0) sys.error(
        s"Hierarchy.resolveRoots: $unresolved pointers not at a root after " +
          s"$rounds rounds — tree deeper than 2^$rounds; raise `rounds`")
    }
    st.select(col("v"), col("anc").as("root"), col("depth"))
  }
}
