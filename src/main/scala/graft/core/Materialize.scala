package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Partitioning-retaining materialization for iterative consumers.
  *
  * `Dataset.localCheckpoint` normally loses the frame's output
  * partitioning: under AQE the adaptive plan's partitioning is unknown at
  * checkpoint-creation time, so the LogicalRDD reports Unknown and every
  * downstream join/agg re-shuffles the checkpointed blocks — measured in
  * round 9 (MiningQueries.doubledEdges note) and the reason the graph
  * family paid one edge-sized exchange per iteration round.
  *
  * The fix: take the eager checkpoint with AQE *briefly disabled*. The
  * non-adaptive physical plan ends in the explicit hash repartition, its
  * outputPartitioning is concrete, and Spark's LogicalRDD carries it —
  * so a consumer join or aggregate keyed on (a subset-compatible set of)
  * the same columns satisfies its ClusteredDistribution straight from the
  * checkpoint scan and inserts NO exchange (plan-verified in Probe: the
  * per-round LPA join reads `Scan ExistingRDD` with no Exchange above it).
  * This is the Spark-native analog of writing a bucketed index artifact:
  * shuffle the graph/edge table ONCE at build time, then every iteration
  * reads it in place.
  *
  * The AQE toggle is session-wide for the duration of the (synchronous,
  * eager) checkpoint job — the same bounded-conf-toggle pattern
  * ShortestPaths.weightedDistances already uses for constraint
  * propagation. A concurrently *planning* query in the same session would
  * plan that one run without AQE (still correct, possibly less optimal) —
  * the correctness gate runs queries sequentially, and the bench's
  * concurrent pass tolerates it.
  *
  * Scale note: at 100 TB this materialization is the persisted-index step
  * of an iterative job (PageRank/LPA/k-core all re-read the edge frame
  * per round); partitioning it on the round-join key once is strictly
  * less work than re-shuffling it every round, and `localCheckpoint`
  * blocks spill to executor disk via the block manager.
  */
object Materialize {

  /** Hash-repartition `df` on `keys` and eagerly checkpoint it so the
    * result's HashPartitioning(keys, shufflePartitions) is retained. */
  def partitionedCheckpoint(df: DataFrame, keys: String*): DataFrame = {
    val spark = df.sparkSession
    val conf = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    try df.repartition(keys.map(col): _*).localCheckpoint(true)
    finally spark.conf.set(conf, prev)
  }

  /** Eager checkpoint retaining whatever partitioning `df`'s plan already
    * has (no extra repartition) — for frames that are ALREADY clustered,
    * e.g. an aggregate computed over a partitioned checkpoint: the agg
    * output inherits HashPartitioning(group keys) and a repartition on
    * top would insert a pointless exchange. */
  def checkpointRetainingPartitioning(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val conf = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    try df.localCheckpoint(true)
    finally spark.conf.set(conf, prev)
  }

  /** Like [[partitionedCheckpoint]] but with `dropDuplicates(dedupeKeys)`
    * fused AFTER the repartition: HashPartitioning(keys) satisfies the
    * dedupe aggregate's ClusteredDistribution whenever keys ⊆ dedupeKeys,
    * so the dedupe inserts no second exchange and the checkpointed frame
    * keeps the keys partitioning — one shuffle buys dedupe + clustering. */
  def dedupedPartitionedCheckpoint(df: DataFrame, keys: Seq[String],
      dedupeKeys: Seq[String]): DataFrame = {
    require(keys.forall(dedupeKeys.contains),
      s"partition keys $keys must be a subset of dedupe keys $dedupeKeys " +
        "or the dedupe aggregate inserts its own exchange")
    val spark = df.sparkSession
    val conf = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    try df.repartition(keys.map(col): _*).dropDuplicates(dedupeKeys)
      .localCheckpoint(true)
    finally spark.conf.set(conf, prev)
  }
}
