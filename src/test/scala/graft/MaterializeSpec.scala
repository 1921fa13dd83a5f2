package graft

import graft.core.Materialize
import org.apache.spark.sql.functions._

/** Contracts of the partitioning-retaining checkpoint family — the round-10
  * mechanism every iterative query (graphs, sketches, prefix filter, ANN
  * build) now stands on. These pins are PLAN-level: if a Spark upgrade
  * changes how LogicalRDD reports partitioning (the whole point of taking
  * the checkpoint with AQE off), the exchange-elision tests fail loudly
  * instead of every graph round silently re-shuffling its edge frame.
  */
class MaterializeSpec extends SparkSpec {

  // fixture written ONCE: per-test overwrites would invalidate the file
  // references inside earlier tests' still-lazy frames
  private lazy val edgesPath: String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("materialize-spec").toString
    (1L to 2000L).map(i => (i % 97, i % 31)).toDF("u", "v")
      // parquet round-trip: in-memory fixtures fold to LocalRelation and
      // plan pins stop meaning anything (NOTES rule)
      .write.mode("overwrite").parquet(p)
    p
  }
  private def freshEdges() = spark.read.parquet(edgesPath)

  test("partitionedCheckpoint retains hash partitioning: keyed agg plans no exchange") {
    val e = Materialize.partitionedCheckpoint(freshEdges(), "u")
    val plan = e.groupBy(col("u")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the checkpoint key must read blocks in place, got:\n$plan")
  }

  test("partitionedCheckpoint: equi-join on the key shuffles ONLY the other side") {
    val e = Materialize.partitionedCheckpoint(freshEdges(), "u")
    val other = freshEdges().select(col("u"), col("v").as("w"))
    val plan = e.join(other.hint("shuffle_hash"), Seq("u"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly one exchange (the non-checkpoint side), got $exchanges:\n$plan")
  }

  test("plain lazy localCheckpoint does NOT retain partitioning (the r9 trap this fixes)") {
    val e = freshEdges().repartition(col("u")).localCheckpoint(false)
    val plan = e.groupBy(col("u")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      "if this ever starts eliding, Materialize's AQE-off dance is obsolete — simplify it")
  }

  test("dedupedPartitionedCheckpoint dedupes exactly and keeps the clustering") {
    val raw = freshEdges().union(freshEdges()) // guaranteed duplicates
    val d = Materialize.dedupedPartitionedCheckpoint(raw,
      keys = Seq("u"), dedupeKeys = Seq("u", "v"))
    assert(d.count() == freshEdges().dropDuplicates("u", "v").count())
    val plan = d.groupBy(col("u")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clustering lost through the fused dedupe:\n$plan")
  }

  test("dedupedPartitionedCheckpoint refuses keys outside the dedupe set") {
    val e = intercept[IllegalArgumentException] {
      Materialize.dedupedPartitionedCheckpoint(freshEdges(),
        keys = Seq("v"), dedupeKeys = Seq("u"))
    }
    assert(e.getMessage.contains("subset"),
      "a partition key outside the dedupe keys would re-exchange silently — must throw")
  }

  test("AQE conf is restored even when the plan is invalid") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    intercept[Throwable] {
      Materialize.partitionedCheckpoint(freshEdges(), "no_such_column")
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == before,
      "conf toggle must restore in finally — a leaked 'false' degrades every later query")
  }

  test("checkpoint contents equal the source frame (materialization is value-neutral)") {
    val src = freshEdges()
    val got = Materialize.partitionedCheckpoint(src, "u")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = src.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
  }
}
