package graft

import graft.operators.Hierarchy
import graft.queries.MiningQueries
import org.apache.spark.sql.functions._

/** Contracts for pointer-doubling hierarchy resolution and the LPA
  * community query — cross-checked against driver-side reference walks.
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("resolveRoots matches a driver-side parent walk on a random forest") {
    val rnd = new scala.util.Random(42)
    // random forest on 500 nodes: parent strictly smaller → acyclic
    val parents: Map[Long, Option[Long]] = (0L until 500L).map { i =>
      i -> (if (i < 5 || rnd.nextInt(10) == 0) None
            else Some(rnd.nextLong(i))) // any smaller id
    }.toMap
    def walk(i: Long): (Long, Long) = {
      var (cur, d) = (i, 0L)
      while (parents(cur).isDefined) { cur = parents(cur).get; d += 1 }
      (cur, d)
    }
    val df = parents.toSeq.map { case (i, p) => (i, p.map(Long.box).orNull) }
      .toDF("id", "parent")
    val got = Hierarchy.resolveRoots(df, "id", "parent", rounds = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 500)
    parents.keys.foreach { i =>
      assert(got(i) == walk(i), s"node $i: got ${got(i)}, want ${walk(i)}")
    }
  }

  test("resolveRoots fails loudly when the round budget is too shallow") {
    // a 6-deep chain needs 2^rounds >= 6 → rounds=2 (covers 4) must throw
    val chain = (0L to 6L).map(i => (i, if (i == 0) null else Long.box(i - 1)))
      .toDF("id", "parent")
    val e = intercept[RuntimeException] {
      Hierarchy.resolveRoots(chain, "id", "parent", rounds = 2).collect()
    }
    assert(e.getMessage.contains("raise `rounds`"))
    // rounds=3 (covers 8) resolves the same chain
    val ok = Hierarchy.resolveRoots(chain, "id", "parent", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ok(6L) == 6L)
  }

  test("g06: every community label is a vertex of the graph, partitioning-invariant") {
    val rows = MiningQueries.g06LabelProp(spark, sf()).collect()
    val vertices = rows.map(_.getLong(0)).toSet
    assert(rows.forall(r => vertices.contains(r.getLong(1))),
      "a community label must be a real vertex id")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = MiningQueries.g06LabelProp(spark, sf()).collect()
      assert(rows.sameElements(b), "partitioning changed the LPA assignment")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
