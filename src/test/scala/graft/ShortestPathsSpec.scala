package graft

import graft.operators.ShortestPaths
import org.apache.spark.sql.functions._

class ShortestPathsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }
  private def seeds(ids: Long*) = {
    import spark.implicits._
    ids.toDF("node")
  }
  private def result(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain graph: hop counts radiate from the seed, capped at maxHops") {
    // 1-2-3-4-5-6; radius 3 from node 1 reaches 4, never 5 or 6
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val got = result(ShortestPaths.hops(e, seeds(1L), maxHops = 3))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("edges are undirected: reachability flows against edge direction") {
    val e = edges(2L -> 1L, 3L -> 2L) // stored pointing AT the seed
    val got = result(ShortestPaths.hops(e, seeds(1L), maxHops = 2))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("multi-source: hops is the min over seeds; ring converges early") {
    // ring 1-2-3-4-5-1 with seeds 1 and 3: everything within 1 hop
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 1L)
    val got = result(ShortestPaths.hops(e, seeds(1L, 3L), maxHops = 3))
    assert(got == Map(1L -> 0, 3L -> 0, 2L -> 1, 4L -> 1, 5L -> 1))
  }

  test("disconnected component is never reached; isolated seed stays hops=0") {
    val e = edges(1L -> 2L, 10L -> 11L)
    val got = result(ShortestPaths.hops(e, seeds(1L, 99L), maxHops = 5))
    assert(got == Map(1L -> 0, 99L -> 0, 2L -> 1))
  }

  test("empty frontier stops the loop before maxHops (no wasted joins)") {
    // single edge, huge cap — loop must terminate by emptiness, not the cap
    val e = edges(1L -> 2L)
    val got = result(ShortestPaths.hops(e, seeds(1L), maxHops = 50))
    assert(got == Map(1L -> 0, 2L -> 1))
  }

  test("duplicate seeds and parallel edge listings do not duplicate output") {
    val e = edges(1L -> 2L, 1L -> 2L, 2L -> 1L)
    val df = ShortestPaths.hops(e, seeds(1L, 1L), maxHops = 2)
    assert(df.count() == df.select(col("node")).distinct().count())
    assert(result(df) == Map(1L -> 0, 2L -> 1))
  }
}
