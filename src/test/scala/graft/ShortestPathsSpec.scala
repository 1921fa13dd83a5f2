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

  // ------------------------------------------------ weightedDistances

  private def wedges(triples: (Long, Long, Long)*) = {
    import spark.implicits._
    triples.toDF("u", "v", "w")
  }
  private def wresult(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted: a longer-hop lighter path beats a direct heavy edge") {
    // 1→3 direct costs 10; 1→2→3 costs 2 — needs the re-relaxation a
    // BFS-style frontier/anti-join would miss
    val e = wedges((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(wresult(ShortestPaths.weightedDistances(e, seeds(1L), rounds = 1)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(wresult(ShortestPaths.weightedDistances(e, seeds(1L), rounds = 2)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("weighted: edges relax both directions; multi-seed takes the min") {
    val e = wedges((2L, 1L, 5L), (3L, 2L, 5L), (4L, 3L, 5L))
    val got = wresult(ShortestPaths.weightedDistances(e, seeds(1L, 4L), rounds = 2))
    assert(got == Map(1L -> 0L, 4L -> 0L, 2L -> 5L, 3L -> 5L))
  }

  test("weighted: distances never increase with more rounds (monotone to fixpoint)") {
    val e = wedges((1L, 2L, 3L), (2L, 3L, 3L), (3L, 4L, 3L), (1L, 4L, 100L),
      (4L, 5L, 1L))
    val byRounds = (1 to 5).map(r =>
      wresult(ShortestPaths.weightedDistances(e, seeds(1L), rounds = r)))
    for (Seq(prev, next) <- byRounds.sliding(2))
      for ((n, dNext) <- next; dPrev <- prev.get(n)) assert(dNext <= dPrev)
    // fixpoint at diameter: rounds 4 and 5 identical
    assert(byRounds(3) == byRounds(4))
    assert(byRounds(4) == Map(1L -> 0L, 2L -> 3L, 3L -> 6L, 4L -> 9L, 5L -> 10L))
  }

  test("weighted: rounds=0 returns just the seeds at distance 0") {
    val e = wedges((1L, 2L, 1L))
    assert(wresult(ShortestPaths.weightedDistances(e, seeds(1L), rounds = 0)) ==
      Map(1L -> 0L))
  }
}
