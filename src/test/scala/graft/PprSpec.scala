package graft

import graft.queries.MiningQueries

/** g11 personalized PageRank — full plain-Scala recount of the 3-round
  * scaled-BIGINT fixpoint (edges, degrees, seed teleport, truncating
  * divisions) against the declared query, OpsQueriesSpec's discipline:
  * the DuckDB hash proves cross-engine agreement, this proves the shared
  * arithmetic is the INTENDED PPR.
  */
class PprSpec extends SparkSpec {

  test("g11: plain-Scala 3-round PPR recount reproduces the top-25; seeds never lose teleport") {
    val S = 1000000000000L
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val eu = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val e = eu.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = e.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val seeds = spark.read.parquet(sf() + "/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
      .filter(_ % 500 == 0).toSet
    val p0 = S / seeds.size
    val tele = (15L * p0) / 100
    var p: Map[Long, Long] = seeds.map(_ -> p0).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (u, v) =>
        p.get(u).foreach(pu => contrib(v) += pu / deg(u))
      }
      p = (contrib.keySet ++ seeds).map { v =>
        v -> ((if (seeds(v)) tele else 0L) + (85 * contrib(v)) / 100)
      }.toMap
    }
    val expected = p.toSeq.sortBy { case (v, r) => (-r, v) }.take(25)
    val got = MiningQueries.g11PersonalizedPagerank(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // every seed still holds at least its teleport mass after 3 rounds
    seeds.foreach(sv => assert(p(sv) >= tele, s"seed $sv lost its restart mass"))
  }
}
