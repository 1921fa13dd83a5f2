package graft

/** Every declared query must execute at sf0.001 without error; the flagship
  * entry and the rows-only-checked queries must return rows. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query and oracle key sets are consistent") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  // rows-only queries: the driver only checks rows > 0, so pin that here too.
  private val mustHaveRows = Set("q21_chunk_recursive", "s02_ann_lsh", "s03_ann_ivf")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sf()).count()
      if (mustHaveRows(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
