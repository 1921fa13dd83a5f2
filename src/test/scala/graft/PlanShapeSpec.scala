package graft

/** Physical-plan shape assertions: the plans we designed for, pinned so a
  * regression (lost broadcast, lost pushdown, lost TakeOrdered) fails a
  * spec instead of silently costing a shuffle at scale. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.queryExecution.executedPlan.toString
  }

  test("q01: column pruning reaches the parquet scan") {
    val p = plan("q01_scan_project")
    // only the 3 needed columns (2 projected + sort tie-break) are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "scan reads unneeded columns")
    assert(!p.contains("l_shipdate"), "scan reads unneeded columns")
  }

  test("q03: equality predicate pushed to the scan") {
    val p = plan("q03_filter")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(lang,en)"), p.take(2000))
  }

  test("q06: dimension joins broadcast (no sort-merge for nation/region)") {
    val p = plan("q06_multi_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("q12: order+limit plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q12_order_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q13: single-query top-k is scan + TakeOrdered — no corpus shuffle") {
    val p = plan("q13_topk_l2")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query vector should broadcast")
  }

  test("r01: anonymization is a narrow projection (no Exchange beyond the input repartition)") {
    val p = plan("r01_anonymize")
    // one round-robin repartition of the single-row-group input is expected;
    // the regex work itself must not introduce additional exchanges
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n${p.take(2000)}")
  }
}
