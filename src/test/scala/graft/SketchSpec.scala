package graft

import org.apache.spark.sql.functions._

/** Approximate-sketch surface (SURVEY A9): HLL++ distinct counts and
  * quantile sketches — the profiling primitives that replace exact
  * distinct/percentile at 100 TB (bounded memory, one pass, mergeable
  * across partitions). No DuckDB oracle can hash-match an approximation,
  * so these pin relative-error contracts against the exact answers.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within its rsd bound vs exact (HLL++)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val exact = docs.select(countDistinct(col("source"))).head.getLong(0)
    val approx = docs.select(approx_count_distinct(col("source"), rsd = 0.05))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx=$approx exact=$exact")

    // high-cardinality column too (doc ids are all distinct)
    val n = docs.count()
    val approxIds = docs.select(approx_count_distinct(col("doc_id"), rsd = 0.02))
      .head.getLong(0)
    assert(math.abs(approxIds - n).toDouble / n <= 0.06,
      s"approx=$approxIds exact=$n")
  }

  test("approx_percentile brackets the exact percentile (quantile sketch)") {
    val ev = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
    val exact = ev.select(percentile(col("value"), lit(0.5))).head.getDouble(0)
    val approx = ev.select(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head.getDouble(0)
    // accuracy 1000 → rank error <= n/1000; at sf0.001 values span ~[0,50]
    assert(math.abs(approx - exact) <= 2.0, s"approx=$approx exact=$exact")
  }

  test("sketches merge: partial aggregation appears in the plan (map-side HLL)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val plan = docs.groupBy(col("source"))
      .agg(approx_count_distinct(col("doc_id")).as("nd"))
      .queryExecution.executedPlan.toString
    // HLL buffers combine map-side before the shuffle — the property that
    // makes the sketch O(sketch) not O(rows) per partition at scale
    assert(plan.contains("partial_approx_count_distinct"), plan.take(2000))
  }
}
