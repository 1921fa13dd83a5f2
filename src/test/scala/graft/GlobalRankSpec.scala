package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Distributed global rank pinned against the single-partition window
  * formulation it replaces, and the ntile closed form against Spark's own
  * ntile — including non-divisible row counts. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("rank equals the SinglePartition row_number on a random frame") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(997)((rnd.nextInt(100000), rnd.nextLong()))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val df = rows.toDF("id", "k1", "k2")
    val got = GlobalRank.withGlobalRank(df, Seq(col("k1"), col("id")))
      .select(col("id"), col("global_rank"))
    val expected = df
      .withColumn("global_rank",
        row_number().over(Window.orderBy(col("k1"), col("id"))).cast("long"))
      .select(col("id"), col("global_rank"))
    assert(got.as[(Long, Long)].collect().toMap ==
      expected.as[(Long, Long)].collect().toMap)
  }

  test("rank is dense 1..n and deterministic across invocations") {
    val df = (0L until 500L).map(i => (i, (i * 7919) % 501)).toDF("id", "k")
    val a = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")))
      .select(col("id"), col("global_rank")).as[(Long, Long)].collect().toMap
    val b = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")))
      .select(col("id"), col("global_rank")).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (1L to 500L))
  }

  test("ntileExpr matches Spark's ntile, divisible and non-divisible n") {
    for (n <- Seq(100, 97, 7, 10, 11)) {
      val df = (1 to n).map(_.toLong).toDF("r")
      val got = df.withColumn("b", GlobalRank.ntileExpr("r", n, 10))
        .select(col("r"), col("b")).as[(Long, Int)].collect().toMap
      val expected = df
        .withColumn("b", ntile(10).over(Window.orderBy(col("r"))))
        .select(col("r"), col("b")).as[(Long, Int)].collect().toMap
      assert(got == expected, s"n=$n")
    }
  }

  test("heavily skewed keys (one hot value) still rank densely via the tiebreaker") {
    // 90% of rows share one key — the range partitioner puts the hot value
    // in one partition; ranks must still be the unique total order
    val df = (0L until 1000L).map(i => (i, if (i < 900) 7L else i)).toDF("id", "k")
    val got = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")))
      .select(col("id"), col("global_rank")).as[(Long, Long)].collect().toMap
    val expected = df
      .withColumn("global_rank",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select(col("id"), col("global_rank")).as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("empty input yields empty output without failing") {
    val df = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(GlobalRank.withGlobalRank(df, Seq(col("k"), col("id"))).count() == 0L)
  }

  test("exclusive prefix sum equals the SinglePartition window on a random frame") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 5000L).map(i => (i, rnd.nextInt(100).toLong)).toDF("id", "v")
    val got = GlobalRank.withGlobalPrefixSum(df, Seq(col("id")), col("v"), "ps")
      .select(col("id"), col("ps")).as[(Long, Long)].collect().toMap
    val expected = df
      .withColumn("ps", coalesce(sum(col("v")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("ps")).as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got(0L) == 0L) // EXCLUSIVE: first row sums nothing
  }

  test("prefix sum: nulls count as zero but keep their position; empty input is empty") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "v")
    val got = GlobalRank.withGlobalPrefixSum(df, Seq(col("id")), col("v"), "ps")
      .select(col("id"), col("ps")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 10L))
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(GlobalRank.withGlobalPrefixSum(empty, Seq(col("id")), col("v")).count() == 0L)
  }
}
