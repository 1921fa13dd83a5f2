package graft

import graft.queries.{AnalyticsQueries, LlmQueries, SketchQueries}
import org.apache.spark.sql.functions._

/** Contracts for q66 attribution, d21 bitmap-distinct, t27 Zipf profile. */
class AttributionBitmapSpec extends SparkSpec {

  test("q66: attribution conserves purchases and revenue exactly") {
    val rows = AnalyticsQueries.q66Attribution(spark, sf()).collect()
    val p = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("rev")).head
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == p.getAs[Long]("n"),
      "every purchase must be attributed to exactly one channel")
    // revenue re-partitions exactly because both sides sum in DECIMAL
    val total = rows.map(r => BigDecimal(r.getAs[Double]("revenue"))).sum
    assert((total - BigDecimal(p.getDecimal(1).toString)).abs < BigDecimal("0.000001"),
      s"channel revenues $total must repartition the total ${p.getDecimal(1)}")
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "signup", "unattributed")))
  }

  test("d21: bitmap popcount equals count_distinct — the sketch is exact") {
    val got = SketchQueries.d21BitmapDistinct(spark, sf()).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    val want = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .groupBy(col("event_type")).agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"bitmap distinct $got != exact $want")
  }

  test("d21: word count bounds — n_words <= ceil(idspace/32) and densest <= 32") {
    SketchQueries.d21BitmapDistinct(spark, sf()).collect().foreach { r =>
      assert(r.getAs[Long]("densest_word") <= 32L)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_words") * 32L)
    }
  }

  test("t27: ranks are powers of two and rank 1 matches t08's top word") {
    val rows = LlmQueries.t27ZipfProfile(spark, sf()).collect()
    rows.foreach { r =>
      val rank = r.getAs[Long]("rank")
      assert((rank & (rank - 1)) == 0 && rank >= 1)
      assert(r.getAs[Long]("rank_cnt") == rank * r.getAs[Long]("cnt"))
    }
    // frequencies must be non-increasing with rank
    val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cnt"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    val top = LlmQueries.t08TopVocab(spark, sf()).head
    assert(rows.find(_.getAs[Long]("rank") == 1L).get.getAs[String]("word") ==
      top.getAs[String]("word"))
  }
}
