package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

class SkylineEwmaSpec extends SparkSpec {

  test("q48: EWMA fold matches a driver-side recurrence for every user") {
    val got = AnalyticsQueries.q48Ewma(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_days"), r.getAs[Double]("ewma"))).toMap
    val daily = graft.core.Tables.tsNanos(spark.read.parquet(sf() + "/events.parquet"))
      .select(col("user_id"), to_date(timestamp_micros(expr("ts DIV 1000"))).as("day"))
      .groupBy("user_id", "day").count().collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.sortBy(_.getAs[java.sql.Date]("day").toString).map(_.getAs[Long]("count").toDouble)
      }
    assert(got.keySet == daily.keySet && got.nonEmpty)
    daily.foreach { case (u, xs) =>
      val expect = xs.tail.foldLeft(xs.head)((acc, x) => 0.25 * x + 0.75 * acc)
      assert(got(u)._1 == xs.length.toLong, s"user $u day count")
      assert(got(u)._2 == math.rint(expect * 1e9) / 1e9 ||
        math.abs(got(u)._2 - expect) < 1e-8, s"user $u: got ${got(u)._2} want $expect")
    }
  }

  test("q49: sweep skyline = exactly the undominated set (quadratic check)") {
    val all = spark.read.parquet(sf() + "/part.parquet")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = all.exists { q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val expect = all.filterNot(dominated).map(_._1).toSet
    val got = AnalyticsQueries.q49Skyline(spark, sf()).collect().map(_.getLong(0)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.nonEmpty)
  }

  test("q49: duplicate points survive together (neither strictly dominates)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skyspec").toString
    Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 12.0, 5), (4L, 9.0, 2))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = AnalyticsQueries.q49Skyline(spark, dir).collect().map(_.getLong(0)).toSet
    // 3 is dominated (same size, pricier); 4 survives (cheapest); 1,2 identical → both stay
    assert(got == Set(1L, 2L, 4L))
  }
}
