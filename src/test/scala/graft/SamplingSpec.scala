package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("split is a pure function of the id — stable across evaluations") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val a = df.select(Sampling.split(col("id"), 80, 10)).collect().map(_.getString(0))
    val b = df.select(Sampling.split(col("id"), 80, 10)).collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSet == Set("train", "val", "test"))
  }

  test("split fractions land near the configured percentages") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val counts = df.select(Sampling.split(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 1600L) < 120, counts)
    assert(math.abs(counts("val") - 200L) < 80, counts)
    assert(math.abs(counts("test") - 200L) < 80, counts)
  }

  test("samplePredicate selects the same rows as the bucket arithmetic") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val viaPred = df.filter(Sampling.samplePredicate(col("id"), 10))
      .collect().map(_.getLong(0)).toSet
    val viaBucket = df.select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .filter(col("b") < 10).collect().map(_.getLong(0)).toSet
    assert(viaPred == viaBucket && viaPred.nonEmpty)
  }

  test("stratumCappedPredicate: small strata keep everything, big strata ~cap") {
    import spark.implicits._
    // stratum A: 30 rows (< cap 60, threshold 10000 → keep all);
    // stratum B: 2000 rows (threshold 300 → expect ~60 kept)
    val df = ((0L until 30L).map(i => ("A", i)) ++
      (1000L until 3000L).map(i => ("B", i))).toDF("src", "id")
    val sizes = df.groupBy("src").count()
    val kept = df.join(sizes, "src")
      .filter(Sampling.stratumCappedPredicate(col("id"), col("count"), cap = 60))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("A") == 30L, s"small stratum must be fully kept: $kept")
    assert(math.abs(kept.getOrElse("B", 0L) - 60L) < 35, s"big stratum far off cap: $kept")
  }
}
