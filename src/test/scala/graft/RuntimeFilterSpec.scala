package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filter (bloom) injection — the Catalyst rewrite that
  * turns a selective dimension filter into a pre-shuffle bloom probe on the
  * fact side. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling the ~matching fraction; the spec pins that our
  * session configuration actually lets `InjectRuntimeFilter` fire (the
  * size thresholds are production-tuned, so the tiny fixture needs them
  * lowered to observe the rewrite).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom runtime filter on the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "100MB")
      conf.set(keys(2), "0")
      // force a shuffle join so the runtime filter has a shuffle to protect
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val dim = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"runtime bloom filter not injected:\n${p.take(3000)}")
    } finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      }
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
