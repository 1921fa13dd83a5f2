package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical accessors for the test-fixture star schema
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §A).
  *
  * All engine operators take DataFrames, not paths — these helpers exist so
  * query definitions stay terse. At production scale the same operators run
  * over arbitrary `spark.read.parquet` inputs; nothing below hard-codes a
  * scale factor.
  */
object Tables {

  /** Fan a single-row-group fixture file out across the cores.
    *
    * The driver-generated test parquet has ONE row group per table, so the
    * scan is a single InputPartition no matter what maxPartitionBytes says —
    * and everything up to the first exchange (explode, hash, decimal agg,
    * broadcast probe) would run on one core. One cheap round-robin exchange
    * right after the scan restores parallelism. Production data at 100 TB
    * has thousands of row groups and never takes this branch (the threshold
    * checks the scan's actual partition count, not the fixture layout).
    * Small dimension files stay as-is so they remain obvious broadcast
    * candidates.
    */
  private def parallelize(spark: SparkSession, df: DataFrame, bytes: Long): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (bytes > 512 * 1024 && df.rdd.getNumPartitions < math.max(2, target / 4))
      df.repartition(target)
    else df
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    parallelize(spark, df, new java.io.File(path).length)
  }

  /** Scan WITHOUT the [[parallelize]] round-robin fan-out — for consumers
    * whose FIRST operation is already a shuffle (a join or aggregate on a
    * fact-table key). For those plans the fan-out exchange is pure waste:
    * the shuffle right after it re-distributes everything anyway, and the
    * pre-shuffle work is a narrow projection a single core finishes in
    * tens of milliseconds at fixture scale (measured in Probe, round 10:
    * the co-purchase pair join costs 0.7 s from a raw scan vs 1.6 s
    * through the fan-out). Keep [[table]] for consumers with heavy
    * narrow work (hashing, explode, vector math) before the first
    * exchange. At production scale the file has many row groups, the scan
    * parallelizes natively, and the two accessors behave identically. */
  def tableRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events-shaped `ts` column to BIGINT epoch NANOSECONDS.
    *
    * Driver data generations have shipped `ts` as INT64 TIMESTAMP(NANOS)
    * (readable only as long nanos via `nanosAsLong`) and as
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Every engine operator is
    * written against the BIGINT-nanos contract (`ts DIV 1000` → micros),
    * so this single projection at the scan absorbs the physical-type
    * difference — a narrow per-row cast that leaves column pruning and
    * predicate pushdown on the remaining columns intact. The NTZ→LTZ cast
    * is exact because every engine session pins UTC. */
  def tsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case _ => df.withColumn("ts",
      org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = tsNanos(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * The defaults assume the local[32] test harness but are chosen to
  * generalize: AQE on (runtime coalesce + skew-join), broadcast threshold
  * left at Spark's default so dimension tables broadcast, shuffle
  * partitions sized to the harness core count.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark 4 refuses;
      // read as long nanos and convert explicitly where event-time is needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }
}
