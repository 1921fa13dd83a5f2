package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of declared queries
  * without executing them (streaming-parity queries, which must run to
  * have a plan, print their batch-side DataFrame's plan after the run).
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"=== $name ===")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain failed: ${e.getMessage}]") }
      }
    spark.stop()
  }
}
