package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: runMain graft.Explain <sfDir> <query> [query...]
  * prints the formatted physical plan and times one execution. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[cold] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[warm] ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
