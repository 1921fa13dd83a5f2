package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions.cosineSimilarity

/** Scratch profiling main — s06 stage decomposition. Not part of the
  * declared surface; keep out of SparkEntry. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(df: => DataFrame): Unit = {
      val mk = () => df.write.format("noop").mode("overwrite").save()
      mk()
      System.gc()
      val t0 = System.nanoTime(); mk()
      val t1 = System.nanoTime(); mk()
      val sec = math.min(System.nanoTime() - t1, t1 - t0) / 1e9
      println(f"PROBE $label%-32s $sec%.2f s")
    }
    val dim = 64; val nPlanes = 5; val nTables = 6; val m = 8
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
    def tables(v: org.apache.spark.sql.Column) = array((0 until nTables).map { tt =>
      struct(lit(tt).as("tbl"), Similarity.lshBucket(v, dim, nPlanes, seed = 42L + tt).as("bucket"))
    }: _*)
    val fpCol = Similarity.lshPlanes(dim, 64, seed = 41L).zipWithIndex.map {
      case (p, j) =>
        val plane = array(p.toIndexedSeq.map(x => lit(x)): _*)
        when(aggregate(zip_with(col("embedding"), plane, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = base
      .select(col("id"), col("v"), explode(tables(col("v"))).as("tb"))
      .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"), col("id"), col("v"))
    t("bucketed")(bucketed)
    val coded = corpus.select(col("vec_id").as("id"), fpCol.as("fp"))
      .join(bucketed.select(col("tbl"), col("bucket"), col("id")), Seq("id"))
    t("coded")(coded)
    val lhs = coded.select(col("tbl"), col("bucket"), col("id").as("src"), col("fp").as("sfp"))
    val rhs = coded.select(col("tbl"), col("bucket"), col("id").as("dst"), col("fp").as("dfp"))
    val pairs = lhs.join(rhs, Seq("tbl", "bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), bit_count(col("sfp").bitwiseXOR(col("dfp"))).as("w"))
    t("pairs")(pairs)
    val knn = pairs.distinct()
      .withColumn("rn", row_number().over(Window.partitionBy(col("src")).orderBy(col("w"), col("dst"))))
      .filter(col("rn") <= m).select(col("src"), col("dst"))
    t("knn")(knn)
    val edges = knn.union(knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    t("edges")(edges)
    println("PAIRS " + pairs.count() + " EDGES " + edges.count())
  }
}
