package graft

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("codegen cosine/l2 match the fold formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextFloat()), Seq.fill(64)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    // fold formulation (the previous implementation)
    def foldSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val foldCos = foldDot(col("a"), col("b")) /
      (sqrt(foldDot(col("a"), col("a"))) * sqrt(foldDot(col("b"), col("b"))))
    val foldL2 = sqrt(foldSum(zip_with(col("a"), col("b"),
      (x, y) => pow(x.cast("double") - y.cast("double"), 2))))
    val out = df.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("c1"), foldCos.as("c2"),
      VectorExpressions.l2Dist(col("a"), col("b")).as("l1"), foldL2.as("l2")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine bits differ")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "l2 bits differ")
    }
  }

  test("null and mismatched-length inputs yield null") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f)),
      (null.asInstanceOf[Seq[Float]], Seq(1.0f))).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineSim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("SQL registration via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) c, " +
        "l2_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) l").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(r.getDouble(1) == 5.0)
  }

  test("VectorFunctions kernels now route through the codegen expressions") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.cosineSimilarity(col("a"), col("a")),
      VectorFunctions.l2Distance(col("a"), col("b"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(6.0)) < 1e-12)
  }
}
