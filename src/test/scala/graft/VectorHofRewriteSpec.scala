package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The HOF→codegen optimizer rule ([[graft.plans.VectorHofRewrite]]):
  * declaratively-written vector arithmetic must optimize to the fused
  * native expressions with identical results (incl. null semantics). */
class VectorHofRewriteSpec extends SparkSpec {
  import spark.implicits._

  // the natural HOF formulations a user would write
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def hofNorm(a: Column): Column = sqrt(hofDot(a, a))
  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (hofNorm(a) * hofNorm(b))
  private def hofL2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => pow(x.cast("double") - y.cast("double"), 2.0)),
      lit(0.0), (acc, v) => acc + v))

  // parquet-backed so ConvertToLocalRelation cannot constant-fold the
  // projection away before the plan can be inspected
  private lazy val df = {
    val dir = java.nio.file.Files.createTempDirectory("vhof").toString + "/t"
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.0f, 2.5f), Array(-2.0f, 0.25f, 1.0f))
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def optimized(c: Column): String =
    df.select(c.as("out")).queryExecution.optimizedPlan.toString

  test("HOF dot product rewrites to the codegen dot_product expression") {
    val p = optimized(hofDot(col("a"), col("b")))
    assert(p.contains("dot_product("), p)
    assert(!p.contains("aggregate("), s"HOF survived optimization:\n$p")
    val got = df.select(hofDot(col("a"), col("b"))).collect().map(_.getDouble(0)).sorted
    assert(got.toSeq == Seq(1.25, 32.0))
  }

  test("HOF cosine composite fuses to ONE cosine_sim pass") {
    val p = optimized(hofCosine(col("a"), col("b")))
    assert(p.contains("cosine_sim("), p)
    assert(!p.contains("dot_product("), s"cosine decayed into separate dots:\n$p")
    val hof = df.select(hofCosine(col("a"), col("b"))).collect().map(_.getDouble(0)).sorted
    val native = df.select(
      graft.functions.VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .collect().map(_.getDouble(0)).sorted
    assert(hof.toSeq == native.toSeq, "fused result differs from native kernel")
  }

  test("HOF euclidean distance rewrites to l2_dist") {
    val p = optimized(hofL2(col("a"), col("b")))
    assert(p.contains("l2_dist("), p)
    val hof = df.select(hofL2(col("a"), col("b"))).collect().map(_.getDouble(0)).sorted
    val native = df.select(
      graft.functions.VectorFunctions.l2Distance(col("a"), col("b")))
      .collect().map(_.getDouble(0)).sorted
    assert(hof.toSeq == native.toSeq)
  }

  test("operand order is accepted commuted (y*x) but not arbitrary lambdas") {
    val commuted = aggregate(
      zip_with(col("a"), col("b"), (x, y) => y.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    assert(optimized(commuted).contains("dot_product("))
    // x*x is not a dot of (a, b) — must NOT rewrite
    val notDot = aggregate(
      zip_with(col("a"), col("b"), (x, _) => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    assert(!optimized(notDot).contains("dot_product("))
  }

  test("null semantics preserved: null element and length mismatch poison to null") {
    val nullElem = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(1.0), Some(2.0), Some(3.0))))
      .toDF("a", "b")
    val r1 = nullElem.select(hofDot(col("a"), col("b")).as("d")).collect()(0)
    assert(r1.isNullAt(0), "null element must poison the dot product")

    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val r2 = mismatch.select(hofDot(col("a"), col("b")).as("d")).collect()(0)
    assert(r2.isNullAt(0), "length mismatch must yield null")
  }

  test("zero-norm and empty vectors yield NULL from both HOF and fused cosine") {
    // HOF path divides via Spark's Divide → NULL on a 0.0 divisor; the
    // fused kernel must agree (NULL, never NaN) for the rewrite to be safe
    // parquet-backed so the fused kernel runs its CODEGEN path, not a
    // constant-folded interpreted eval
    val dir = java.nio.file.Files.createTempDirectory("vhof-zero").toString + "/t"
    Seq(
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0)), // zero-norm left
      (Seq.empty[Double], Seq.empty[Double])     // empty arrays
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val zero = spark.read.parquet(dir)
    val hof = zero.select(hofCosine(col("a"), col("b")).as("c")).collect()
    val native = zero.select(
      graft.functions.VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c")).collect()
    hof.zip(native).zipWithIndex.foreach { case ((h, n), i) =>
      assert(h.isNullAt(0), s"row $i: HOF cosine must be NULL, got ${h.get(0)}")
      assert(n.isNullAt(0), s"row $i: fused cosine must be NULL, got ${n.get(0)}")
    }
  }

  test("dot_product is registered as a SQL function") {
    df.createOrReplaceTempView("vhof")
    val out = spark.sql("SELECT dot_product(a, b) AS d FROM vhof ORDER BY d")
      .collect().map(_.getDouble(0))
    assert(out.length == 2 && out(1) == 32.0)
  }
}
