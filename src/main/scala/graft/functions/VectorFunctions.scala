package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure Column
  * expressions — whole-stage-codegen friendly, no UDF boundary, no
  * serialization. Mirrors the reference's FAISS L2 / sentence-transformers
  * cosine semantics (reference: resources/embedding/rag_search.py:29-35,
  * resources/embedding/eu_theme_classifier.py:31).
  *
  * Numerical determinism contract: every reduction is a *sequential left
  * fold* (`aggregate` over `zip_with`), evaluated in element order with a
  * 0.0 initial accumulator. Folding in a fixed order makes results
  * bit-reproducible across runs and engines — required for the DuckDB
  * oracle hash-compare, and a good property at 100 TB too (retries produce
  * identical bytes). All arithmetic is promoted to Double before
  * accumulating.
  */
object VectorFunctions {

  /** Sequential-fold sum of an array<double> expression. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product of two float/double vectors, accumulated in Double. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2 (Euclidean) distance — FAISS IndexFlatL2 metric. Native codegen
    * expression (see [[graft.plans.L2DistanceExpr]]); bit-identical to the
    * fold formulation. */
  def l2Distance(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.l2Dist(a, b)

  /** Cosine similarity — sentence-transformers `util.cos_sim` semantics.
    * Native codegen expression (see [[graft.plans.CosineSimilarityExpr]]). */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** Cosine distance (1 - similarity) — LanceDB `metric="cosine"`. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)
}
