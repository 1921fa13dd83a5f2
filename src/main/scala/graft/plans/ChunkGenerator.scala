package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Chunker

/** `explode_chunks(text[, chunk_size[, overlap]])` — the recursive text
  * chunker (SURVEY M1; RecursiveCharacterTextSplitter 800/100 semantics) as
  * a Catalyst `Generator`: one input row yields one output row per chunk
  * with `(chunk_index, chunk)`, usable directly from SQL via
  * [[GraftExtensions]]. The SQL/UDTF face of
  * [[graft.operators.Chunker.explodeChunks]].
  *
  * Generators run outside whole-stage codegen by design (CodegenFallback is
  * the norm — Spark's own `Explode` generator family works the same way);
  * the per-row Scala splitter is the cost center, not the dispatch.
  */
case class ChunkGeneratorExpr(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def prettyName: String = "explode_chunks"

  override def checkInputDataTypes(): TypeCheckResult = {
    val shapeOk = children.nonEmpty && children.size <= 3 &&
      children.head.dataType == StringType &&
      children.drop(1).forall(c => c.dataType == IntegerType && c.foldable)
    if (!shapeOk) return TypeCheckResult.TypeCheckFailure(
      "explode_chunks(text STRING [, chunk_size INT literal [, overlap INT literal]])")
    // foldable args evaluate here: reject null/non-positive sizes at analysis
    val sizeArg = children.lift(1).map(_.eval())
    val overlapArg = children.lift(2).map(_.eval())
    if (sizeArg.exists(v => v == null || v.asInstanceOf[Int] <= 0))
      TypeCheckResult.TypeCheckFailure("explode_chunks: chunk_size must be a positive INT literal")
    else if (overlapArg.exists(v => v == null || v.asInstanceOf[Int] < 0))
      TypeCheckResult.TypeCheckFailure("explode_chunks: overlap must be a non-negative INT literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  private lazy val chunkSize: Int =
    if (children.size >= 2) children(1).eval().asInstanceOf[Int]
    else Chunker.DefaultChunkSize
  private lazy val overlap: Int =
    if (children.size >= 3) children(2).eval().asInstanceOf[Int]
    else Chunker.DefaultOverlap

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = children.head.eval(input)
    if (t == null) return Iterator.empty
    Chunker.recursiveSplit(t.asInstanceOf[UTF8String].toString, chunkSize, overlap)
      .iterator.zipWithIndex.map { case (c, i) =>
        InternalRow(i, UTF8String.fromString(c))
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
