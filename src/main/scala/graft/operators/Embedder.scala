package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executor-side batched text → embedding inference: the Spark plumbing
  * of the reference's sentence-embedding stage
  * (assets/rag/process_text_chunks.py:21,62-68 — SentenceTransformer
  * encode over chunk batches), with the MODEL behind a swappable
  * interface.
  *
  * The declared vector queries keep consuming the PRECOMPUTED embeddings
  * table (the driver's oracle surface — M2's documented posture); this
  * operator makes the inference path itself executable end-to-end: a
  * production deployment swaps [[BatchTextEncoder]] for an ONNX-runtime
  * session (loaded once per executor, invoked per batch) without touching
  * the Spark side. Everything Spark-shaped here is real and spec-tested:
  * result schema, per-partition batch accumulation, batch-size and
  * partitioning invariance, and the narrow (shuffle-free) plan.
  *
  * Scale notes: inference is a narrow `mapPartitions` — no shuffle, no
  * driver collection; throughput scales with executors × cores. Batching
  * exists for the MODEL's sake (ONNX/GPU batch amortization); rows are
  * encoded independently, so batch boundaries can never change results —
  * the spec pins that. Weights live in the encoder instance and ship via
  * task-closure broadcast once per executor, exactly like an ONNX model
  * file distributed via `--files`.
  */
trait BatchTextEncoder extends Serializable {
  /** Output dimensionality (fixed per model). */
  def dim: Int
  /** Encode a batch; MUST treat rows independently (order-stable,
    * padding-free semantics) so partitioning cannot change results. */
  def encodeBatch(texts: Array[String]): Array[Array[Float]]
}

/** Deterministic stand-in model with REAL inference mechanics — embed →
  * mean-pool → dense projection (matmul + bias) → L2 normalize, the
  * standard sentence-encoder head — and hand-rolled integer-hash weights
  * (no files, no RNG, no new deps). Token "embeddings" are computed from
  * an FNV-1a hash (a matrix-free lookup table); the projection uses a
  * seed-derived dense dim×dim matrix. All arithmetic is a fixed-order
  * sequential fold per document, so results are bit-identical across
  * partitionings, batch sizes and JVMs. */
final case class ToyTextEncoder(dim: Int = 16, seed: Long = 0x5EEDL)
    extends BatchTextEncoder {
  private val Prime = 1000003L // small prime: hash → (-1, 1) quantized grid

  @inline private def fnv1a(s: String, salt: Long): Long = {
    var h = 0xcbf29ce484222325L ^ salt
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }
  /** hash → [-1, 1) on a 1/Prime grid — deterministic float weights. */
  @inline private def unit(h: Long): Float =
    ((java.lang.Math.floorMod(h, Prime).toDouble / Prime.toDouble) * 2.0 - 1.0).toFloat

  // dense projection weights + bias, derived from the seed alone — the
  // "model artifact"; a real deployment deserializes these from ONNX
  private val w: Array[Array[Float]] =
    Array.tabulate(dim, dim)((i, j) => unit(fnv1a(s"w:$i:$j", seed)))
  private val b: Array[Float] = Array.tabulate(dim)(i => unit(fnv1a(s"b:$i", seed)))

  override def encodeBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map { t =>
      val toks = Option(t).getOrElse("").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      // token embedding lookup + mean pool (fixed left-to-right fold)
      val pooled = new Array[Float](dim)
      var n = 0
      toks.foreach { tok =>
        val h = fnv1a(tok, seed)
        var k = 0
        while (k < dim) { pooled(k) += unit(h * (k + 1) + k); k += 1 }
        n += 1
      }
      if (n > 0) { var k = 0; while (k < dim) { pooled(k) /= n; k += 1 } }
      // dense head: out = W·pooled + b, then L2 normalize
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var acc = b(i).toDouble
        var j = 0
        while (j < dim) { acc += w(i)(j).toDouble * pooled(j).toDouble; j += 1 }
        out(i) = acc.toFloat
        i += 1
      }
      val norm = math.sqrt(out.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      if (norm > 0) { var k = 0; while (k < dim) { out(k) = (out(k) / norm).toFloat; k += 1 } }
      out
    }
}

object Embedder {

  /** (id, text) → (id, embedding: array<float>) via per-partition batched
    * inference. Narrow — preserves partitioning, adds no exchange. */
  def embedText(df: DataFrame, id: Column, text: Column,
      encoder: BatchTextEncoder, batchSize: Int = 32): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val in = df.select(id.cast("long").as("id"), text.cast("string").as("text"))
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val arr = batch.toArray
        val vecs = encoder.encodeBatch(arr.map(_.getString(1)))
        arr.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row(r.getLong(0), v.toSeq)
        }
      }
    }
  }
}
