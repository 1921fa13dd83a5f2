package graft

import graft.operators.{Embedder, ToyTextEncoder}
import org.apache.spark.sql.functions._

/** M2's inference path, executable end-to-end: the mapPartitions batch
  * plumbing must produce EXACTLY the sequential reference encoding —
  * independent of batch size and partitioning — and stay narrow (no
  * exchange in the plan). The toy model has real inference mechanics
  * (embed → mean-pool → matmul+bias head → L2 normalize); a production
  * run swaps the encoder for an ONNX session with the same interface. */
class EmbedderSpec extends SparkSpec {

  private val enc = ToyTextEncoder()

  private def embeddingsOf(df: org.apache.spark.sql.DataFrame,
      batchSize: Int): Map[Long, Seq[Float]] =
    Embedder.embedText(df, col("doc_id"), col("text"), enc, batchSize)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("distributed batched inference equals the sequential reference encode") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val expected = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        enc.encodeBatch(Array(r.getString(1))).head.toSeq).toMap
    val got = embeddingsOf(docs, batchSize = 8)
    assert(got == expected, "distributed path diverged from sequential encode")
  }

  test("batch size and partitioning never change results") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val base = embeddingsOf(docs, batchSize = 1)
    assert(embeddingsOf(docs, batchSize = 7) == base, "batch-size dependence")
    assert(embeddingsOf(docs.repartition(8), batchSize = 64) == base,
      "partitioning dependence")
  }

  test("pinned fixture: known text encodes to the frozen vector") {
    import spark.implicits._
    // frozen golden value: guards the weight derivation (seed, hash, fold
    // order) against silent drift — regenerate ONLY for a deliberate
    // model-version bump
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val v = embeddingsOf(df, batchSize = 4)(1L)
    assert(v.length == enc.dim)
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"not L2-normalized: $norm")
    val frozen = Seq(-0.3346899f, 0.18210235f, 0.5717055f, -0.29290918f,
      -0.15398425f, -0.19156712f, 0.121934f, 0.17330733f, 0.13485976f,
      -0.041370146f, -0.29577947f, -0.0896755f, 0.35895148f, -0.24100104f,
      -0.14415556f, 0.1171822f)
    assert(v == frozen, s"encoder output drifted from the frozen fixture: $v")
    // empty + null text must not throw and must stay deterministic
    val edge = Seq((2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ev = embeddingsOf(edge, batchSize = 2)
    assert(ev(2L) == ev(3L), "empty and null text must encode identically")
  }

  test("inference plan is narrow — no exchange added") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = Embedder.embedText(docs, col("doc_id"), col("text"), enc, 32)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"inference must not shuffle:\n${p.take(2000)}")
  }
}
