package graft.operators

/** ONNX-runtime swap-in for [[BatchTextEncoder]] — the production half of
  * the embedding stage the reference runs with SentenceTransformer
  * (assets/rag/process_text_chunks.py:21,62-68), wired entirely through
  * REFLECTION so the engine keeps zero compile-time dependencies beyond
  * Spark (this container resolves nothing else; a deployment that ships
  * `onnxruntime*.jar` on the executor classpath gets the real path with
  * no rebuild).
  *
  * The lifecycle mirrors how an ONNX session is actually deployed on a
  * Spark cluster:
  *
  *  1. the model file is distributed once (`--files model.onnx` or a
  *     shared mount), NOT broadcast per task;
  *  2. [[OnnxRuntime.available]] probes the executor classpath for
  *     `ai.onnxruntime.OrtEnvironment` (the public ONNX Runtime Java API
  *     entry point) — `Class.forName(..., initialize = false, ...)` so
  *     the probe itself loads no native library;
  *  3. [[OnnxRuntime.bestAvailable]] picks the session-backed encoder
  *     when BOTH the runtime and the model file exist, else falls back to
  *     the deterministic [[ToyTextEncoder]] — which is what this CI runs,
  *     spec-pinned in OnnxEncoderSpec;
  *  4. [[OnnxTextEncoder]] holds the session `@transient lazy`, so each
  *     executor JVM creates it once on first batch (the
  *     load-once-per-executor pattern), and the Spark-side plumbing —
  *     [[Embedder]]'s mapPartitions batching, schema, invariance specs —
  *     is byte-for-byte the same as with the toy encoder.
  *
  * Tokenization is the caller's contract (`tokenize: String =>
  * Array[Long]`): a real sentence-transformer pairs the .onnx file with
  * its exact tokenizer artifact, and faking one would silently change
  * embeddings — the honest boundary is to require it. The default is the
  * whitespace+hash scheme the toy encoder uses, suitable only for
  * plumbing tests.
  *
  * Reflection call sequence (the ONNX Runtime Java API, public docs):
  * {{{
  *   val env  = OrtEnvironment.getEnvironment()
  *   val sess = env.createSession(modelPath)
  *   val ids  = OnnxTensor.createTensor(env, Array(Array(tokenIds: _*)))
  *   val mask = OnnxTensor.createTensor(env, Array(Array.fill(n)(1L)))
  *   val out  = sess.run(Map("input_ids" -> ids, "attention_mask" -> mask))
  *   // out(0) = [1, seqLen, dim] token embeddings -> mean-pool -> L2 norm
  * }}}
  */
object OnnxRuntime {

  /** True iff the ONNX Runtime Java API is on this JVM's classpath.
    * `initialize = false`: the probe must not trigger native-library
    * loading — deciding is free, only using costs. */
  def available(cl: ClassLoader = getClass.getClassLoader): Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment", false, cl); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  /** The swap point [[Embedder]] callers use: the ONNX session encoder
    * when the runtime AND the model artifact are both present, otherwise
    * the deterministic toy — never an error at selection time, so the
    * same job definition runs in CI (toy) and production (ONNX). */
  def bestAvailable(modelPath: Option[String], dim: Int,
      tokenize: String => Array[Long] = OnnxTextEncoder.hashTokenize): BatchTextEncoder =
    modelPath match {
      case Some(p) if available() && new java.io.File(p).isFile =>
        OnnxTextEncoder(p, dim, tokenize)
      case _ => ToyTextEncoder(dim)
    }
}

/** Session-backed encoder. Constructing it is free (session is
  * `@transient lazy` — serialization ships only the path + dim, the
  * executor builds its own session on first batch); calling
  * [[encodeBatch]] without the runtime on the classpath fails with a
  * clear IllegalStateException naming the missing jar, spec-pinned. */
final case class OnnxTextEncoder(modelPath: String, dim: Int,
    tokenize: String => Array[Long]) extends BatchTextEncoder {

  @transient private lazy val refl: OnnxTextEncoder.Refl = {
    if (!OnnxRuntime.available())
      throw new IllegalStateException(
        "ai.onnxruntime.OrtEnvironment not on the classpath — ship " +
          "onnxruntime*.jar with the executors or use OnnxRuntime.bestAvailable " +
          "(which falls back to ToyTextEncoder)")
    OnnxTextEncoder.Refl(modelPath)
  }

  override def encodeBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map { t =>
      val ids = tokenize(Option(t).getOrElse(""))
      val tok = refl.run(if (ids.isEmpty) Array(0L) else ids)
      // mean-pool the [seqLen][dim-ish] token matrix, then L2-normalize —
      // the standard sentence-transformers head; truncate/pad to `dim`
      val width = if (tok.isEmpty) dim else tok.head.length
      val pooled = new Array[Float](dim)
      var i = 0
      while (i < tok.length) {
        var k = 0
        while (k < math.min(dim, width)) { pooled(k) += tok(i)(k); k += 1 }
        i += 1
      }
      if (tok.nonEmpty) { var k = 0; while (k < dim) { pooled(k) /= tok.length; k += 1 } }
      var ss = 0.0
      pooled.foreach(x => ss += x.toDouble * x.toDouble)
      val inv = if (ss > 0) (1.0 / math.sqrt(ss)).toFloat else 0f
      pooled.map(_ * inv)
    }
}

object OnnxTextEncoder {

  /** Plumbing-test tokenizer (whitespace + FNV hash into a 30k grid) —
    * NOT a model tokenizer; see the class doc for the contract. */
  def hashTokenize(t: String): Array[Long] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map { tok =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < tok.length) { h ^= tok.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      java.lang.Math.floorMod(h, 30000L)
    }

  /** One reflective session per JVM per model path (the ONNX
    * load-once-per-executor pattern). */
  private case class Refl(modelPath: String) {
    private val cl = getClass.getClassLoader
    private val envCls = Class.forName("ai.onnxruntime.OrtEnvironment", true, cl)
    private val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor", true, cl)
    private val env = envCls.getMethod("getEnvironment").invoke(null)
    private val session =
      envCls.getMethod("createSession", classOf[String]).invoke(env, modelPath)
    private val runM = session.getClass.getMethod("run", classOf[java.util.Map[_, _]])
    private val createTensor =
      tensorCls.getMethod("createTensor", envCls, classOf[Object])

    /** Run one sequence; returns the [seqLen][width] float token matrix
      * of the first output (squeezing the batch-of-1 axis). */
    def run(ids: Array[Long]): Array[Array[Float]] = {
      val idsT = createTensor.invoke(null, env, Array(ids))
      val maskT = createTensor.invoke(null, env, Array(Array.fill(ids.length)(1L)))
      val inputs = new java.util.HashMap[String, Object]()
      inputs.put("input_ids", idsT)
      inputs.put("attention_mask", maskT)
      val result = runM.invoke(session, inputs)
      try {
        val first = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val value = first.getClass.getMethod("getValue").invoke(first)
        value.asInstanceOf[Array[Array[Array[Float]]]].head
      } finally result.getClass.getMethod("close").invoke(result)
    }
  }
}
