package graft

import graft.operators.{OnnxRuntime, OnnxTextEncoder, ToyTextEncoder}
import org.scalatest.funsuite.AnyFunSuite

/** The ONNX swap-in's CONTRACT in an environment without the runtime jar
  * (this CI is zero-egress — `ai.onnxruntime` can never resolve here):
  * the probe says no, selection falls back to the toy encoder without
  * error, and only USING a session-backed encoder fails — with a message
  * that names the fix. The happy path (real session) is exercised by the
  * same code in a deployment that ships onnxruntime*.jar; its call
  * sequence is documented against the public ONNX Runtime Java API in
  * OnnxEncoder.scala. */
class OnnxEncoderSpec extends AnyFunSuite {

  test("classpath probe is negative here and loads nothing") {
    assert(!OnnxRuntime.available(),
      "this container must not have ai.onnxruntime on the classpath")
  }

  test("bestAvailable falls back to the toy encoder, never errors") {
    val enc = OnnxRuntime.bestAvailable(Some("/nonexistent/model.onnx"), dim = 16)
    assert(enc == ToyTextEncoder(16))
    assert(OnnxRuntime.bestAvailable(None, dim = 16) == ToyTextEncoder(16))
    // fallback output is the toy contract — plumbing stays testable
    assert(enc.encodeBatch(Array("hello world")).head.length == 16)
  }

  test("session encoder constructs free, fails on USE with a clear message") {
    val enc = OnnxTextEncoder("/nonexistent/model.onnx", 16,
      OnnxTextEncoder.hashTokenize) // constructing must not touch the runtime
    val e = intercept[IllegalStateException] {
      enc.encodeBatch(Array("hello"))
    }
    assert(e.getMessage.contains("onnxruntime"),
      s"error must name the missing jar, got: ${e.getMessage}")
  }

  test("hash tokenizer is deterministic and bounded") {
    val a = OnnxTextEncoder.hashTokenize("Hello, world! Hello")
    assert(a.sameElements(OnnxTextEncoder.hashTokenize("Hello, world! Hello")))
    assert(a.forall(id => id >= 0 && id < 30000))
  }
}
