package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernel for content-defined gram sampling (d12's Manber scheme):
  * for every `gramChars`-character window of `text`, the first 4 bytes of
  * the window's MD5 as an unsigned 32-bit value, keeping only hashes with
  * `h % mod == 0`. Bit-identical to the composable formulation
  *
  * {{{ filter(transform(sequence(1, len-15),
  *       i -> conv(substring(md5(substring(text, i, 16)), 1, 8), 16, 10)),
  *     h -> h % 8 = 0) }}}
  *
  * which the DuckDB oracle still runs — but without its per-position
  * garbage: the SQL chain allocates a substring, a 32-char hex string, a
  * conv parse and two array passes per window, all to extract 4 digest
  * bytes. This kernel reuses one thread-local MessageDigest, feeds it the
  * window bytes directly (zero-copy for ASCII — the overwhelming case in
  * the hot path — via one getBytes of the whole string), and emits the
  * surviving longs straight into the result array. Shorter-than-one-window
  * and null inputs yield an empty/null array, matching the SQL CASE guard.
  *
  * Scale: this runs once per corpus character, so constant-factor garbage
  * here IS the d12 bottleneck (measured: row materialization and string
  * churn dominate, not MD5 arithmetic).
  */
case class SampledGramHashes(child: Expression, gramChars: Int, mod: Int)
  extends UnaryExpression with CodegenFallback {

  require(gramChars > 0 && mod > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "sampled_gram_hashes"

  override protected def withNewChildInternal(newChild: Expression): SampledGramHashes =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    val nChars = t.numChars()
    if (nChars < gramChars) return new GenericArrayData(Array.emptyLongArray)
    val md = SampledGramHashes.digest.get()
    val out = new Array[Long](nChars - gramChars + 1)
    var nOut = 0
    val bytes = t.getBytes
    val ascii = bytes.length == nChars // 1 byte per char → windows are byte slices
    var i = 0
    while (i <= nChars - gramChars) {
      md.reset()
      if (ascii) md.update(bytes, i, gramChars)
      else md.update(t.substringSQL(i + 1, gramChars).getBytes)
      val d = md.digest()
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      if (h % mod == 0) { out(nOut) = h; nOut += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

object SampledGramHashes {
  private[plans] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(text: Column, gramChars: Int, mod: Int): Column =
    GraftSqlBridge.column(
      SampledGramHashes(GraftSqlBridge.expression(text), gramChars, mod))
}

/** Fused MOSS winnowing kernel (t44): all `gramChars`-char window md5₃₂
  * hashes (the [[SampledGramHashes]] scheme at mod 1), then each run of
  * `window` consecutive hashes selects its minimum with RIGHTMOST
  * tie-break; emits the DISTINCT fingerprints fid = h·2²⁶ + pos (pos =
  * 1-based gram index) in first-occurrence order. Bit-identical to the
  * composable formulation the DuckDB oracle runs:
  *
  * {{{ array_distinct(transform(
  *       transform(sequence(1, size(hs) - w + 1),
  *         p -> array_min(transform(sequence(1, w),
  *           j -> element_at(hs, p+j-1)*2^28 + (w-j)*2^26 + (p+j-1)))),
  *       e -> shiftright(e, 28)*2^26 + (e & (2^26-1)))) }}}
  *
  * where hs = SampledGramHashes(text, k, 1) — but the HOF spelling is
  * evaluated INTERPRETED per element (4 lambda dispatches + an array
  * allocation per character) and measured 31 s at sf0.1 vs ~1 s fused.
  * The argmin runs on the same integer encoding (min h, then largest
  * position within the window), duplicates collapse via a positions-set
  * membership test (a window's selection repeats only at the same global
  * position, so (pos → h) is a function and distinct-by-pos = distinct
  * fid). Shorter-than-one-window inputs yield an empty array.
  *
  * Positions must stay below 2²⁶ (64 Mchars/doc) for the fid encoding —
  * same bound the SQL spelling carries.
  */
case class WinnowedFingerprints(child: Expression, gramChars: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(gramChars > 0 && window > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "winnowed_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    val nChars = t.numChars()
    val nGrams = nChars - gramChars + 1
    if (nGrams < window) return new GenericArrayData(Array.emptyLongArray)
    // pass 1: all window hashes (the SampledGramHashes mod-1 scheme)
    val md = SampledGramHashes.digest.get()
    val bytes = t.getBytes
    val ascii = bytes.length == nChars
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      if (ascii) md.update(bytes, i, gramChars)
      else md.update(t.substringSQL(i + 1, gramChars).getBytes)
      val d = md.digest()
      hs(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    // pass 2: per window, argmin of (h, rightmost) — dedupe by selected
    // global position (winnowing repeats are always the same position)
    val selected = new java.util.HashSet[Integer]()
    val out = new Array[Long](nGrams - window + 1)
    var nOut = 0
    var p = 0
    while (p <= nGrams - window) {
      var bestJ = 0
      var j = 1
      while (j < window) {
        // rightmost tie-break: <= moves the pick right on equal hashes
        if (hs(p + j) <= hs(p + bestJ)) bestJ = j
        j += 1
      }
      val pos = p + bestJ
      if (selected.add(pos)) {
        out(nOut) = hs(pos) * 67108864L + (pos + 1) // fid = h·2^26 + 1-based pos
        nOut += 1
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

object WinnowedFingerprints {
  def apply(text: Column, gramChars: Int, window: Int): Column =
    GraftSqlBridge.column(
      WinnowedFingerprints(GraftSqlBridge.expression(text), gramChars, window))
}
