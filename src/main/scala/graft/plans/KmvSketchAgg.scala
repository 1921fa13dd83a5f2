package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native K-Minimum-Values aggregate — the bounded-heap production form of
  * the d22 relational sketch (same TypedImperativeAggregate tier as
  * [[HllSketchAgg]]).
  *
  * Identical hash lane and estimator as the d22 QUERY formulation (first
  * 40 bits of md5 → hash; estimate = (k−1)·2⁴⁰ div h₍ₖ₎, exact n below k)
  * but held as a bounded sorted set of ≤ k longs per aggregation state
  * instead of a ranked window over all distinct hashes: update inserts and
  * trims against the current k-th value, merge is set-union-then-trim
  * (commutative/associative/idempotent — KMV's union closure, so any
  * partitioning and any merge tree produce the same sketch), and the
  * shuffle ships ≤ k·8 bytes per partial state no matter how many rows a
  * partition holds — the shape that replaces the d22 window at 100 TB.
  * The d23 oracle recomputes the estimate relationally, so the hash gate
  * proves the imperative buffer path bit-equal to the relational one.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val space = 1099511627776L // 2^40

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = KmvSketchAgg.digest.get()
      d.reset()
      val dig = d.digest(v.asInstanceOf[UTF8String].getBytes)
      // first 5 md5 bytes, big-endian = conv(substr(md5, 1, 10), 16, 10)
      val h = ((dig(0) & 0xFFL) << 32) | ((dig(1) & 0xFFL) << 24) |
        ((dig(2) & 0xFFL) << 16) | ((dig(3) & 0xFFL) << 8) | (dig(4) & 0xFFL)
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  /** (k−1)·2⁴⁰ div h₍ₖ₎ in the sketch regime; exact count below k. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else ((k - 1).toLong * space) / buf.last()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val s = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) s.add(bb.getLong())
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvSketchAgg = copy(child = c.head)
}

object KmvSketchAgg {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column surface: `kmvDistinct(col)` usable in `df.agg(...)`. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    GraftSqlBridge.column(
      KmvSketchAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
