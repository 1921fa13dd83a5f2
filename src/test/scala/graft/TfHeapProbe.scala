package graft

import graft.sources.TfRecord

/** Sub-JVM entry for TfRecordSpec's capped-heap proof: stream-unframe and
  * proto-decode a multi-hundred-MB TFRecord shard from a file under
  * -Xmx64m. A materializing unframe holds file bytes + every payload at
  * once and cannot survive this; [[TfRecord.unframeStream]] holds one
  * record. Prints `examples=N payload_bytes=M`; an OOM kills the JVM and
  * the spec sees the nonzero exit. */
object TfHeapProbe {
  def main(args: Array[String]): Unit = {
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(args(0)), 1 << 16)
    var n = 0L
    var bytes = 0L
    val it = TfRecord.unframeStream(in)
    while (it.hasNext) {
      val payload = it.next()
      val e = TfRecord.decodeExample(payload)
      n += 1
      bytes += e.bytes_features.valuesIterator.flatten.map(_.length.toLong).sum
    }
    in.close()
    println(s"examples=$n payload_bytes=$bytes")
  }
}
