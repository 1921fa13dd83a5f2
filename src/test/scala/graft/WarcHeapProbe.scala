package graft

import graft.sources.WarcReader

/** Sub-JVM entry for WarcReaderSpec's capped-heap proof: stream-parse a
  * multi-hundred-MB (inflated) WARC segment from a file under -Xmx64m.
  * The r14 whole-segment-materializing parse could not survive this by
  * two orders of magnitude; the streaming [[WarcReader.RecordIterator]]
  * holds one record at a time. Prints `records=N body_bytes=M` on
  * success; an OOM kills the JVM and the spec sees the nonzero exit. */
object WarcHeapProbe {
  def main(args: Array[String]): Unit = {
    val in = new java.io.FileInputStream(args(0))
    var n = 0L
    var bytes = 0L
    val it = new WarcReader.RecordIterator(args(0), in, () => in.close())
    while (it.hasNext) {
      val r = it.next()
      n += 1
      bytes += r.body.length
    }
    println(s"records=$n body_bytes=$bytes")
  }
}
