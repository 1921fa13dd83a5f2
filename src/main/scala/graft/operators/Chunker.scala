package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text chunking for RAG pipelines.
  *
  * Reference: assets/rag/process_text_chunks.py:12-13,39-60 —
  * `RecursiveCharacterTextSplitter(chunk_size=800, chunk_overlap=100,
  * separators=["\n\n","\n"," ",""])`. One document row explodes to N chunk
  * rows carrying provenance columns; we add an explicit `chunk_index`
  * because Spark has no stable implicit row index (SURVEY §7.6).
  *
  * Two implementations:
  *  - [[recursiveSplit]]: faithful recursive-separator semantics, pure Scala,
  *    applied per-row via a typed flatMap-style UDF. Embarrassingly parallel
  *    across rows — no shuffle, scales linearly.
  *  - [[fixedStrideChunks]]: pure Column expression (codegen'd), fixed
  *    800-char windows at stride (size - overlap). Used where exact
  *    separator-aware boundaries aren't required and for the SQL oracle.
  */
object Chunker {

  val DefaultChunkSize = 800
  val DefaultOverlap = 100
  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** LangChain-compatible recursive character splitting.
    *
    * Algorithm (mirrors RecursiveCharacterTextSplitter semantics):
    * pick the first separator that occurs in the text (last resort ""),
    * split on it keeping separators, greedily merge splits into chunks of at
    * most `chunkSize` chars, carrying `overlap` chars of suffix context
    * between consecutive chunks; splits longer than `chunkSize` recurse with
    * the remaining separators.
    */
  def recursiveSplit(text: String, chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap,
      separators: List[String] = DefaultSeparators): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty

    def splitKeep(t: String, sep: String): Seq[String] =
      if (sep.isEmpty) t.map(_.toString)
      else {
        // split on sep, re-attaching the separator to the preceding piece
        val parts = t.split(java.util.regex.Pattern.quote(sep), -1)
        parts.zipWithIndex.map { case (p, i) =>
          if (i < parts.length - 1) p + sep else p
        }.filter(_.nonEmpty).toSeq
      }

    def mergeSplits(splits: Seq[String]): Seq[String] = {
      val docs = scala.collection.mutable.ArrayBuffer.empty[String]
      val current = scala.collection.mutable.ArrayBuffer.empty[String]
      var total = 0
      def flush(): Unit = if (current.nonEmpty) {
        val doc = current.mkString("").trim
        if (doc.nonEmpty) docs += doc
      }
      for (s <- splits) {
        if (total + s.length > chunkSize && current.nonEmpty) {
          flush()
          // pop from the front until within overlap budget
          while (total > overlap ||
            (total + s.length > chunkSize && total > 0)) {
            total -= current.head.length
            current.remove(0)
          }
        }
        current += s
        total += s.length
      }
      flush()
      docs.toSeq
    }

    def go(t: String, seps: List[String]): Seq[String] = {
      val sep = seps.find(s => s.isEmpty || t.contains(s)).getOrElse("")
      val rest = seps.drop(seps.indexOf(sep) + 1)
      val splits = splitKeep(t, sep)
      val good = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (s <- splits) {
        if (s.length <= chunkSize) good += s
        else {
          if (good.nonEmpty) { out ++= mergeSplits(good.toSeq); good.clear() }
          if (rest.isEmpty) out += s else out ++= go(s, rest)
        }
      }
      if (good.nonEmpty) out ++= mergeSplits(good.toSeq)
      out.toSeq
    }

    go(text, separators)
  }

  private val splitUdf =
    udf((text: String, size: Int, overlap: Int) =>
      recursiveSplit(text, size, overlap))

  /** Explode a text column into chunk rows with `chunk` and `chunk_index`
    * columns; all other columns are carried through (provenance).
    */
  def explodeChunks(df: DataFrame, text: Column,
      chunkSize: Int = DefaultChunkSize, overlap: Int = DefaultOverlap): DataFrame =
    df.select(col("*"),
      posexplode(splitUdf(text, lit(chunkSize), lit(overlap))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk")

  /** Pure-Column fixed-stride chunking: windows of `chunkSize` chars every
    * (chunkSize - overlap) chars. Codegen'd — no UDF, SQL-expressible.
    * Returns array<string>; empty array for empty/null text.
    */
  def fixedStrideChunkArray(text: Column,
      chunkSize: Int = DefaultChunkSize, overlap: Int = DefaultOverlap): Column = {
    val stride = chunkSize - overlap
    val len = length(text)
    val nChunks = when(len.isNull || len === 0, lit(0))
      .when(len <= chunkSize, lit(1))
      .otherwise(ceil((len - chunkSize).cast("double") / stride).cast("int") + 1)
    when(nChunks === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => text.substr(lit(1) + i * stride, lit(chunkSize))))
  }
}
