package graft

class ChunkGeneratorSpec extends SparkSpec {

  test("explode_chunks from SQL: lateral view over documents") {
    import spark.implicits._
    val text = (1 to 300).map(i => s"word$i").mkString(" ")
    Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
      .createOrReplaceTempView("chunk_docs")
    val rows = spark.sql(
      """SELECT doc_id, c.chunk_index, c.chunk
        |FROM chunk_docs
        |LATERAL VIEW explode_chunks(text, 100, 20) c AS chunk_index, chunk
        |ORDER BY doc_id, chunk_index""".stripMargin).collect()
    val doc1 = rows.filter(_.getLong(0) == 1L)
    assert(doc1.length > 1)
    assert(doc1.map(_.getInt(1)).toSeq == doc1.indices)
    doc1.foreach(r => assert(r.getString(2).length <= 100))
    assert(rows.filter(_.getLong(0) == 2L).map(_.getString(2)).toSeq == Seq("short"))
  }

  test("explode_chunks defaults to 800/100 and matches the Scala splitter") {
    import spark.implicits._
    import graft.operators.Chunker
    val text = ("lorem ipsum dolor sit amet " * 80).trim
    Seq(Tuple1(text)).toDF("text").createOrReplaceTempView("chunk_one")
    val sqlChunks = spark.sql(
      "SELECT c.chunk FROM chunk_one LATERAL VIEW explode_chunks(text) c AS i, chunk " +
        "ORDER BY c.i").collect().map(_.getString(0)).toSeq
    assert(sqlChunks == Chunker.recursiveSplit(text))
  }

  test("null text yields no rows") {
    import spark.implicits._
    Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .createOrReplaceTempView("chunk_null")
    val n = spark.sql(
      "SELECT c.chunk FROM chunk_null LATERAL VIEW explode_chunks(text) c AS i, chunk")
      .count()
    assert(n == 0)
  }
}
