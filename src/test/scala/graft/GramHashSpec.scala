package graft

import graft.plans.SampledGramHashes
import org.apache.spark.sql.functions._

class GramHashSpec extends SparkSpec {

  /** The composable SQL chain the fused kernel replaces (and the d12
    * oracle still runs in DuckDB) — the ground truth here. */
  private def sqlChain(gram: Int, mod: Int) = expr(
    s"""CASE WHEN char_length(text) >= $gram
       |  THEN filter(
       |    transform(sequence(1, char_length(text) - ${gram - 1}),
       |      i -> CAST(conv(substring(md5(substring(text, i, $gram)), 1, 8), 16, 10)
       |           AS BIGINT)),
       |    h -> h % $mod = 0)
       |  ELSE array() END""".stripMargin)

  test("fused kernel equals the SQL md5 chain on random, unicode and edge strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("abcdefgh ", "aaaaab", "日本語テキストと English mixed ",
      "ключ значение ")
    val texts = Seq("", "short", "exactly sixteen!", "x" * 15, "x" * 16, "y" * 200) ++
      (1 to 60).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        (1 to (rnd.nextInt(300) + 1)).map(_ => a(rnd.nextInt(a.length))).mkString
      }
    val df = texts.toDF("text")
    val rows = df.select(
      SampledGramHashes(col("text"), 16, 8).as("fused"),
      sqlChain(16, 8).as("chain")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"kernel diverges from SQL chain")
    }
    // null text: kernel yields null (SQL chain yields []); both explode to
    // zero rows, which is the only way d12 consumes the array
    val nullOut = Seq(Option.empty[String]).toDF("text")
      .select(explode(SampledGramHashes(col("text"), 16, 8))).count()
    assert(nullOut == 0)
  }
}
