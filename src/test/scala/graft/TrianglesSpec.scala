package graft

import graft.operators.Triangles

/** Degree-oriented triangle counting pinned against known graphs and a
  * driver-side brute force on random graphs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val df = Triangles.stats(edges.toDF("a", "b"))
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def brute(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val verts = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = (for {
      Seq(a, b, c) <- verts.combinations(3)
      if e((a, b)) && e((b, c)) && e((a, c))
    } yield 1).size
    (verts.size.toLong, e.size.toLong, tris.toLong)
  }

  test("K4 has 4 triangles; C5 has none; orientation/duplicates normalized") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b) // both orientations + dups
    assert(stats(k4) == (4L, 6L, 4L))
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    assert(stats(c5) == (5L, 5L, 0L))
  }

  test("two triangles sharing an edge count as two; self-loops ignored") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 2L))
    assert(stats(g) == (4L, 5L, 2L))
  }

  test("perVertex: triangle counts and coefficients on a known graph") {
    // triangle {1,2,3} + pendant 4 on vertex 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L))
    val got = Triangles.perVertex(g.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((3L, 1L, 2.0 / 6.0)))
    assert(got(3L) == ((2L, 1L, 1.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))
  }

  test("perVertex totals are consistent with stats (each triangle counted thrice)") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val total = stats(edges)._3
    val perV = Triangles.perVertex(edges.toDF("a", "b"))
      .collect().map(_.getLong(2)).sum
    assert(perV == 3 * total)
  }

  test("random graphs match driver-side brute force (incl. skewed hub)") {
    val rnd = new scala.util.Random(13)
    (0 until 3).foreach { trial =>
      val n = 40
      // a hub vertex (0) touching everything makes degree orientation earn
      // its keep: naive wedge counting around the hub is O(n^2)
      val hub = (1L until n.toLong).map(v => (0L, v))
      val rest = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val edges = hub ++ rest
      assert(stats(edges) == brute(edges), s"trial $trial")
    }
  }
}
