package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Connected components: the transitive-clustering step of near-dup
  * dedupe. Pinned against a driver-side union-find on randomized graphs. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  test("chain propagates the min label end-to-end; separate components stay apart") {
    // chain 1-2-3-4, pair 10-11, singleton edge 20-20 never appears
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (11L, 10L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("randomized graphs match driver-side union-find") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = ConnectedComponents.run(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: CC disagrees with union-find")
    }
  }

  test("empty edge frame returns an empty component frame (no NPE)") {
    // a corpus with zero near-dup pairs is the COMMON case — the clustering
    // step must degrade to "every doc is its own cluster" downstream
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = ConnectedComponents.run(edges)
    assert(got.columns.toSeq == Seq("id", "component"))
    assert(got.count() == 0L)
  }

  test("maxIters shorter than the diameter fails loudly instead of returning wrong labels") {
    val edges = (0L until 19L).map(i => (i + 1, i)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, maxIters = 3)
    }
  }

  test("long path needs diameter rounds and still converges") {
    // path 0-1-2-...-19: worst case for label propagation
    val edges = (0L until 19L).map(i => (i + 1, i)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got.size == 20 && got.values.forall(_ == 0L))
  }

  test("runStar matches run() on randomized graphs") {
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = ConnectedComponents.runStar(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: runStar disagrees with union-find")
    }
  }

  test("runStar collapses a 200-hop chain in O(log n) alternations") {
    // label propagation would need 200 rounds; the star alternation halves
    // path lengths — maxIters 12 forces the logarithmic behavior to hold
    val edges = (0L until 199L).map(i => (i + 1, i)).toDF("a", "b")
    val got = ConnectedComponents.runStar(edges, maxIters = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("runStar on an empty edge frame returns empty without failing") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.runStar(edges).count() == 0L)
  }
}
