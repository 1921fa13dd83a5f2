package graft

import org.scalatest.funsuite.AnyFunSuite

/** The floors ledger ([[Bench.FloorsJson]]) is hand-edited prose inside a
  * string literal — the one part of the BENCH_DETAIL artifact a typo can
  * corrupt without any test noticing until the round's committed artifact
  * is unparseable. Pins: (1) it IS well-formed JSON (parsed with jackson,
  * which ships on Spark's classpath — the engine itself stays JSON-lib
  * free); (2) every query-keyed entry names a DECLARED query and carries
  * the machine-readable "[baseline N.Nx]" recheck token perf_weak.py
  * gates on (s19_gate_quality exempt: no oracle by design, so no ratio
  * to baseline); (3) artifact-keyed entries name real ledger tags.
  */
class BenchFloorsSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("floors ledger is well-formed JSON with string values") {
    val node = mapper.readTree(Bench.FloorsJson)
    assert(node.isObject, "floors must be a JSON object")
    val it = node.fields()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      assert(e.getValue.isTextual, s"floors[${e.getKey}] must be a string")
      n += 1
    }
    assert(n >= 6, s"unexpectedly small floors ledger ($n entries)")
  }

  test("query-keyed floors name declared queries and carry a [baseline Nx] token") {
    val node = mapper.readTree(Bench.FloorsJson)
    val baseline = """\[baseline ([0-9.]+)x\]""".r
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      // s19_gate_quality documents a SPEC-side sweep (SelectionQueriesSpec):
      // not a declared query, no oracle, so neither check applies to it
      if (!key.startsWith("artifact:") && key != "s19_gate_quality") {
        assert(SparkEntry.queries.contains(key),
          s"floor '$key' names no declared query (renamed or removed?)")
        val m = baseline.findFirstMatchIn(e.getValue.asText())
        assert(m.isDefined, s"floor '$key' has no [baseline Nx] recheck token")
        val b = m.get.group(1).toDouble
        assert(b > 0 && b < 100, s"floor '$key' baseline $b out of sane range")
      }
    }
  }

  test("artifact-keyed floors name tags the registry actually uses") {
    // the two artifact floors document BUILD costs; their tags must match
    // the cachedFrame/cached tag strings in the source, pinned here as
    // the contract (a renamed tag orphans the floor's provenance)
    val node = mapper.readTree(Bench.FloorsJson)
    val artifactKeys = {
      val b = Seq.newBuilder[String]
      val it = node.fieldNames()
      while (it.hasNext) { val k = it.next(); if (k.startsWith("artifact:")) b += k }
      b.result()
    }
    assert(artifactKeys.toSet == Set("artifact:d05a", "artifact:triangle_core"),
      s"artifact floors drifted: $artifactKeys")
  }
}
