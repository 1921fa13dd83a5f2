package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed DuckDB denominator (ORACLE_TIMES.json) is maintained by
  * hand on oracle changes — the bench silently drops any query missing
  * from it (the `both` filter), so a forgotten entry quietly shrinks the
  * ratio's coverage instead of failing. Pins: every declared oracle has a
  * committed non-negative time, every timed key is a declared query (no
  * stale entries after a rename), and the _n_queries meta field agrees.
  * Skips cleanly if the file is absent (fresh checkout mid-edit). */
class OracleTimesSpec extends AnyFunSuite {

  private val path = java.nio.file.Paths.get("ORACLE_TIMES.json")

  test("every declared oracle has a committed denominator and vice versa") {
    assume(java.nio.file.Files.exists(path), "ORACLE_TIMES.json not present")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(path))
    val timed = scala.collection.mutable.Map[String, Double]()
    var nMeta = -1L
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey == "_n_queries") nMeta = e.getValue.asLong()
      else if (!e.getKey.startsWith("_")) timed(e.getKey) = e.getValue.asDouble()
    }
    val declared = SparkEntry.oracleSql.keySet
    val missing = declared -- timed.keySet
    assert(missing.isEmpty,
      s"oracles with NO committed time (bench drops them from the ratio): $missing — " +
        "time them per the NOTES discipline (min-of-2, quiet host) and merge")
    val stale = timed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"timed keys naming no declared query (renamed?): $stale")
    val negatives = timed.collect { case (k, v) if v < 0 => k }
    assert(negatives.isEmpty, s"negative (errored) oracle times committed: $negatives")
    assert(nMeta == timed.size,
      s"_n_queries ($nMeta) disagrees with the entry count (${timed.size})")
  }

  test("perf_weak's STREAMING exclusion list names declared queries") {
    // the python tool's hand-maintained set: a renamed streaming query
    // would silently stop being excluded (and start counting as weak)
    val py = java.nio.file.Paths.get("tools/perf_weak.py")
    assume(java.nio.file.Files.exists(py), "tools/perf_weak.py not present")
    val txt = java.nio.file.Files.readString(py)
    val block = txt.substring(txt.indexOf("STREAMING = {"),
      txt.indexOf("}", txt.indexOf("STREAMING = {")))
    val names = "\"([a-z0-9_]+)\"".r.findAllMatchIn(block).map(_.group(1)).toSeq
    assert(names.nonEmpty, "no names parsed from the STREAMING set")
    val stale = names.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"STREAMING excludes non-existent queries: $stale")
  }
}
