package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ArtifactRegistry

/** Pins the two contracts the round-13 registry exists for: nested builds
  * are legal (the r12 advisory's computeIfAbsent recursion hazard), and
  * per-tag build accounting is SELF time (a parent's number excludes the
  * child build it triggered, so tags sum to total cost).
  */
class ArtifactRegistrySpec extends AnyFunSuite {

  test("nested cached builds are safe, memoized, and self-timed") {
    ArtifactRegistry.resetTimings()
    var innerBuilds = 0
    var outerBuilds = 0
    def inner: String =
      ArtifactRegistry.cached(("ars", "dep"), "spec_inner") {
        innerBuilds += 1; Thread.sleep(200); "I"
      }
    val outer =
      ArtifactRegistry.cached(("ars", "top"), "spec_outer") {
        outerBuilds += 1
        val i = inner // nested build of a DIFFERENT artifact mid-build
        Thread.sleep(20)
        i + "O"
      }
    assert(outer == "IO")
    // memoized: re-requesting either returns the cached value, no rebuild
    assert(inner == "I")
    assert(ArtifactRegistry.cached(("ars", "top"), "spec_outer")("X") == "IO")
    assert(innerBuilds == 1 && outerBuilds == 1)
    val t = ArtifactRegistry.buildSeconds
    assert(t("spec_inner") >= 0.15, s"inner self time: $t")
    // outer's self time must EXCLUDE the ~200 ms inner build it triggered
    assert(t("spec_outer") < 0.15, s"outer self time must exclude child: $t")
    ArtifactRegistry.resetTimings()
    assert(!ArtifactRegistry.buildSeconds.contains("spec_inner"))
    // values survive a timing reset (artifacts stay cached)
    assert(ArtifactRegistry.cached(("ars", "dep"), "spec_inner")("Y") == "I")
  }

  test("lost build race credits blocked wall to the parent, not the tag twice") {
    ArtifactRegistry.resetTimings()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    // thread A builds the shared dep slowly; thread B's PARENT build
    // blocks on that in-flight dep and must not charge the wait to its
    // own tag (the r13 double-count)
    val a = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String =
        ArtifactRegistry.cached(("ars", "shared"), "spec_shared") {
          gate.countDown(); Thread.sleep(300); "S"
        }
    })
    gate.await()
    Thread.sleep(30) // A is now mid-build
    val b = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String =
        ArtifactRegistry.cached(("ars", "parent"), "spec_parent") {
          ArtifactRegistry.cached(("ars", "shared"), "spec_shared")("X") + "P"
        }
    })
    assert(a.get() == "S" && b.get() == "SP")
    pool.shutdown()
    val t = ArtifactRegistry.buildSeconds
    assert(t("spec_shared") >= 0.25, s"builder's own time stands: $t")
    // parent blocked ~270 ms on the shared build; its SELF time must not
    // include that interval (tags must sum without double counting)
    assert(t("spec_parent") < 0.15, s"parent must exclude lock wait: $t")
    ArtifactRegistry.resetTimings()
  }

  test("application-end eviction drops exactly that application's keys") {
    def build(app: String, name: String): String =
      ArtifactRegistry.cached((app, name), "spec_evict") { s"$app/$name" }
    var rebuilds = 0
    assert(build("appA", "x") == "appA/x")
    assert(build("appA", "y") == "appA/y")
    assert(build("appB", "x") == "appB/x")
    ArtifactRegistry.evictApplication("appA")
    // appB untouched (cached), appA keys rebuild
    assert(ArtifactRegistry.cached(("appB", "x"), "spec_evict") {
      rebuilds += 1; "NEW"
    } == "appB/x" && rebuilds == 0)
    assert(ArtifactRegistry.cached(("appA", "x"), "spec_evict") {
      rebuilds += 1; "NEW"
    } == "NEW" && rebuilds == 1)
    ArtifactRegistry.resetTimings()
  }

  test("concurrent requests for one key build exactly once") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val tasks = (1 to 16).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String =
          ArtifactRegistry.cached(("ars", "race"), "spec_race") {
            n.incrementAndGet(); Thread.sleep(50); "R"
          }
      })
    }
    val got = tasks.map(_.get())
    pool.shutdown()
    assert(got.forall(_ == "R"))
    assert(n.get() == 1)
  }

  test("rebuildMinOf2 charges min(first, rebuild) and keeps pass-1 on a failed rebuild") {
    ArtifactRegistry.resetTimings()
    ArtifactRegistry.recordThunks = true // bench-only opt-in (see below)
    try {
    var okBuilds = 0
    var badBuilds = 0
    // first build slow (a warm-up GC landing on the tag), rebuild fast:
    // the ledger must charge ~the rebuild, but the STORE must keep the
    // pass-1 value — a replaced value would invalidate every downstream
    // cache key derived from its identity (semanticHash keys)
    def ok: String = ArtifactRegistry.cached(("arsMin2", "ok"), "spec_min2_ok") {
      okBuilds += 1; Thread.sleep(if (okBuilds == 1) 250 else 10); s"V$okBuilds"
    }
    // rebuild THROWS: the pass-1 charge must survive (never shrink the
    // ledger on an error) and the pass-1 value must still be served
    def bad: String = ArtifactRegistry.cached(("arsMin2", "bad"), "spec_min2_bad") {
      badBuilds += 1
      if (badBuilds > 1) throw new RuntimeException("flaky rebuild")
      Thread.sleep(120); "B1"
    }
    assert(ok == "V1" && bad == "B1")
    val pass1 = ArtifactRegistry.rebuildMinOf2()
    assert(okBuilds == 2 && badBuilds == 2)
    // pass-1 (cold-in-context) charges are returned for publication
    assert(pass1("spec_min2_ok") >= 0.2, s"pass-1 charge returned: $pass1")
    val t = ArtifactRegistry.buildSeconds
    assert(t("spec_min2_ok") < 0.15, s"min-of-2 must drop the slow first build: $t")
    assert(t("spec_min2_bad") >= 0.10, s"failed rebuild keeps the pass-1 charge: $t")
    assert(ok == "V1", "rebuild is a timing sample — the stored value is untouched")
    assert(okBuilds == 2)
    assert(bad == "B1", "failed rebuild must not evict the pass-1 value")
    assert(badBuilds == 2)
    } finally {
      // restore globals even when a timing assert flakes — a leaked
      // recordThunks=true or leftover arsMin2 thunks would cascade a
      // single failure into the next test
      ArtifactRegistry.recordThunks = false
      ArtifactRegistry.evictApplication("arsMin2")
      ArtifactRegistry.resetTimings()
    }
  }

  test("rebuildMinOf2 repairs an artifact whose pass-1 build failed") {
    ArtifactRegistry.resetTimings()
    ArtifactRegistry.recordThunks = true
    try {
      var builds = 0
      def v: String = ArtifactRegistry.cached(("arsRepair", "x"), "spec_repair") {
        builds += 1
        if (builds == 1) { Thread.sleep(20); throw new RuntimeException("cold failure") }
        Thread.sleep(80); "OK"
      }
      intercept[RuntimeException](v)
      ArtifactRegistry.rebuildMinOf2()
      assert(builds == 2, "rebuild repaired the missing artifact")
      // the repaired value is stored: the dependent query must NOT pay a
      // third build inside its timed window
      assert(v == "OK" && builds == 2)
      // charged the successful rebuild, not the truncated pass-1 partial
      assert(ArtifactRegistry.buildSeconds("spec_repair") >= 0.06,
        s"repaired tag carries the full rebuild charge: ${ArtifactRegistry.buildSeconds}")
    } finally {
      ArtifactRegistry.recordThunks = false
      ArtifactRegistry.evictApplication("arsRepair")
      ArtifactRegistry.resetTimings()
    }
  }

  test("repair accounting: healthy keys' pass-1 charges SUM with the repaired key's rebuild") {
    // ADVICE r16: a tag spanning a healthy key (pass-1 ~150 ms) and a
    // repaired key (rebuild ~60 ms) must charge their SUM (~210 ms), not
    // the old max(pass-1 sum, repair) = ~160 ms — the per-key pass-1
    // record replaces exactly the repaired key's truncated partial.
    ArtifactRegistry.resetTimings()
    ArtifactRegistry.recordThunks = true
    try {
      var healthy = 0
      var flaky = 0
      def h: String = ArtifactRegistry.cached(("arsRepair2", "healthy"), "spec_repair2") {
        healthy += 1; Thread.sleep(150); "H"
      }
      def f: String = ArtifactRegistry.cached(("arsRepair2", "flaky"), "spec_repair2") {
        flaky += 1
        if (flaky == 1) { Thread.sleep(10); throw new RuntimeException("cold failure") }
        Thread.sleep(60); "F"
      }
      assert(h == "H")
      intercept[RuntimeException](f)
      ArtifactRegistry.rebuildMinOf2()
      assert(healthy == 2 && flaky == 2)
      val t = ArtifactRegistry.buildSeconds
      assert(t("spec_repair2") >= 0.18,
        s"healthy pass-1 (~0.15) + rebuild (~0.06) must sum, not max(): $t")
      assert(f == "F" && flaky == 2, "repaired value stored — no third build")
    } finally {
      ArtifactRegistry.recordThunks = false
      ArtifactRegistry.evictApplication("arsRepair2")
      ArtifactRegistry.resetTimings()
    }
  }

  test("thunk recording is opt-in: without it rebuildMinOf2 leaves charges alone") {
    ArtifactRegistry.resetTimings()
    assert(!ArtifactRegistry.recordThunks,
      "recordThunks must default false — production callers must not pin build closures")
    var builds = 0
    ArtifactRegistry.cached(("arsNoRec", "x"), "spec_norec") {
      builds += 1; Thread.sleep(60); "X"
    }
    ArtifactRegistry.rebuildMinOf2()
    assert(builds == 1, "no thunk recorded, so nothing rebuilds")
    assert(ArtifactRegistry.buildSeconds("spec_norec") >= 0.04,
      "original charge survives a no-op rebuild pass")
    ArtifactRegistry.resetTimings()
  }

  test("gc-before-build hygiene is OFF unless a bench opts in") {
    // production callers (and Bench's concurrent pass) must get no gc
    // side effects from a cache read or build — the flag exists solely
    // so the ISOLATED bench pass can time builds under the same
    // System.gc() discipline as its timed queries
    assert(!ArtifactRegistry.gcBeforeBuild)
  }
}
