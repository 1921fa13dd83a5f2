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
}
