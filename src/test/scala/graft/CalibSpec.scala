package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Calib

/** Pins the load sentinel's pure parts (r16): the median rule (the
  * sentinel deliberately uses median, not min — min would hide the
  * sustained load it exists to catch) and the CPU kernel's fixed-work
  * contract. The Spark probe and the BENCH_DETAIL fields are exercised
  * end-to-end by every Bench run. */
class CalibSpec extends AnyFunSuite {

  test("median: odd, even, empty, and unsorted inputs") {
    assert(Calib.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Calib.median(Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
    assert(Calib.median(Seq(7.5)) == 7.5)
    assert(Calib.median(Nil) == -1.0)
  }

  test("cpu kernel: fixed work, plausible duration, not eliminated") {
    // a DCE'd loop would read ~0; a descheduled run can be slow but a
    // healthy one is well under a minute — the bound only guards against
    // the kernel degenerating into a no-op or an accidental 10x rescale
    val t = Calib.cpuOnce()
    assert(t > 0.01 && t < 60.0, s"kernel wall implausible: $t")
  }

  test("reference constants are pinned and positive") {
    assert(Calib.RefCpuSec > 0 && Calib.RefSparkSec > 0)
  }
}
