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

  // r18 verdict item 2: the steal-time sentinel makes host vCPU
  // oversubscription — invisible to both probes — adjudicable from the
  // artifact. Pure math pinned here; the /proc/stat read is exercised by
  // every Bench run on Linux.
  test("steal pct: fraction of the segment's jiffies that were stolen") {
    // 100 jiffies of steal out of 1000 total over the segment = 10 %
    assert(Calib.stealPct((500L, 10000L), (600L, 11000L)) == 10.0)
    assert(Calib.stealPct((0L, 0L), (0L, 1000L)) == 0.0)
  }

  test("steal pct sentinels: unreadable stat or empty segment = -1") {
    assert(Calib.stealPct((-1L, -1L), (600L, 11000L)) == -1.0)
    assert(Calib.stealPct((500L, 10000L), (-1L, -1L)) == -1.0)
    assert(Calib.stealPct((500L, 10000L), (500L, 10000L)) == -1.0) // no time passed
  }

  test("stealStat on this platform: sentinel pair or plausible counters") {
    val (st, tot) = Calib.stealStat()
    assert((st == -1L && tot == -1L) || (st >= 0L && tot > 0L && st <= tot))
  }
}
