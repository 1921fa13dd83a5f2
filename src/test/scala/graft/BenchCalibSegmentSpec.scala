package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins WHICH load-sentinel segment feeds which calibrated contract ratio
  * (r17 verdict item 1) and the sentinel semantics of the segment
  * calibration itself. The mapping matters: `ratio_aggregate` and
  * `ratio_aggregate_with_builds` are built from the per-query isolated
  * min-of-2 timings plus the pass-1 build ledger — all measured between
  * the start and middle calib points, i.e. in the ISOLATED segment — so a
  * loaded isolated segment must normalize THOSE ratios by its own factor,
  * not by the global min-of-medians (which under-corrects exactly when
  * load is confined to one segment: the r17 driver window read global
  * 1.075 while the isolated segment read 1.274, and the primary metric
  * breached raw with the explanation stranded in a side-channel field).
  */
class BenchCalibSegmentSpec extends AnyFunSuite {

  test("both aggregate contract ratios calibrate by the isolated segment") {
    assert(Bench.RatioSegments == Map(
      "ratio_aggregate_seg_calibrated" -> "isolated",
      "ratio_with_builds_seg_calibrated" -> "isolated"))
  }

  test("segment calibration divides by the segment factor") {
    assert(math.abs(Bench.segCalibrated(2.008, 1.274) - 1.576) < 0.001)
    // a faster-than-reference segment (factor < 1) makes the calibrated
    // number WORSE than raw — honest in both directions, like Calib
    assert(Bench.segCalibrated(1.5, 0.75) == 2.0)
  }

  test("sentinel semantics: missing inputs propagate -1, never a pass") {
    assert(Bench.segCalibrated(-1.0, 1.2) == -1.0) // no ratio measured
    assert(Bench.segCalibrated(1.8, 0.0) == -1.0)  // degenerate factor
    assert(Bench.segCalibrated(1.8, -1.0) == -1.0) // no segment factor
  }

  // r18 verdict item 5: the driver's low-core scaling pass overwrote the
  // 32-core detail (fixed path), and floor rechecks on the working tree
  // then adjudicated 32-core baselines against an 8-core window. The
  // detail sidecar path is now core-count-aware: 32 keeps the historical
  // committed-artifact name, anything else gets a suffixed file so both
  // driver windows survive on disk.
  test("detail sidecar path: 32-core keeps the name of record, others suffix") {
    assert(Bench.detailPath("32") == "BENCH_DETAIL.json")
    assert(Bench.detailPath("8") == "BENCH_DETAIL_c8.json")
    assert(Bench.detailPath("16") == "BENCH_DETAIL_c16.json")
  }
}
