package graft.core

import org.apache.spark.sql.SparkSession

/** In-artifact load sentinel for [[graft.Bench]] (round-16 verdict item 1).
  *
  * Problem it solves: the bench contract number is a wall-clock ratio
  * measured on a shared host, and three consecutive rounds needed manual
  * forensics (per-query deltas vs prior rounds, sbt-suite timing, uniform
  * inflation analysis) to distinguish "the code got slower" from "the host
  * was loaded during the window". The artifact itself carried no evidence
  * either way, so every slow driver window became an argument.
  *
  * Fix: two fixed probes, timed at window START / MIDDLE / END and
  * published in BENCH_DETAIL next to the numbers they qualify:
  *
  *   - a single-thread CPU kernel (fixed 2^28 SplitMix64 mix rounds —
  *     pure register arithmetic, no allocation, no I/O). Host CPU
  *     contention inflates it proportionally; nothing in this repo can.
  *   - a tiny fixed Spark job (32-partition range → xxhash64 filter →
  *     noop, map-only) — the scheduler + 32-way task floor every catalog
  *     query pays, so multi-core contention and scheduler jitter show up
  *     here even when a single pinned thread would run clean.
  *
  * Each measurement point is the MEDIAN of three back-to-back runs
  * (min-of-N would hide exactly the sustained load this exists to catch;
  * a single run is hostage to one descheduling blip). The load factor vs
  * the committed quiet-host reference constants is
  *
  *   load_cpu   = median(all cpu points)   / RefCpuSec
  *   load_spark = median(all spark points) / RefSparkSec
  *   load_factor = min(load_cpu, load_spark)
  *
  * min(): the calibrated ratio divides by only the drift BOTH probes
  * agree on, so normalization can understate a loaded window but never
  * manufacture a pass — conservative in the direction that keeps the raw
  * number the harder one. Both components ship raw so a judge can apply
  * either. No clamping at 1.0: on a host FASTER than the reference the
  * factor is < 1 and the calibrated ratio reads WORSE than raw, which is
  * the honest direction there too.
  */
object Calib {

  /** Quiet-host reference constants (r16, 2026-08-16, raw readings in
    * NOTES.md). CPU: three CalibProbe sessions (session medians 0.3507 /
    * 0.3797 / 0.3547) agree with the nine in-bench window points
    * (median 0.358) within ±2 % — pinned from the probe. SPARK JOB:
    * pinned from the nine IN-BENCH points of three quiet r16 windows
    * (median 0.326), NOT from CalibProbe (0.351-0.368 there): the bench
    * JVM is far deeper-warmed than a fresh probe session and runs the
    * fixed job ~8 % faster, and a reference measured in a different
    * context than the points reads as phantom load/speed on an idle
    * host. Quietness of those windows is corroborated by the
    * context-insensitive CPU kernel reading ~1.00 against its probe
    * reference. Re-measure BOTH (probe for cpu, in-bench calib.spark_job
    * points for the job) whenever the host class changes. */
  val RefCpuSec: Double = 0.355
  val RefSparkSec: Double = 0.326

  // defeats dead-code elimination of the kernel loop; never read otherwise
  @volatile private var blackhole: Long = 0L

  private val CpuRounds: Int = 1 << 28

  /** One kernel run: fixed SplitMix64 mixing, single thread. */
  def cpuOnce(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < CpuRounds) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    blackhole = acc
    (System.nanoTime() - t0) / 1e9
  }

  /** One fixed Spark job: 32 partitions × 32M xxhash64 rows, map-only,
    * noop sink — scheduler floor + 32-way CPU throughput, deliberately
    * SHUFFLE-FREE: the bench's isolated and concurrent sessions run
    * different shuffle configs (compression/local-dir — measured 0.24 vs
    * 0.38 s on an IDLE host for a shuffling probe job), and a sentinel
    * must react to host load only, never to the session config it runs
    * under. Call [[warmSparkJob]] once per session first so the measured
    * runs never pay the one-time plan compile. */
  def sparkJobOnce(s: SparkSession): Double = {
    val t0 = System.nanoTime()
    s.range(0, 1024L * 1024 * 1024, 1, 32)
      .selectExpr("xxhash64(id) AS h")
      .filter("(h % 1000003) = 7")
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def warmSparkJob(s: SparkSession): Unit = { sparkJobOnce(s); () }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** One measurement point: median-of-3 for both probes. */
  def point(s: SparkSession): (Double, Double) = {
    val cpu = median(Seq.fill(3)(cpuOnce()))
    val sj = median(Seq.fill(3)(sparkJobOnce(s)))
    (cpu, sj)
  }

  // ---- steal-time sentinel (r18 verdict item 2) ----------------------
  // The two probes above cannot see HOST-LEVEL vCPU oversubscription: the
  // sandbox is a VM on a shared host, and when the host cannot back all
  // 32 vCPUs simultaneously, a single-thread kernel on an otherwise-idle
  // guest still gets a full physical core (probe reads FAST) while the
  // 32-way suite loses a fraction of every busy core to involuntary
  // preemption — exactly the r18 driver window's signature (load_factor
  // 0.869 "fast host", suite 35 % slower than same-code builder windows,
  // and every query faster at 8 cores than 32). The kernel accounts that
  // preemption as STEAL time in /proc/stat; sampling the cumulative
  // counters at the existing calib points makes the mechanism visible in
  // the artifact itself: a breached contract ratio on a window with high
  // steal_pct is host contention, recorded, not argued. (Measured while
  // building this: 6.0 % steal over 20 s during a bench window on this
  // host — with the single-thread CPU probe reading < 1.0 at the time.)

  /** Cumulative (stealJiffies, totalJiffies) from the aggregate `cpu`
    * line of /proc/stat. Total sums the first 8 fields (user..steal) —
    * guest/guest_nice are already included in user and would double-count.
    * (-1, -1) when unreadable (non-Linux): sentinel, never a throw. */
  def stealStat(): (Long, Long) = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    val line = try src.getLines().find(_.startsWith("cpu ")).getOrElse("")
    finally src.close()
    val f = line.trim.split("\\s+").drop(1).map(_.toLong)
    if (f.length < 8) (-1L, -1L) else (f(7), f.take(8).sum)
  } catch { case _: Throwable => (-1L, -1L) }

  /** Steal percentage of all CPU time over a segment bracketed by two
    * [[stealStat]] samples; -1 on sentinel inputs or an empty segment. */
  def stealPct(before: (Long, Long), after: (Long, Long)): Double =
    if (before._1 < 0 || after._1 < 0 || after._2 <= before._2) -1.0
    else 100.0 * (after._1 - before._1) / (after._2 - before._2)
}
