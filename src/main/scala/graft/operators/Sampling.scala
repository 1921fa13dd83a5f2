package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling/splitting.
  *
  * Training-data pipelines need REPRODUCIBLE splits: `df.sample`/`rand()`
  * change across runs, partitionings and Spark versions, which silently
  * leaks eval rows into training sets when a pipeline is re-run. Hashing a
  * stable id instead makes the assignment a pure function of the row —
  * stable across engines (the DuckDB oracle reproduces it exactly), runs,
  * and cluster layouts, and it never shuffles (narrow projection).
  */
object Sampling {

  /** Bucket 0..99 from a stable id — md5-derived so every engine agrees. */
  def hashBucket(id: Column): Column =
    Dedupe.md5Hash32(id.cast("string")) % 100

  /** Deterministic train/val/test label: first `trainPct` buckets train,
    * next `valPct` buckets val, rest test. */
  def split(id: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val b = hashBucket(id)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic p-percent sample predicate over a stable id. */
  def samplePredicate(id: Column, pct: Int): Column = hashBucket(id) < pct

  /** Fine bucket 0..9999 — for stratum-adaptive rates where 1% steps are
    * too coarse. */
  def hashBucket10k(id: Column): Column =
    Dedupe.md5Hash32(id.cast("string")) % 10000

  /** Stratum-capped sample predicate: keep each row with probability
    * ~cap/strataSize (1.0 when the stratum is smaller than the cap), via
    * the fine hash bucket against an integer-arithmetic threshold —
    * `bucket < (cap * 10000) DIV strataSize` — so the decision is a pure
    * deterministic function of (id, stratum size) that any engine
    * reproduces exactly. Balancing strata this way (cap docs per source /
    * language / domain) is how training mixes are rebalanced without a
    * shuffle: the stratum sizes are a tiny broadcast aggregate and the
    * predicate is a narrow projection. */
  def stratumCappedPredicate(id: Column, strataSize: Column, cap: Int): Column =
    hashBucket10k(id) < least(lit(10000L),
      // floor(double div) == integer DIV here: operands < 2^31 keep the
      // quotient's rounding error far below the distance to the next int
      floor(lit(cap.toLong * 10000L) / strataSize).cast("long"))

  /** Deterministic weighted-priority key: rows ranked ASCENDING by
    * hash(id)/weight, take-k = a weighted sample without replacement where
    * a row's selection odds grow with its weight (the integer-hash analog
    * of Efraimidis–Spirakis u^(1/w) priorities, with the uniform draw
    * replaced by the stable md5 hash so every engine, run and partitioning
    * agrees bit-for-bit — the priority is ONE IEEE division of exact
    * integers). Weighted mixture sampling (oversample long/high-quality
    * docs) is a training-data staple; rand()-based weighted sampling is
    * irreproducible across retries, which silently changes the corpus.
    *
    * CONTRACT: a zero weight yields +Infinity — the row sorts last, i.e.
    * is never sampled (the Efraimidis–Spirakis limit for w→0). A NULL
    * weight ALSO yields +Infinity (never sampled): `weight =!= 0` is NULL
    * for a NULL weight, `when` treats NULL as false, and the row falls into
    * the otherwise-branch — deliberately kept, since "unknown weight" and
    * "zero weight" both mean "contributes nothing to the mix"; callers who
    * want NULL to propagate (row excluded from ordering entirely) must
    * filter or coalesce upstream. A NEGATIVE weight sorts FIRST (always
    * sampled); clamp upstream if undesired. The zero case must be an
    * explicit branch: under ANSI mode (Spark 4's default) the bare division
    * raises DIVIDE_BY_ZERO, so ONE empty document would poison the whole
    * sampling job — found by AdversarialInputSpec. DuckDB's x/0.0 is
    * already +Infinity, so the oracle needs no mirror. */
  def weightedPriority(id: Column, weight: Column): Column =
    when(weight =!= 0,
      Dedupe.md5Hash32(id.cast("string")).cast("double") / weight.cast("double"))
      .otherwise(lit(Double.PositiveInfinity))
}
