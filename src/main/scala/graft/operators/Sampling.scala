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
}
