package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-join salting (SURVEY §2's scale toolkit; complements AQE skew-join
  * for the cases AQE can't fix, e.g. one hot key inside a single task of a
  * non-sort-merge join).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, n) derived
  * from a hash of the whole row's key context; the small side is exploded n
  * ways so every (key, salt) bucket finds its match. The join key becomes
  * (key, salt) — the hot key's rows spread over n tasks. Deterministic salt
  * (hash-based, not rand()) keeps retries and the oracle reproducible.
  */
object Salting {

  /** Deterministic salt in [0, buckets) from arbitrary context columns. */
  def salt(buckets: Int, context: Column*): Column =
    pmod(hash(context: _*), lit(buckets))

  /** Salted equi-join: `big` join `small` on `key`, with the big side's hot
    * keys spread over `buckets` tasks. Result equals the plain inner join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltContext: Column): DataFrame = {
    val salted = big.withColumn("__salt", salt(buckets, saltContext))
    val fanned = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(fanned, Seq(key, "__salt")).drop("__salt")
  }
}
