package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Vector similarity search.
  *
  * Reference: FAISS IndexFlatL2 top-k (resources/embedding/rag_search.py:29-35)
  * and LanceDB cosine search (assets/rag/test_lancedb_search.py:44-50).
  *
  * Scale design: exact search against one query is a scan + TakeOrdered (no
  * shuffle of the corpus). Batched queries broadcast the (small) query set
  * and rank per query with a window over the joined scores — the corpus side
  * never re-partitions. The approximate path buckets vectors by
  * random-hyperplane signs (LSH) so candidate generation is an equi-join on
  * the bucket key; at 100 TB that's the only join shape that survives.
  */
object Similarity {

  /** Exact top-k by L2 distance against a broadcast single-row query
    * DataFrame `query(qv)`.
    */
  def topKByL2(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(id.as("id"), l2Distance(vec, col("qv")).as("dist"))
      .orderBy(col("dist"), col("id"))
      .limit(k)

  /** Exact top-k by cosine similarity (descending) against a broadcast
    * single-row query DataFrame `query(qv)`.
    */
  def topKByCosine(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(id.as("id"), cosineSimilarity(vec, col("qv")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)

  /** Batched exact k-NN: for every row of `queries(qid, qv)` (small,
    * broadcast), the top-k corpus neighbors by cosine, self-match excluded.
    * Returns (qid, id, score, rank).
    */
  def batchTopKByCosine(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col("qid"), id.as("id"), cosineSimilarity(vec, col("qv")).as("score"))
      .filter(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("score"), col("rank"))
  }

  /** Sign-bucket LSH key: the concatenated signs of `nPlanes` fixed random
    * hyperplane projections. Deterministic (seeded) plane generation; the
    * projection is the same sequential-fold dot product as the exact path.
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = planes.map { p =>
      val planeCol = array(p.map(x => lit(x)): _*)
      when(dot(vec, planeCol) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Approximate k-NN via IVF (inverted-file) partitioning — the LanceDB
    * index shape (create_lancedb_index.py:143-148: IVF, num_partitions).
    *
    * Build: seeded KMeans over (a sample of) the corpus → every vector is
    * assigned to its nearest centroid's partition. Search: each query probes
    * only the `nProbe` nearest partitions — an equi-join on the partition
    * id instead of a cross join. Recall/latency trades via nProbe exactly
    * as in FAISS/LanceDB IVF.
    *
    * Scale: assignment is a narrow map (centroids broadcast); candidate
    * generation shuffles on the partition id — bounded fan-in per query.
    */
  def ivfTopKByCosine(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, k: Int, nPartitions: Int = 16, nProbe: Int = 3,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = corpus.select(id.as("id"), vec.cast("array<float>").as("v"))
    val feat = base.withColumn("features",
      array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans().setK(nPartitions).setSeed(seed).setMaxIter(10)
      .fit(feat)
    val assigned = model.transform(feat)
      .select(col("id"), col("v"), col("prediction").as("part"))
    // query-side: nProbe nearest centroids by cosine
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val centDf = queries.sparkSession.createDataFrame(centroids)
      .toDF("part", "cvec")
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("part"))
    val probes = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qv"), col("part"),
        cosineSimilarity(col("qv"), col("cvec")).as("cscore"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qv"), col("part"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    assigned.join(broadcast(probes), Seq("part"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), cosineSimilarity(col("v"), col("qv")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate k-NN via multi-table sign-LSH (OR-amplification): `nTables`
    * independent hash tables, each bucketing on `nPlanes` hyperplane signs.
    * A candidate surfaces if it collides with the query in ANY table —
    * recall ≈ 1-(1-p^nPlanes)^nTables vs single-table p^nPlanes. Candidate
    * generation stays an equi-join on (table, bucket) — the only join shape
    * that survives 100 TB; the corpus fans out ×nTables (small constant).
    */
  def approxTopKByCosine(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, k: Int, dim: Int, nPlanes: Int = 8,
      nTables: Int = 4): DataFrame = {
    def tables(v: Column): Column = array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"), lshBucket(v, dim, nPlanes, seed = 42L + t).as("bucket"))
    }: _*)
    val bucketed = corpus
      .select(id.as("id"), vec.as("v"), explode(tables(vec)).as("tb"))
      .select(col("id"), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val qb = queries
      .select(col("qid"), col("qv"), explode(tables(col("qv"))).as("tb"))
      .select(col("qid"), col("qv"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    bucketed.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), cosineSimilarity(col("v"), col("qv")).as("score"))
      .distinct() // a pair may collide in several tables
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
