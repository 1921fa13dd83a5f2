package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared-query catalog: SURVEY §2.9 Q1–Q21 (relational
  * core + vector/RAG) plus the LLM-pipeline surface (dedupe family, ANN,
  * text analysis, multimodal). `oracleSql` carries the DuckDB-equivalent
  * formulation for every SQL-expressible entry; the others (recursive
  * chunker, LSH ANN) get the driver's rows-only check and are pinned by
  * ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the five-table revenue join (SURVEY Q6). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q06MultiJoinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.RefineQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.MiningQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.ProfileQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.SelectionQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.VectorQueries.oracle ++
      graft.queries.LlmQueries.oracle ++
      graft.queries.RefineQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.MiningQueries.oracle ++
      graft.queries.SketchQueries.oracle ++
      graft.queries.ProfileQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.OpsQueries.oracle ++
      graft.queries.SelectionQueries.oracle
}
