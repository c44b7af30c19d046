package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one name per implemented operator (SURVEY.md §2) to a
  * `(session, fixtureDir) => DataFrame`; `oracleSql` carries the equivalent
  * ANSI SQL for the driver's DuckDB compare. Column names are aligned
  * between both sides (the compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.qMultiDistinct(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ SourceQueries.queries ++
      StreamingQueries.queries ++ CurationQueries.queries ++
      ProfileQueries.queries ++ TimeSeriesQueries.queries ++
      RetrievalQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ SourceQueries.oracles ++
      StreamingQueries.oracles ++ CurationQueries.oracles ++
      ProfileQueries.oracles ++ TimeSeriesQueries.oracles ++
      RetrievalQueries.oracles
}
