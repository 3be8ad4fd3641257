package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by module; every entry has a DuckDB oracle unless
  * the operator is not SQL-expressible (those get rows-only checks and
  * ScalaTest coverage instead).
  */
object SparkEntry {

  /** Flagship: the end-to-end triple set (extract → link → canonicalize
    * → CC → triples) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_triples")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimQueries.queries ++
      graft.queries.BreadthQueries.queries ++
      graft.queries.GraphBreadthQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.SimQueries.oracleSql ++
      graft.queries.BreadthQueries.oracleSql ++
      graft.queries.GraphBreadthQueries.oracleSql
}
