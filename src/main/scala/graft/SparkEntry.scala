package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator query exposed by the graft engine; the driver
  * verifies each against its DuckDB oracle SQL at sf0.01. */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    graft.queries.Tpch.queries ++
    graft.queries.Tpch2.queries ++
    graft.queries.Tpcds.queries ++
    graft.queries.ClickBench.queries ++
    graft.queries.Relational.queries ++
    graft.queries.Aggregates.queries ++
    graft.queries.Windows.queries ++
    graft.queries.Functions.queries ++
    graft.queries.AsofQueries.queries ++
    graft.queries.Pipeline.queries ++
    graft.queries.Io.queries ++
    graft.queries.DatasetsQ.queries ++
    graft.queries.Advanced.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Tpch.oracle ++
    graft.queries.Tpch2.oracle ++
    graft.queries.Tpcds.oracle ++
    graft.queries.ClickBench.oracle ++
    graft.queries.Relational.oracle ++
    graft.queries.Aggregates.oracle ++
    graft.queries.Windows.oracle ++
    graft.queries.Functions.oracle ++
    graft.queries.AsofQueries.oracle ++
    graft.queries.Pipeline.oracle ++
    graft.queries.Io.oracle ++
    graft.queries.DatasetsQ.oracle ++
    graft.queries.Advanced.oracle
}
