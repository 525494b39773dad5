package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** read_sql — SQL databases as a source (ref `daft/io/_sql.py`), backed by
  * Spark's built-in JDBC source with the DuckDB driver discovered in the
  * local jar cache (probe documented in SURVEY §8.7).
  *
  * Scale shape: `readSqlPartitioned` splits the table into `numPartitions`
  * range predicates on `partitionColumn` — each executor task issues its
  * own bounded query (the same partitioning contract the reference exposes
  * via `partition_col`/`num_partitions` in read_sql), so a large table
  * streams in parallel instead of through one connection. */
object Sql {

  val DuckDbDriver = "org.duckdb.DuckDBDriver"

  /** One-shot query read (single partition — for small/dimension pulls). */
  def readSql(spark: SparkSession, url: String, query: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", DuckDbDriver)
      .option("query", query)
      .load()

  /** Range-partitioned table read: `numPartitions` parallel connections,
    * each scanning `partitionColumn` stripes of [lower, upper]. */
  def readSqlPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", DuckDbDriver)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .option("duckdb.read_only", "true")
      .load()

  /** Driver-side helper: run DDL/DML statements against a database (used
    * to stage fixtures and for CTAS-style ingestion). */
  def execute(url: String, statements: Seq[String]): Unit = {
    Class.forName(DuckDbDriver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }
}
