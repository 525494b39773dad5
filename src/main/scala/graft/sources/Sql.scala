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

  /** Driver-side table-existence probe (information_schema is part of the
    * SQL standard, so this is portable across JDBC backends). */
  def tableExists(url: String, table: String): Boolean = {
    Class.forName(DuckDbDriver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        "SELECT count(*) FROM information_schema.tables WHERE table_name = ?")
      st.setString(1, table)
      val rs = st.executeQuery()
      rs.next() && rs.getLong(1) > 0
    } finally conn.close()
  }

  /** write_sql (ref `dataframe.py:911`): write the frame to a SQL table
    * through the executor-parallel [[Sinks.JdbcSink]] and return the
    * reference's one-row metrics frame (`total_written_rows`,
    * `total_written_bytes`). Non-primitive columns (arrays/structs/maps)
    * are normalized per `nonPrimitiveHandling` before reaching JDBC, like
    * the reference: "str" serializes to JSON text (the default), "bytes"
    * writes the UTF-8 bytes of that text, "error" rejects them.
    *
    * Scale shape: partitions insert in parallel from executors with
    * batched prepared statements; the driver sees one result row per
    * partition. The blocking materialization before returning metrics
    * mirrors the reference's write-then-metrics contract. */
  def writeSql(df: DataFrame, url: String, table: String,
      writeMode: String = "append",
      nonPrimitiveHandling: String = "str",
      batchSize: Int = 500): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, to_json, encode}
    import org.apache.spark.sql.types._
    def primitive(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | BooleanType | BinaryType |
           DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val normalized = df.select(df.schema.fields.map { f =>
      if (primitive(f.dataType)) col(f.name)
      else nonPrimitiveHandling match {
        case "str"   => to_json(col(f.name)).as(f.name)
        case "bytes" => encode(to_json(col(f.name)), "UTF-8").as(f.name)
        case "error" => throw new IllegalArgumentException(
          s"write_sql(non_primitive_handling=error): column ${f.name} has " +
            s"non-primitive type ${f.dataType.simpleString}")
        case other => throw new IllegalArgumentException(
          s"write_sql: unknown non_primitive_handling '$other' (str|bytes|error)")
      }
    }.toSeq: _*)
    val results = Sinks.writeSink(normalized,
      new Sinks.JdbcSink(url, table, batchSize, writeMode))
    // Materialize the write NOW: the returned metrics frame is a literal,
    // so re-evaluating it can never re-run the inserts (append mode would
    // otherwise double-write on a second action).
    val m = results.agg(
      sum("rowsWritten").cast("long"), sum("bytesWritten").cast("long")).head()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((if (m.isNullAt(0)) 0L else m.getLong(0),
         if (m.isNullAt(1)) 0L else m.getLong(1)))
      .toDF("total_written_rows", "total_written_bytes")
  }
}
