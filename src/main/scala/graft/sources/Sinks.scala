package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => JFiles, Paths, StandardOpenOption}
import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable data sinks (ref the reference DataSink protocol,
  * `dataframe.py:2267-2630` write_sink + the clickhouse/turbopuffer/
  * bigtable sink family): a sink receives each partition's rows on the
  * executor, returns one WriteResult per partition, and finalizes on the
  * driver from the (bounded, one-row-per-partition) result set.
  *
  * Scale shape: partitions write in parallel straight from executors; the
  * driver only ever sees N_partitions result rows. Backpressure/batching
  * is the sink's concern (see JdbcSink's batched inserts). */
trait DataSink extends Serializable {
  def name: String
  /** Driver-side, before execution (create tables, clear dirs, …). */
  def start(schema: StructType): Unit = ()
  /** Executor-side: consume one partition, return its result. */
  def writePartition(partitionId: Int, rows: Iterator[Row], schema: StructType): WriteResult
}

case class WriteResult(partitionId: Int, rowsWritten: Long, bytesWritten: Long, detail: String)

object Sinks {

  /** write_sink: run the sink over every partition, return the per-
    * partition results as a DataFrame (the reference's write_results). */
  def writeSink(df: DataFrame, sink: DataSink): DataFrame = {
    val schema = df.schema
    sink.start(schema)
    df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      Iterator.single(sink.writePartition(pid, it, schema))
    }(Encoders.product[WriteResult]).toDF()
  }

  /** Parallel CSV part-file sink (no header; one file per partition). */
  class CsvPartSink(dir: String) extends DataSink {
    def name = "csv_parts"
    override def start(schema: StructType): Unit = {
      val p = Paths.get(dir)
      JFiles.createDirectories(p)
    }
    def writePartition(pid: Int, rows: Iterator[Row], schema: StructType): WriteResult = {
      val path = Paths.get(dir, f"part-$pid%05d.csv")
      var n = 0L
      var bytes = 0L
      val out = JFiles.newBufferedWriter(path, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      try rows.foreach { r =>
        val line = (0 until r.length).map { i =>
          val v = r.get(i)
          if (v == null) "" else "\"" + String.valueOf(v).replace("\"", "\"\"") + "\""
        }.mkString(",") + "\n"
        out.write(line)
        n += 1
        bytes += line.length
      } finally out.close()
      WriteResult(pid, n, bytes, path.toString)
    }
  }

  /** JDBC sink: per-partition connection, batched prepared inserts —
    * the clickhouse/bigtable-style sink shape, pointed at any JDBC url
    * (DuckDB offline). `writeMode` carries the reference write_sql modes
    * (dataframe.py:911): "overwrite" drops + recreates, "append" creates
    * only if absent, "fail" errors when the table already exists. */
  class JdbcSink(url: String, table: String, batchSize: Int = 500,
      writeMode: String = "overwrite") extends DataSink {
    def name = s"jdbc:$table"
    override def start(schema: StructType): Unit = {
      val cols = schema.fields.map { f =>
        val t = f.dataType.typeName match {
          case "long" | "integer" | "short" | "byte" => "BIGINT"
          case "double" | "float" => "DOUBLE"
          case "boolean" => "BOOLEAN"
          case _ => "VARCHAR"
        }
        s""""${f.name}" $t"""
      }.mkString(", ")
      writeMode match {
        case "overwrite" =>
          Sql.execute(url, Seq(
            s"""DROP TABLE IF EXISTS "$table"""",
            s"""CREATE TABLE "$table" ($cols)"""))
        case "append" =>
          Sql.execute(url, Seq(
            s"""CREATE TABLE IF NOT EXISTS "$table" ($cols)"""))
        case "fail" =>
          if (Sql.tableExists(url, table))
            throw new IllegalStateException(
              s"write_sql(mode=fail): table $table already exists")
          Sql.execute(url, Seq(s"""CREATE TABLE "$table" ($cols)"""))
        case other =>
          throw new IllegalArgumentException(
            s"write_sql: unknown write_mode '$other' (append|overwrite|fail)")
      }
    }
    def writePartition(pid: Int, rows: Iterator[Row], schema: StructType): WriteResult = {
      Class.forName(Sql.DuckDbDriver)
      val conn = DriverManager.getConnection(url)
      var n = 0L
      var bytes = 0L
      try {
        val ph = schema.fields.map(_ => "?").mkString(", ")
        // name the columns: appending to a pre-existing table with a
        // different column order must route values by NAME (a positional
        // insert would silently swap coercible columns)
        val colList = schema.fields.map(f => s""""${f.name}"""").mkString(", ")
        val st = conn.prepareStatement(
          s"""INSERT INTO "$table" ($colList) VALUES ($ph)""")
        var inBatch = 0
        rows.foreach { r =>
          var i = 0
          while (i < r.length) {
            val v = r.get(i)
            st.setObject(i + 1, v)
            bytes += (v match {
              case null => 0L
              case a: Array[Byte] => a.length.toLong
              case s: String =>
                s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
              case other => String.valueOf(other).length.toLong
            })
            i += 1
          }
          st.addBatch()
          inBatch += 1
          n += 1
          if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) st.executeBatch()
        st.close()
      } finally conn.close()
      WriteResult(pid, n, bytes, url)
    }
  }
}
