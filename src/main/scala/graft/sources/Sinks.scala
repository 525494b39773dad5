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
  /** Executor-side: consume one partition, return its result. Must be
    * IDEMPOTENT under task retry: on a real cluster a task attempt can die
    * after partially writing and be re-run, so either write to an
    * attempt-replaceable staging area (see JdbcSink) or make the write a
    * single atomic transaction. */
  def writePartition(partitionId: Int, rows: Iterator[Row], schema: StructType): WriteResult
  /** Driver-side, after every partition SUCCEEDED exactly once (Spark
    * reports one result per partition from the winning attempt). Commit
    * staged work atomically here. */
  def finish(results: Seq[WriteResult]): Unit = ()
}

/** One partition's write outcome. `bytesWritten` is the SERIALIZED-TEXT
  * size: exact UTF-8 bytes for strings, raw length for binary, and the
  * rendered decimal text for numerics/timestamps (an estimate of the wire
  * payload, not of the backend's storage encoding — ADVICE r11). */
case class WriteResult(partitionId: Int, rowsWritten: Long, bytesWritten: Long, detail: String)

object Sinks {

  /** write_sink: run the sink over every partition, return the per-
    * partition results as a DataFrame (the reference's write_results).
    *
    * BLOCKING, like the reference: the write executes here, `finish` runs
    * once on the driver with the winning attempts' results (the two-phase
    * commit point for staged sinks), and the returned frame is a bounded
    * local one-row-per-partition result set — re-evaluating it can never
    * re-run the writes. */
  def writeSink(df: DataFrame, sink: DataSink): DataFrame = {
    val schema = df.schema
    sink.start(schema)
    val results = df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      Iterator.single(sink.writePartition(pid, it, schema))
    }(Encoders.product[WriteResult]).collect().toSeq
    sink.finish(results)
    val spark = df.sparkSession
    spark.createDataFrame(results)
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
    * only if absent, "fail" errors when the table already exists.
    *
    * EXACTLY-ONCE under task retry (the cluster posture — a task attempt
    * can die after some batches committed and be re-run): each ATTEMPT
    * writes to its own staging table keyed by (partition, taskAttemptId) —
    * not partition alone, because a zombie or speculative attempt can still
    * be RUNNING concurrently with the winning attempt, and a shared
    * per-partition table would interleave two attempts' inserts (ADVICE
    * r12). `finish` promotes exactly the winning attempts' tables (their
    * names ride back in WriteResult.detail) in ONE driver-side transaction
    * after all partitions succeeded, then drops any loser-attempt leftovers.
    * No partial or duplicated rows are ever visible in the target table. */
  class JdbcSink(url: String, table: String, batchSize: Int = 500,
      writeMode: String = "overwrite") extends DataSink {
    def name = s"jdbc:$table"
    // driver-only (start/finish both run on the driver; not serialized out)
    @transient private var driverSchema: StructType = _
    private def stagePrefix = s"${table}__graft_stage_"
    private def stage(pid: Int, attempt: Long) = s"$stagePrefix${pid}_a$attempt"
    /** Attempt-unique staging key: Spark task attempt ids are unique per
      * application, so two LIVE attempts of one partition (zombie or
      * speculative vs winner) can never share a staging table. -1 =
      * driver-side invocation (unit tests); overridable for fence tests. */
    protected def currentAttemptId(): Long =
      Option(org.apache.spark.TaskContext.get()).map(_.taskAttemptId()).getOrElse(-1L)
    private def colsDdl(schema: StructType): String =
      schema.fields.map { f =>
        val t = f.dataType.typeName match {
          case "long" | "integer" | "short" | "byte" => "BIGINT"
          case "double" | "float" => "DOUBLE"
          case "boolean" => "BOOLEAN"
          case _ => "VARCHAR"
        }
        s""""${f.name}" $t"""
      }.mkString(", ")
    override def start(schema: StructType): Unit = {
      driverSchema = schema
      val cols = colsDdl(schema)
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
      val stg = stage(pid, currentAttemptId())
      try {
        val st0 = conn.createStatement()
        // CREATE OR REPLACE still guards a same-attempt restart (it cannot
        // happen on a cluster, but keeps driver-side re-invocation clean)
        st0.execute(s"""CREATE OR REPLACE TABLE "$stg" (${colsDdl(schema)})""")
        st0.close()
        val ph = schema.fields.map(_ => "?").mkString(", ")
        // name the columns: appending to a pre-existing table with a
        // different column order must route values by NAME (a positional
        // insert would silently swap coercible columns)
        val colList = schema.fields.map(f => s""""${f.name}"""").mkString(", ")
        val st = conn.prepareStatement(
          s"""INSERT INTO "$stg" ($colList) VALUES ($ph)""")
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
      WriteResult(pid, n, bytes, stg)
    }
    override def finish(results: Seq[WriteResult]): Unit = {
      Class.forName(Sql.DuckDbDriver)
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        // one transaction: every staging table lands in the target — or
        // none does. `detail` carries the staging table the WINNING attempt
        // wrote; routing by column name tolerates target column order.
        val colList =
          driverSchema.fields.map(f => s""""${f.name}"""").mkString(", ")
        results.sortBy(_.partitionId).foreach { r =>
          st.execute(
            s"""INSERT INTO "$table" ($colList)
               |SELECT $colList FROM "${r.detail}"""".stripMargin)
          st.execute(s"""DROP TABLE "${r.detail}"""")
        }
        // fence cleanup: loser/zombie attempts left their own staging
        // tables behind — enumerate and drop them (never promoted)
        val winners = results.map(_.detail).toSet
        val rs = st.executeQuery(
          s"""SELECT table_name FROM information_schema.tables
             |WHERE table_name LIKE '$stagePrefix%'""".stripMargin)
        val leftovers = scala.collection.mutable.Buffer[String]()
        while (rs.next()) {
          val t = rs.getString(1)
          if (!winners.contains(t)) leftovers += t
        }
        leftovers.foreach(t => st.execute(s"""DROP TABLE "$t""""))
        st.close()
        conn.commit()
      } finally conn.close()
    }
  }
}
