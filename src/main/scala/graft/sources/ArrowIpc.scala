package graft.sources

import java.io.File

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ArrowColumnVector
import org.apache.spark.unsafe.types.UTF8String

/** Arrow IPC file (Feather V2) export/import — the training-loader
  * interchange surface (ref `DataFrame.to_arrow` /
  * `to_arrow_iter` `daft/dataframe/dataframe.py:2880,2604`, and the
  * torch/ray loader story at :5905/:6011: those frameworks are absent
  * offline, but every one of them INGESTS Arrow IPC, so the portable
  * on-disk handoff is this format).
  *
  * Layout: one `part-NNNNN.arrow` FILE-format (seekable, random-access
  * batch index) file per Spark partition, record batches of `batchSize`
  * rows — a loader shards by file and streams batch-at-a-time, never
  * materializing a partition.
  *
  * Spark's own arrow bridge (`Bridge.toArrowSchema` / `arrowRowWriter`)
  * does schema mapping and row->vector writing, so every Spark type
  * Spark itself can ship to PyArrow round-trips here identically
  * (timestamps are µs UTC, strings/binary var-width, decimals 128-bit).
  * Executor-side only: no driver funnel in either direction.
  */
object ArrowIpc {

  // best-effort resource reclamation for iterators abandoned outside a
  // Spark task (driver-side/test use); one daemon thread JVM-wide
  private lazy val cleaner = java.lang.ref.Cleaner.create()

  /** Write `df` under `dir` as one .arrow file per partition; returns the
    * row count written (an action). */
  def write(df: DataFrame, dir: String, batchSize: Int = 4096): Long = {
    require(batchSize > 0, "batchSize must be positive")
    val out = new File(dir)
    out.mkdirs()
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val arrowSchema = Bridge.toArrowSchema(schema, tz)
      val allocator = new RootAllocator(Long.MaxValue)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val writer = Bridge.arrowRowWriter(root)
      val file = new File(out, f"part-$pid%05d.arrow")
      val ch = new java.io.FileOutputStream(file).getChannel
      val fw = new ArrowFileWriter(root, null, ch)
      var n = 0L
      try {
        fw.start()
        var inBatch = 0
        def flush(): Unit = if (inBatch > 0) {
          writer.finish(); fw.writeBatch(); writer.reset(); inBatch = 0
        }
        while (rows.hasNext) {
          writer.write(rows.next())
          n += 1; inBatch += 1
          if (inBatch >= batchSize) flush()
        }
        flush()
        fw.end()
      } finally {
        fw.close(); ch.close(); root.close(); allocator.close()
      }
      Iterator.single(n)
    }
    counts.sum().toLong
  }

  /** Read a directory of .arrow files (or a single file) as a DataFrame —
    * one Spark task per file, batch-at-a-time through Spark's own
    * ArrowColumnVector accessors (values copied out before the batch is
    * released). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listArrowFiles(path)
    require(files.nonEmpty, s"no .arrow files under $path")
    // schema from the first file's footer (driver-side metadata-only read)
    val schema = {
      val ch = new java.io.FileInputStream(files.head).getChannel
      val allocator = new RootAllocator(Long.MaxValue)
      val r = new ArrowFileReader(ch, allocator)
      try Bridge.fromArrowSchema(r.getVectorSchemaRoot.getSchema)
      finally { r.close(); ch.close(); allocator.close() }
    }
    val paths = files.map(_.getAbsolutePath)
    val rdd = spark.sparkContext
      .parallelize(paths, paths.length)
      .flatMap(p => readFile(p, schema))
    Bridge.internalCreateDataFrame(spark, rdd, schema)
  }

  private def listArrowFiles(path: String): Seq[File] = {
    val f = new File(path)
    if (f.isFile) Seq(f)
    else if (f.isDirectory)
      f.listFiles.filter(x => x.isFile && x.getName.endsWith(".arrow"))
        .sortBy(_.getName).toSeq
    else Seq.empty
  }

  /** Copy one value out of an arrow vector as its catalyst
    * representation. Buffers are owned by the batch — strings/binary are
    * copied so rows outlive `loadNextBatch`. */
  private def catalystValue(v: ArrowColumnVector, i: Int, dt: DataType): Any =
    if (v.isNullAt(i)) null
    else dt match {
      case BooleanType => v.getBoolean(i)
      case ByteType => v.getByte(i)
      case ShortType => v.getShort(i)
      case IntegerType | DateType => v.getInt(i)
      case LongType | TimestampType | TimestampNTZType |
          _: DayTimeIntervalType => v.getLong(i)
      case FloatType => v.getFloat(i)
      case DoubleType => v.getDouble(i)
      case StringType => UTF8String.fromBytes(v.getUTF8String(i).getBytes)
      case BinaryType => v.getBinary(i)
      case d: DecimalType => v.getDecimal(i, d.precision, d.scale)
      case ArrayType(et, _) =>
        val a = v.getArray(i)
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          (0 until a.numElements()).map(j => copyFromSpecialized(a, j, et)).toArray)
      case other =>
        throw new UnsupportedOperationException(
          s"arrow read: unsupported type $other (nested structs/maps not implemented)")
    }

  private def copyFromSpecialized(
      a: org.apache.spark.sql.catalyst.util.ArrayData, j: Int, et: DataType): Any =
    if (a.isNullAt(j)) null
    else et match {
      case BooleanType => a.getBoolean(j)
      case ByteType => a.getByte(j)
      case ShortType => a.getShort(j)
      case IntegerType | DateType => a.getInt(j)
      case LongType | TimestampType | TimestampNTZType => a.getLong(j)
      case FloatType => a.getFloat(j)
      case DoubleType => a.getDouble(j)
      case StringType => UTF8String.fromBytes(a.getUTF8String(j).getBytes)
      case BinaryType => a.getBinary(j)
      case other =>
        throw new UnsupportedOperationException(s"arrow read: list<$other> not implemented")
    }

  /** Lazy batch-at-a-time iterator over one .arrow file: only the current
    * record batch is resident (the documented loader contract — a file can
    * be far larger than executor memory). Values are copied out of the
    * arrow buffers as each row is produced, so rows outlive
    * `loadNextBatch`. Resources close at exhaustion, and a
    * task-completion listener covers early termination (limit, failure). */
  private def readFile(path: String, schema: StructType): Iterator[InternalRow] = {
    val ch = new java.io.FileInputStream(path).getChannel
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(ch, allocator)
    val root = reader.getVectorSchemaRoot
    val dts = schema.fields.map(_.dataType)

    var closed = false
    def closeAll(): Unit = if (!closed) {
      closed = true
      reader.close(); ch.close(); allocator.close()
    }

    val it = new Iterator[InternalRow] {
      private var cols: Array[ArrowColumnVector] = _
      private var rowsInBatch = 0
      private var i = 0

      private def advance(): Boolean = {
        if (closed) return false
        var loaded = false
        while (!loaded && reader.loadNextBatch()) {
          rowsInBatch = root.getRowCount
          if (rowsInBatch > 0) {
            cols = root.getFieldVectors.toArray.map(v =>
              new ArrowColumnVector(v.asInstanceOf[org.apache.arrow.vector.ValueVector]))
            i = 0
            loaded = true
          }
        }
        if (!loaded) closeAll()
        loaded
      }

      override def hasNext: Boolean = i < rowsInBatch || advance()

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("exhausted arrow file")
        val vals = new Array[Any](dts.length)
        var c = 0
        while (c < dts.length) { vals(c) = catalystValue(cols(c), i, dts(c)); c += 1 }
        i += 1
        new GenericInternalRow(vals)
      }
    }
    // Inside a task, close on task completion (covers limit/failure early
    // termination). Driver-side/test use has no task lifecycle — register a
    // best-effort Cleaner so an abandoned iterator cannot leak the channel,
    // reader, and allocator (exhaustion still closes eagerly via advance()).
    Option(org.apache.spark.TaskContext.get()) match {
      case Some(tc) => tc.addTaskCompletionListener[Unit](_ => closeAll())
      case None => cleaner.register(it, () => closeAll())
    }
    it
  }
}
