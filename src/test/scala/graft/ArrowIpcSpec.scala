package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowIpc

/** Arrow IPC export/import: typed round-trips (incl. nulls, timestamps,
  * decimals, binary, float arrays), per-partition file layout, batch
  * splitting, and loader-shape guarantees. */
class ArrowIpcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("arrow_ipc_spec").toString

  test("primitive + temporal + decimal + binary round-trip with nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("i", IntegerType),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 3)),
      StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val rows = (1 to 100).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else i,
        if (i % 5 == 0) null else s"row-$i\nsecond line",
        i * 1.5,
        i * 0.25f,
        i % 2 == 0,
        Array[Byte](i.toByte, (i + 1).toByte),
        new java.math.BigDecimal(s"$i.125"),
        java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${i % 60}"),
        java.sql.Date.valueOf("2024-06-15"))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val dir = tmp()
    val n = ArrowIpc.write(df, dir, batchSize = 16)
    assert(n == 100)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == schema)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("float-array (embedding) columns round-trip") {
    val df = (1 to 20).map(i => (i.toLong, Array.tabulate(4)(j => (i + j).toFloat)))
      .toDF("id", "emb")
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir).orderBy("id")
      .as[(Long, Array[Float])].collect()
    assert(back.length == 20)
    back.foreach { case (i, e) => assert(e.toSeq == Array.tabulate(4)(j => (i + j).toFloat).toSeq) }
  }

  test("one file per partition; empty partitions write empty files that read back") {
    val df = spark.range(10).toDF("id").repartition(4)
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".arrow"))
    assert(files.length == 4)
    assert(ArrowIpc.read(spark, dir).count() == 10)
  }

  test("batches split at batchSize (loader streams batch-at-a-time)") {
    val df = spark.range(1000).toDF("id").coalesce(1)
    val dir = tmp()
    ArrowIpc.write(df, dir, batchSize = 100)
    val f = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".arrow")).head
    val ch = new java.io.FileInputStream(f).getChannel
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    val r = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    try assert(r.getRecordBlocks.size == 10)
    finally { r.close(); ch.close(); alloc.close() }
  }

  test("read() on a missing or empty dir fails loudly") {
    intercept[IllegalArgumentException](ArrowIpc.read(spark, "/nonexistent/nope"))
  }
}
