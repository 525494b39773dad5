package graft

import java.nio.file.{Files => JFiles, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ExecMetrics

/** Runtime introspection (ref dataframe.py:247 metrics / :254
  * skipped_corrupt_files): per-plan-node SQLMetrics after materialization,
  * and the distributed corrupt-parquet probe with the partial flag. */
class ExecMetricsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("collectWithMetrics: scan and result stats match the data") {
    val df = (0 until 1000).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "g")
    val dir = JFiles.createTempDirectory("graft_metrics_").toString
    df.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).groupBy("g").agg(count(lit(1)).as("n"))
    val (rows, m) = ExecMetrics.collectWithMetrics(q)
    assert(rows.length == 7)
    assert(ExecMetrics.metricSum(m, "Scan", "numOutputRows") == 1000L)
    // the metrics frame is per-node: scan, aggregates, exchange all present
    val nodes = m.select("node").distinct().as[String].collect().toSet
    assert(nodes.exists(_.contains("Scan")), s"nodes: $nodes")
    assert(nodes.exists(_.contains("HashAggregate")), s"nodes: $nodes")
  }

  test("skippedCorruptFiles: truncated footer = full skip, torn row group = partial") {
    val dir = JFiles.createTempDirectory("graft_corrupt_").toString
    // three healthy multi-row-group files (tiny block size forces >1 rg)
    (0 until 3).foreach { i =>
      (0 until 40000).map(j => (j.toLong + i, s"payload_${j}_%032d".format(j)))
        .toDF("id", "s").coalesce(1)
        .write.option("parquet.block.size", "65536")
        .mode("overwrite").parquet(s"$dir/part$i")
    }
    val files = JFiles.list(Paths.get(dir)).toArray.map(_.toString).flatMap { d =>
      new java.io.File(d).listFiles.filter(_.getName.endsWith(".parquet")).map(_.toPath)
    }.sorted
    assert(files.length == 3)
    // corrupt #0: truncate — footer gone, nothing readable (partial=false)
    val f0 = files(0)
    val raw0 = JFiles.readAllBytes(f0)
    JFiles.write(f0, raw0.take(raw0.length / 3).toArray)
    // corrupt #1: zero a region at the SECOND row group's start — footer and
    // rg1 intact, rg2 unreadable (partial=true)
    val f1 = files(1)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f1.toUri), conf))
    val rgs = reader.getRowGroups
    assert(rgs.size() >= 2, s"need >=2 row groups, got ${rgs.size()}")
    val rg2Start = rgs.get(1).getColumns.get(0).getStartingPos
    reader.close()
    val raf = new java.io.RandomAccessFile(f1.toFile, "rw")
    // land inside the first page's COMPRESSED DATA (header is ~a few tens
    // of bytes): decompression throws, header parse stays intact
    try { raf.seek(rg2Start + 48); raf.write(Array.fill(192)(0x5A.toByte)) }
    finally raf.close()
    // drop local-fs .crc sidecars (HDFS/S3 don't have them): the probe and
    // Spark's tolerant read should both see PARQUET corruption, not a
    // transport checksum mismatch at first byte
    JFiles.list(Paths.get(dir)).toArray.map(_.toString).foreach { d =>
      new java.io.File(d).listFiles.filter(_.getName.endsWith(".crc"))
        .foreach(_.delete())
    }

    val skipped = ExecMetrics.skippedCorruptFiles(spark, s"$dir/part*/*.parquet")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(skipped.length == 2, s"exactly the two planted corruptions: ${skipped.toSeq}")
    info(s"skipped: ${skipped.toSeq.mkString("; ")}")
    val byPath = skipped.map(s => (new java.io.File(new java.net.URI(s._1)).toPath, s)).toMap
    assert(byPath(f0)._3 == false, "truncated footer: nothing was emitted")
    assert(byPath(f1)._3 == true, "torn second row group: rg1 already emitted")
    assert(skipped.forall(_._2.nonEmpty), "reasons are populated")

    // parity with Spark's own tolerant read: ignoreCorruptFiles returns the
    // healthy file plus the readable prefix of the partial one
    val got = spark.read
      .schema("id BIGINT, s STRING") // inference would stop at the torn footer
      .option("ignoreCorruptFiles", "true").parquet(s"$dir/part*/*.parquet")
      .count()
    assert(got >= 40000L && got < 120000L,
      s"healthy file + (possibly) partial prefix expected, got $got")
  }
}
