package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Delta
import graft.streaming.DeltaSink

/** Streaming → Delta with exactly-once txn semantics: live micro-batch
  * ingestion, replayed-batch no-ops, txn survival through checkpoints. */
class DeltaSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("file stream drains into a delta table; restart resumes, no dupes") {
    val path = "/tmp/graft_delta_sink_stream"
    val src = "/tmp/graft_delta_sink_stream_src"
    val ckpt = "/tmp/graft_delta_sink_stream_ckpt"
    Seq(path, src, ckpt).foreach(d =>
      graft.sources.PartitionedFiles.deleteRecursively(java.nio.file.Paths.get(d)))
    val schema = StructType(Seq(StructField("id", LongType), StructField("tag", StringType)))

    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .write.parquet(s"$src/f0")
    val q = DeltaSink.start(
      spark.readStream.schema(schema).parquet(s"$src/*"), path, ckpt, appId = "spec-app")
    q.awaitTermination(60000)

    Seq((4L, "b"), (5L, "a")).toDF("id", "tag").write.parquet(s"$src/f1")
    val q2 = DeltaSink.start(
      spark.readStream.schema(schema).parquet(s"$src/*"), path, ckpt, appId = "spec-app")
    q2.awaitTermination(60000)

    val back = Delta.read(spark, path)
    assert(back.count() == 5)
    assert(back.agg(sum("id")).head().getLong(0) == 15L)
    // the sink recorded its txn watermark
    assert(Delta.snapshot(spark, path).appTxns.contains("spec-app"))
  }

  test("replayed batch ids are no-ops (exactly-once on restart)") {
    val path = "/tmp/graft_delta_sink_replay"
    Delta.deleteTable(path)
    val batch = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    assert(DeltaSink.appendBatch(batch, path, "app1", batchId = 0))
    assert(!DeltaSink.appendBatch(batch, path, "app1", batchId = 0), "replay must no-op")
    assert(Delta.read(spark, path).count() == 2)
    // an older batch id is also skipped; a newer one applies
    assert(!DeltaSink.appendBatch(batch, path, "app1", batchId = -1))
    assert(DeltaSink.appendBatch(batch, path, "app1", batchId = 1))
    assert(Delta.read(spark, path).count() == 4)
    // a different app id has its own watermark
    assert(DeltaSink.appendBatch(batch, path, "app2", batchId = 0))
    assert(Delta.read(spark, path).count() == 6)
  }

  test("txn watermarks survive checkpointing") {
    val path = "/tmp/graft_delta_sink_ckpt"
    Delta.deleteTable(path)
    val batch = Seq((1L, "x")).toDF("id", "tag")
    DeltaSink.appendBatch(batch, path, "appC", batchId = 7)
    Delta.checkpoint(spark, path)
    // delete the JSON commits: state must come from the checkpoint alone
    val log = java.nio.file.Paths.get(path, "_delta_log")
    java.nio.file.Files.list(log).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .foreach(java.nio.file.Files.delete(_))
    // a fresh commit after the checkpoint reads txns from parquet
    assert(!DeltaSink.appendBatch(batch, path, "appC", batchId = 7))
    assert(DeltaSink.appendBatch(batch, path, "appC", batchId = 8))
  }

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
