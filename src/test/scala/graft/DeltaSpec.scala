package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Delta

/** Delta Lake source/sink (open-protocol implementation): append/overwrite
  * commit semantics, time travel, checkpoint reconstruction, partition
  * pruning at planning time, and rejection of unsupported reader features. */
class DeltaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_delta_spec_$tag"
    Delta.deleteTable(p)
    p
  }

  private def fixture(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"name_$i", (i % 4).toString, i * 1.5))
      .toDF("id", "name", "bucket", "score")

  test("append commits accumulate; schema and values round-trip") {
    val path = freshDir("append")
    val v0 = Delta.write(fixture(0, 100), path)
    val v1 = Delta.write(fixture(100, 250), path)
    assert(v0 == 0 && v1 == 1)
    val back = Delta.read(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "bucket", "score"))
    assert(back.count() == 250)
    assert(back.agg(sum("id")).as[Long].head() == (0L until 250).sum)
  }

  test("partitioned table: values rebuilt from partitionValues, one scan") {
    val path = freshDir("part")
    Delta.write(fixture(0, 200), path, partitionBy = Seq("bucket"))
    val back = Delta.read(spark, path)
    // bucket comes back typed and correct per-row, not baked into the files
    val bad = back.filter(col("bucket") =!= (col("id") % 4).cast("string")).count()
    assert(bad == 0)
    assert(back.select("bucket").distinct().count() == 4)
    // scale shape: ONE parquet scan regardless of partition count (the
    // partition columns are re-attached by broadcast join, not per-value
    // unions that explode the plan at 10k partitions)
    val plan = back.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single parquet scan, got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "partition-value attach must be a broadcast join")
  }

  test("partition pruning culls files during planning") {
    val path = freshDir("prune")
    Delta.write(fixture(0, 200), path, partitionBy = Seq("bucket"))
    val snap = Delta.snapshot(spark, path)
    val all = snap.files.size
    val pruned = Delta.read(spark, path, partitionFilter = pv => pv("bucket") == "2")
    val scanned = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles.length
    }.sum
    assert(scanned < all, s"pruned read should open fewer than $all files, opened $scanned")
    assert(pruned.count() == 50)
    assert(pruned.filter(col("bucket") =!= "2").count() == 0)
  }

  test("checkpoint-of-checkpoint unions the distributed add set with the tail") {
    val path = freshDir("ckck")
    Delta.write(fixture(0, 100), path)
    Delta.checkpoint(spark, path)
    Delta.write(fixture(100, 150), path)
    Delta.checkpoint(spark, path) // prior checkpoint's adds flow DF→parquet
    Delta.write(fixture(150, 160), path)
    val st = Delta.state(spark, path)
    assert(st.ckptAdds.isDefined && st.tailAdds.nonEmpty)
    val back = Delta.read(spark, path)
    assert(back.count() == 160)
    assert(back.agg(sum("id")).as[Long].head() == (0L until 160).sum)
  }

  test("overwrite logically removes prior files; time travel still sees them") {
    val path = freshDir("tt")
    Delta.write(fixture(0, 100), path)                      // v0
    Delta.write(fixture(100, 200), path)                    // v1
    Delta.write(fixture(0, 10), path, mode = "overwrite")   // v2
    assert(Delta.read(spark, path).count() == 10)
    assert(Delta.read(spark, path, versionAsOf = Some(1L)).count() == 200)
    assert(Delta.read(spark, path, versionAsOf = Some(0L)).count() == 100)
    // physical files from v0/v1 still exist (no vacuum), the log hides them
    val snap = Delta.snapshot(spark, path)
    assert(snap.files.forall(f => Files.exists(Paths.get(path, f.path))))
  }

  test("checkpoint: state reconstructs from parquet + post-checkpoint replay") {
    val path = freshDir("ckpt")
    Delta.write(fixture(0, 50), path, partitionBy = Seq("bucket"))
    Delta.write(fixture(50, 120), path)
    val ckv = Delta.checkpoint(spark, path)
    assert(ckv == 1)
    Delta.write(fixture(120, 150), path) // commit after the checkpoint
    // delete the pre-checkpoint JSON commits: replay MUST start from the
    // checkpoint for this to pass
    Files.delete(Paths.get(path, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(path, "_delta_log", f"${1L}%020d.json"))
    val back = Delta.read(spark, path)
    assert(back.count() == 150)
    assert(back.filter(col("bucket") =!= (col("id") % 4).cast("string")).count() == 0)
  }

  test("empty snapshot read returns an empty frame with the table schema") {
    val path = freshDir("empty")
    Delta.write(fixture(0, 20), path)
    Delta.write(fixture(0, 0), path, mode = "overwrite")
    val back = Delta.read(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "bucket", "score"))
    assert(back.count() == 0)
  }

  test("deletion vectors: roaring codec round-trips array, bitmap, and run containers") {
    import graft.sources.DeltaDeletionVectors._
    // array container (small), bitmap container (dense > 4096), spread
    // across two 32-bit bitmaps
    val positions: Array[Long] =
      (Array(1L, 5L, 70000L) ++ (100000L until 105000L) ++
        Array((1L << 32) + 3L, (1L << 32) + 65537L)).sorted
    assert(deserialize(serialize(positions)).toSeq == positions.toSeq)
    // run-container parse (what external writers may emit): hand-build a
    // single bitmap with one run [10, 14] using the run cookie
    val run = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4 + 2 + 3 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    run.putInt(1681511377).putLong(1L) // magic + one bitmap
    run.putInt(12347 | (0 << 16))      // SERIAL_COOKIE, size-1=0
    run.put(1.toByte)                  // run flag for container 0
    run.putShort(0).putShort(4)        // key 0, cardinality-1 = 4
    // size < 4 with runs → no offset header
    run.putShort(1).putShort(10).putShort(4) // 1 run: start 10, len-1 = 4
    assert(deserialize(run.array()).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    // z85 round-trip
    val bytes = Array.tabulate(16)(i => (i * 17 - 128).toByte)
    assert(z85Decode(z85Encode(bytes)).toSeq == bytes.toSeq)
  }

  test("deletion vectors: MoR delete tombstones rows without rewriting files") {
    val path = freshDir("dv")
    Delta.write(fixture(0, 300).repartition(3), path)
    val before = Delta.snapshot(spark, path).files.map(_.path).toSet
    val (_, n) = Delta.deleteVectors(spark, path, col("id") % 3 === 0)
    assert(n == 100, s"0..299 has 100 multiples of 3, got $n")
    val snap = Delta.snapshot(spark, path)
    assert(snap.files.map(_.path).toSet == before, "no data file may be rewritten")
    assert(snap.files.forall(_.dv.isDefined))
    val after = Delta.read(spark, path)
    assert(after.count() == 200)
    assert(after.filter(col("id") % 3 === 0).count() == 0)
    // time travel to the pre-delete version sees all rows
    assert(Delta.read(spark, path, versionAsOf = Some(0L)).count() == 300)
    // repeated delete over the same predicate is a no-op
    assert(Delta.deleteVectors(spark, path, col("id") % 3 === 0)._2 == 0L)
    // second MoR delete merges bitmaps (union, not replace)
    val (_, n2) = Delta.deleteVectors(spark, path, col("id") === 1L)
    assert(n2 == 1L)
    assert(Delta.read(spark, path).count() == 199)
  }

  test("deletion vectors: inline and on-disk storage both round-trip") {
    val path = freshDir("dv_storage")
    Delta.write(fixture(0, 5000).repartition(2), path)
    // tiny delete → inline "i"; big delete → shared "u" .bin file
    Delta.deleteVectors(spark, path, col("id") === 7L)
    val inline = Delta.snapshot(spark, path).files.flatMap(_.dv)
    assert(inline.nonEmpty && inline.forall(_.storageType == "i"))
    Delta.deleteVectors(spark, path, col("id") >= 1000L && col("id") < 4000L)
    val dvs = Delta.snapshot(spark, path).files.flatMap(_.dv)
    assert(dvs.exists(_.storageType == "u"), s"expected on-disk DV, got $dvs")
    assert(Files.list(Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.matches("deletion_vector_.*\\.bin")))
    assert(Delta.read(spark, path).count() == 5000 - 1 - 3000)
    assert(Delta.read(spark, path).filter(col("id") === 7L || col("id") === 2000L).count() == 0)
  }

  test("deletion vectors: CoW update respects tombstones and drops stale DVs") {
    val path = freshDir("dv_cow")
    Delta.write(fixture(0, 100).repartition(2), path)
    Delta.deleteVectors(spark, path, col("id") < 10)
    val (_, updated) = Delta.update(spark, path,
      Map("score" -> (col("score") + 1000)), col("id") < 50)
    assert(updated == 40, s"ids 10..49 = 40 rows, got $updated")
    val after = Delta.read(spark, path)
    assert(after.count() == 90)
    assert(after.filter(col("id") < 10).count() == 0, "rewrite must not resurrect")
    assert(after.filter(col("score") > 1000).count() == 40)
    // rewritten files carry no DV
    assert(Delta.snapshot(spark, path).files.forall(_.dv.isEmpty))
  }

  test("deletion vectors survive a checkpoint; vacuum keeps live DV files") {
    val path = freshDir("dv_ckpt")
    Delta.write(fixture(0, 5000).repartition(2), path)
    Delta.deleteVectors(spark, path, col("id") >= 500L && col("id") < 3500L) // on-disk DV
    Delta.checkpoint(spark, path)
    Delta.write(fixture(5000, 5100), path) // tail commit after checkpoint
    assert(Delta.read(spark, path).count() == 5000 - 3000 + 100)
    // vacuum (retain 0) must NOT delete the live DV bin file
    Delta.vacuum(spark, path, retainMillis = 0)
    assert(Delta.read(spark, path).count() == 5000 - 3000 + 100)
    // after a CoW rewrite drops the DVs, vacuum reclaims the orphaned bin
    Delta.delete(spark, path, col("id") >= 0L) // rewrites everything away
    Delta.vacuum(spark, path, retainMillis = 0)
    assert(!Files.list(Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".bin")), "orphaned DV not vacuumed")
  }

  test("rejects tables that demand unsupported reader features") {
    val path = freshDir("features")
    Delta.write(fixture(0, 5), path)
    val log = Paths.get(path, "_delta_log", f"${1L}%020d.json")
    Files.write(log,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"]}}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Delta.read(spark, path))
    assert(e.getMessage.contains("columnMapping"))
  }

  test("append with a mismatched schema is rejected, not silently corrupted") {
    val path = freshDir("schema")
    Delta.write(fixture(0, 10), path)
    val wrong = Seq((1L, 2L)).toDF("id", "other")
    val e = intercept[IllegalArgumentException](Delta.write(wrong, path))
    assert(e.getMessage.contains("does not match table schema"))
    // overwrite may evolve the schema
    Delta.write(wrong, path, mode = "overwrite")
    assert(Delta.read(spark, path).schema.fieldNames.toSeq == Seq("id", "other"))
  }

  test("compact folds small files per partition; dataChange=false; time travel intact") {
    val path = freshDir("compact")
    // 5 small commits -> 5 files per partition value
    (0 until 5).foreach(i => Delta.write(fixture(i * 40, (i + 1) * 40), path,
      partitionBy = Seq("bucket")))
    val before = Delta.snapshot(spark, path)
    assert(before.files.groupBy(_.partitionValues).forall(_._2.size >= 5),
      "each partition should hold at least one small file per commit")
    val v = Delta.compact(spark, path)
    val after = Delta.snapshot(spark, path)
    assert(after.version == v)
    assert(after.files.groupBy(_.partitionValues).forall(_._2.size == 1),
      "each partition should fold to one file at this size")
    // same data, and the pre-compaction version still reads (files kept)
    assert(Delta.read(spark, path).count() == 200)
    assert(Delta.read(spark, path).agg(sum("id")).as[Long].head() == (0L until 200).sum)
    assert(Delta.read(spark, path, versionAsOf = Some(before.version)).count() == 200)
    // compaction is invisible to change consumers: all actions carry dataChange=false
    val txt = new String(Files.readAllBytes(
      Paths.get(path, "_delta_log", f"$v%020d.json")), "UTF-8")
    assert(!txt.contains("\"dataChange\":true"))
  }

  test("vacuum deletes unreferenced files; current snapshot unaffected") {
    val path = freshDir("vacuum")
    (0 until 3).foreach(i => Delta.write(fixture(i * 30, (i + 1) * 30), path))
    Delta.compact(spark, path)
    val deleted = Delta.vacuum(spark, path, retainMillis = 0L)
    assert(deleted >= 3, s"expected the 3+ pre-compaction files gone, got $deleted")
    assert(Delta.read(spark, path).count() == 90)
    assert(Delta.vacuum(spark, path, retainMillis = 0L) == 0, "second vacuum finds nothing")
  }

  test("data-column filters and pruning reach the scan through the reattach join") {
    val path = freshDir("pushdown")
    Delta.write(fixture(0, 100), path, partitionBy = Seq("bucket"))
    val df = Delta.read(spark, path)
      .filter(col("score") > 100.0).select("id", "score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(score,100.0)"),
      s"filter must be pushed to the parquet scan:\n$plan")
    assert(plan.contains("struct<id:bigint,score:double>"),
      s"scan must read only id+score (column pruning):\n$plan")
  }

  test("racing appenders both commit via optimistic retry; no lost updates") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val path = freshDir("race")
    Delta.write(fixture(0, 10), path) // v0 creates the table
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val futures = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val df = fixture(100 + i * 50, 150 + i * 50)
          gate.await()
          Delta.write(df, path) // all four race for the next version
        }
      })
    }
    gate.countDown()
    val versions = futures.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(versions.toSet.size == 4, s"each writer needs its own version, got $versions")
    assert(versions.toSet == Set(1L, 2L, 3L, 4L))
    assert(Delta.read(spark, path).count() == 10 + 4 * 50, "no commit may be lost")
  }

  test("partition values with spaces/%/+ round-trip through path encoding") {
    val path = freshDir("specialchars")
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "x%y"), (4L, "p+q"), (5L, "plain"))
      .toDF("id", "seg")
    Delta.write(df, path, partitionBy = Seq("seg"))
    val back = Delta.read(spark, path)
    assert(back.count() == 5)
    assert(back.filter(col("seg") === "a b").count() == 2)
    assert(back.filter(col("seg") === "x%y").agg(sum("id")).head().getLong(0) == 3L)
    assert(back.filter(col("seg") === "p+q").count() == 1)
  }

  test("errorifexists refuses to write over an existing table") {
    val path = freshDir("eie")
    Delta.write(fixture(0, 5), path)
    intercept[IllegalArgumentException](
      Delta.write(fixture(5, 10), path, mode = "errorifexists"))
  }
}
