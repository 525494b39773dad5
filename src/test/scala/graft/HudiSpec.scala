package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hudi

/** Hudi copy-on-write source/sink (open-layout implementation): timeline
  * replay, file-group slice selection, replacecommit overwrites, instant
  * time travel, inflight-commit invisibility, MoR rejection. */
class HudiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_hudi_spec_$tag"
    Hudi.deleteTable(p)
    p
  }

  private def fixture(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"name_$i", (i % 3).toString, i * 2.0))
      .toDF("id", "name", "region", "amount")

  test("append commits accumulate as new file groups") {
    val path = freshDir("append")
    Hudi.write(fixture(0, 100), path)
    Hudi.write(fixture(100, 250), path)
    val back = Hudi.read(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "region", "amount"))
    assert(back.count() == 250)
    assert(back.agg(sum("id")).as[Long].head() == (0L until 250).sum)
  }

  test("partitioned table: partition path values re-attached, one scan") {
    val path = freshDir("part")
    Hudi.write(fixture(0, 150), path, partitionBy = Seq("region"))
    val back = Hudi.read(spark, path)
    assert(back.filter(col("region") =!= (col("id") % 3).cast("string")).count() == 0)
    val plan = back.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size == 1)
    // pruning: only one partition's files survive planning
    val pruned = Hudi.read(spark, path, partitionFilter = pv => pv("region") == "1")
    assert(pruned.count() == 50)
  }

  test("replacecommit overwrite hides prior file groups; time travel sees them") {
    val path = freshDir("tt")
    val t0 = Hudi.write(fixture(0, 100), path)
    val t1 = Hudi.write(fixture(100, 200), path)
    val t2 = Hudi.write(fixture(0, 25), path, mode = "overwrite")
    assert(t0 < t1 && t1 < t2) // monotone instants
    assert(Hudi.read(spark, path).count() == 25)
    assert(Hudi.read(spark, path, asOfInstant = Some(t1)).count() == 200)
    assert(Hudi.read(spark, path, asOfInstant = Some(t0)).count() == 100)
  }

  test("inflight commits are invisible to readers") {
    val path = freshDir("inflight")
    Hudi.write(fixture(0, 50), path)
    // a crashed writer: requested+inflight markers with no completed commit
    val bogus = "99999999999999999"
    Files.write(Paths.get(path, ".hoodie", s"$bogus.commit.requested"), Array.emptyByteArray)
    Files.write(Paths.get(path, ".hoodie", s"$bogus.commit.inflight"), Array.emptyByteArray)
    assert(Hudi.read(spark, path).count() == 50)
  }

  test("clean deletes replaced file slices; snapshot intact") {
    val path = freshDir("clean")
    Hudi.write(fixture(0, 100), path)
    Hudi.write(fixture(100, 150), path)
    Hudi.write(fixture(0, 30), path, mode = "overwrite")
    val deleted = Hudi.clean(path)
    assert(deleted >= 2, s"replaced slices should be deleted, got $deleted")
    assert(Hudi.read(spark, path).count() == 30)
    assert(Hudi.clean(path) == 0, "second clean finds nothing")
  }

  test("merge-on-read tables are rejected, not misread") {
    val path = freshDir("mor")
    Hudi.write(fixture(0, 10), path)
    val props = Paths.get(path, ".hoodie", "hoodie.properties")
    val txt = new String(Files.readAllBytes(props), "UTF-8")
      .replace("COPY_ON_WRITE", "MERGE_ON_READ")
    Files.write(props, txt.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Hudi.read(spark, path))
    assert(e.getMessage.contains("merge-on-read"))
  }
}
