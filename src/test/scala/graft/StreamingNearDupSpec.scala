package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics of the streaming MinHash-LSH near-dup suppressor
  * (`Streaming.nearDupKeptDocs`): a later near-duplicate (one token
  * changed out of dozens) is dropped, an unrelated doc is kept, an exact
  * copy is dropped, and state crosses micro-batch boundaries. */
class StreamingNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def stage(dir: String, name: String, mtime: Long,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("neardup_spec").toString
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val dst = Paths.get(dir, name)
    Files.copy(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private def kept(dir: String, qn: String): Set[Long] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    graft.streaming.Streaming.nearDupKeptDocs(spark, dir, schema, qn)
      .as[Long].collect().toSet
  }

  test("near-dups and exact copies drop across batches; unrelated docs survive") {
    val dir = Files.createTempDirectory("neardup_stream").toString
    val base = (1 to 60).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val nearDup = base.replace("alpha30", "ALPHA30") // 3 shingles differ of ~178
    val unrelated = (1 to 60).map(i => s"delta$i epsilon$i zeta$i").mkString(" ")
    // batch 1: original + unrelated; batch 2: near-dup + exact copy + fresh doc
    stage(dir, "b1.parquet", 1700000000000L,
      Seq((1L, base), (2L, unrelated)))
    stage(dir, "b2.parquet", 1700000060000L,
      Seq((3L, nearDup), (4L, base), (5L, (1 to 60).map(i => s"eta$i theta$i iota$i").mkString(" "))))
    val got = kept(dir, "neardup_spec_a")
    assert(got.contains(1L) && got.contains(2L), "batch-1 distinct docs must survive")
    assert(got.contains(5L), "a fresh batch-2 doc must survive")
    assert(!got.contains(4L), "an exact copy arriving later must drop")
    assert(!got.contains(3L), "a near-dup (3 shingles changed of ~178) must drop")
  }

  test("a doc similar to NOTHING before it survives even with shared vocabulary") {
    val dir = Files.createTempDirectory("neardup_stream2").toString
    // same small vocabulary, different order/composition: token SETS
    // overlap but 3-gram shingle sets don't — must NOT collide
    val a = (1 to 50).map(i => s"w${i % 9}").mkString(" ")
    val b = (1 to 50).map(i => s"w${(i * 7 + 3) % 9}").mkString(" ")
    stage(dir, "b1.parquet", 1700000000000L, Seq((1L, a)))
    stage(dir, "b2.parquet", 1700000060000L, Seq((2L, b)))
    val got = kept(dir, "neardup_spec_b")
    assert(got == Set(1L, 2L), s"shared-vocab non-dups must both survive, got $got")
  }
}
