package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics of the streaming MinHash-LSH near-dup suppressor
  * (`Streaming.nearDupKeptDocs`): a later near-duplicate (one token
  * changed out of dozens) is dropped, an unrelated doc is kept, an exact
  * copy is dropped, state crosses micro-batch boundaries, the in-batch
  * winner is the component MINIMUM regardless of partitioning, and band
  * state EVICTS at the watermark horizon — a late near-dup after its
  * original's bands aged out is KEPT (the cost of bounded state). */
class StreamingNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def stage(dir: String, name: String, mtime: Long,
      rows: Seq[(Long, String)], tsMillis: Long = -1L): Unit = {
    val tmp = Files.createTempDirectory("neardup_spec").toString
    val ts = if (tsMillis >= 0) tsMillis else mtime
    rows.toDF("doc_id", "text")
      .withColumn("ts", timestamp_millis(lit(ts)))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val dst = Paths.get(dir, name)
    Files.copy(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)))

  private def kept(dir: String, qn: String, horizon: String = "1 hour"): Set[Long] =
    graft.streaming.Streaming.nearDupKeptDocs(spark, dir, schema, qn, horizon)
      .as[Long].collect().toSet

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

  test("mutual in-batch near-dups resolve to the component MINIMUM, never zero survivors") {
    val dir = Files.createTempDirectory("neardup_stream3").toString
    val base = (1 to 60).map(i => s"kappa$i lambda$i mu$i").mkString(" ")
    val near = base.replace("kappa30", "KAPPA30")
    val near2 = base.replace("kappa40", "KAPPA40")
    // all three mutually-near docs arrive in the SAME micro-batch; with
    // first-arrival-wins their band claims could split across partitions
    // and knock every member out — the min-winner state function must
    // keep exactly the component minimum
    stage(dir, "b1.parquet", 1700000000000L,
      Seq((7L, near), (3L, base), (9L, near2)))
    val got = kept(dir, "neardup_spec_c")
    assert(got == Set(3L), s"component minimum must be the lone survivor, got $got")
  }

  test("band state EVICTS at the horizon: a late near-dup after aging-out is KEPT") {
    val t0 = 1700000000000L
    val hourMs = 3600000L
    val dir = Files.createTempDirectory("neardup_stream4").toString
    val base = (1 to 60).map(i => s"nu$i xi$i omicron$i").mkString(" ")
    val lateCopy = base // exact copy arriving after the original's bands aged out
    val pusher1 = (1 to 60).map(i => s"pi$i rho$i sigma$i").mkString(" ")
    val pusher2 = (1 to 60).map(i => s"tau$i upsilon$i phi$i").mkString(" ")
    // b1: original at t0 (claims time out at t0 + 1h)
    stage(dir, "b1.parquet", t0, Seq((1L, base)))
    // b2 at t0+3h: advances the watermark to t0+2h AFTER the batch
    stage(dir, "b2.parquet", t0 + 1000, Seq((2L, pusher1)), tsMillis = t0 + 3 * hourMs)
    // b3: watermark (t0+2h) now exceeds b1's timeouts (t0+1h) — the
    // timeout path runs this batch and removes the aged claims
    stage(dir, "b3.parquet", t0 + 2000, Seq((3L, pusher2)), tsMillis = t0 + 3 * hourMs + 1000)
    // b4: the late copy arrives; its bands are claimable again → KEPT
    stage(dir, "b4.parquet", t0 + 3000, Seq((4L, lateCopy)), tsMillis = t0 + 3 * hourMs + 2000)
    val got = kept(dir, "neardup_spec_d")
    assert(got.contains(1L), "the original must survive")
    assert(got.contains(4L),
      s"a near-dup arriving after its original's bands aged out must be KEPT, got $got")
    // control: the same copy arriving INSIDE the horizon drops (suite test 1
    // covers this too, but pin it against the same corpus)
    val dir2 = Files.createTempDirectory("neardup_stream5").toString
    stage(dir2, "b1.parquet", t0, Seq((1L, base)))
    stage(dir2, "b2.parquet", t0 + 1000, Seq((4L, lateCopy)), tsMillis = t0 + hourMs / 2)
    val got2 = kept(dir2, "neardup_spec_e")
    assert(got2 == Set(1L), s"inside the horizon the copy must drop, got $got2")
  }
}
