package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Delta

/** Row-level DELETE / UPDATE on Delta tables (copy-on-write): stats-
  * narrowed candidates, only match-containing files rewritten, SQL NULL
  * semantics, time travel across DML, partition-moving updates. */
class DeltaDmlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_deltadml_spec_$tag"
    Delta.deleteTable(p)
    p
  }

  test("delete rewrites only files that contain matches; time travel intact") {
    val path = freshDir("delete")
    val df = (0 until 400).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .repartitionByRange(4, col("id"))
    Delta.write(df, path) // 4 files with disjoint id ranges
    val before = Delta.snapshot(spark, path).files.map(_.path).toSet

    val (v, n) = Delta.delete(spark, path, col("id") >= 100L && col("id") < 150L)
    assert(n == 50)
    val after = Delta.snapshot(spark, path).files.map(_.path).toSet
    // 3 of the 4 original files survive untouched (stats prove no match)
    assert((before & after).size == 3, s"untouched files must keep their adds: $after")
    val back = Delta.read(spark, path)
    assert(back.count() == 350)
    assert(back.filter(col("id").between(100L, 149L)).count() == 0)
    // pre-delete version still shows all rows
    assert(Delta.read(spark, path, versionAsOf = Some(v - 1)).count() == 400)
  }

  test("NULL predicate results keep the row (SQL DELETE semantics)") {
    val path = freshDir("nulls")
    val rows = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, "c"))
    Delta.write(rows.toDF("id", "tag"), path)
    val (_, n) = Delta.delete(spark, path, col("id") > 1L) // null > 1 → NULL → keep
    assert(n == 1)
    assert(Delta.read(spark, path).select("tag").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("delete matching nothing commits nothing") {
    val path = freshDir("noop")
    Delta.write((1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "r"), path)
    val v0 = Delta.latestVersion(path)
    val (v, n) = Delta.delete(spark, path, col("id") > 1000L)
    assert(v == v0 && n == 0)
    assert(Delta.latestVersion(path) == v0, "no-op delete must not create a version")
  }

  test("update applies assignments where the predicate holds, with casts") {
    val path = freshDir("update")
    Delta.write((0 until 100).map(i => (i.toLong, i * 1.0, "keep")).toDF("id", "score", "tag"), path)
    val (_, n) = Delta.update(spark, path,
      Map("score" -> (col("score") * 10), "tag" -> lit("boosted")),
      col("id") < 20L)
    assert(n == 20)
    val back = Delta.read(spark, path)
    assert(back.filter(col("tag") === "boosted").count() == 20)
    assert(back.filter(col("id") === 5L).select("score").as[Double].head() == 50.0)
    assert(back.filter(col("id") === 50L).select("score").as[Double].head() == 50.0)
    assert(back.count() == 100)
  }

  test("updating a partition column moves rows to their new directories") {
    val path = freshDir("partmove")
    Delta.write((0 until 60).map(i => (i.toLong, (i % 3).toString)).toDF("id", "g"),
      path, partitionBy = Seq("g"))
    val (_, n) = Delta.update(spark, path, Map("g" -> lit("9")), col("g") === "1")
    assert(n == 20)
    val back = Delta.read(spark, path)
    assert(back.filter(col("g") === "1").count() == 0)
    assert(back.filter(col("g") === "9").count() == 20)
    // the moved rows physically live under g=9
    val snap = Delta.snapshot(spark, path)
    val nineFiles = snap.files.filter(_.partitionValues.get("g").contains("9"))
    assert(nineFiles.nonEmpty &&
      nineFiles.forall(f => Paths.get(path, f.path).toString.contains("g=9")))
  }

  test("delete after zorder touches a small fraction of files") {
    val path = freshDir("zdel")
    val rnd = new scala.util.Random(3)
    Delta.write(rnd.shuffle((0 until 2048).toList).map(i => (i.toLong, i % 7))
      .toDF("id", "m").repartition(8), path)
    val total0 = Delta.snapshot(spark, path).files.map(_.size).sum
    Delta.optimizeZorder(spark, path, Seq("id"), targetFileBytes = total0 / 8)
    val before = Delta.snapshot(spark, path).files.map(_.path).toSet
    val (_, n) = Delta.delete(spark, path, col("id") === 1234L)
    assert(n == 1)
    val after = Delta.snapshot(spark, path).files.map(_.path).toSet
    // point delete on the clustered column rewrites ~1 file
    assert((before -- after).size <= 2,
      s"expected a point delete to rewrite at most 2 files, rewrote ${(before -- after).size}")
    assert(Delta.read(spark, path).count() == 2047)
  }
}
