package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Iceberg

/** Row-level DELETE / UPDATE on Iceberg tables (copy-on-write with
  * manifest rewriting): bounds-narrowed candidates, DELETED entries for
  * affected files, snapshot time travel across DML. */
class IcebergDmlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_icedml_spec_$tag"
    Iceberg.deleteTable(p)
    p
  }

  test("delete rewrites only match-containing files; old snapshot still readable") {
    val path = freshDir("delete")
    val df = (0 until 400).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .repartitionByRange(4, col("id"))
    val snap0 = Iceberg.write(df, path)
    val before = Iceberg.state(path).files.map(_.path).toSet

    val (snap1, n) = Iceberg.delete(spark, path, col("id") >= 100L && col("id") < 150L)
    assert(n == 50)
    val after = Iceberg.state(path).files.map(_.path).toSet
    assert((before & after).size == 3, s"untouched files must stay live: $after")
    val back = Iceberg.read(spark, path)
    assert(back.count() == 350)
    assert(back.filter(col("id").between(100L, 149L)).count() == 0)
    // the pre-delete snapshot still reads complete
    assert(Iceberg.read(spark, path, snapshotId = Some(snap0)).count() == 400)
    assert(snap1 != snap0)
  }

  test("delete across append snapshots rewrites the right prior manifest") {
    val path = freshDir("multi")
    Iceberg.write((0 until 100).map(i => (i.toLong, "a")).toDF("id", "src"), path)
    Iceberg.write((100 until 200).map(i => (i.toLong, "b")).toDF("id", "src"), path)
    val (_, n) = Iceberg.delete(spark, path, col("id") < 50L)
    assert(n == 50)
    val back = Iceberg.read(spark, path)
    assert(back.count() == 150)
    assert(back.filter(col("src") === "b").count() == 100, "second snapshot untouched")
    assert(back.agg(min("id")).as[Long].head() == 50L)
  }

  test("update applies assignments where the predicate holds; nulls keep rows") {
    val path = freshDir("update")
    val rows = Seq[(java.lang.Long, Double)]((1L, 1.0), (null, 2.0), (3L, 3.0))
    Iceberg.write(rows.toDF("id", "v"), path)
    val (_, n) = Iceberg.update(spark, path, Map("v" -> (col("v") * 100)), col("id") > 1L)
    assert(n == 1) // null > 1 → NULL → unchanged
    val got = Iceberg.read(spark, path).select("v").as[Double].collect().sorted.toSeq
    assert(got == Seq(1.0, 2.0, 300.0))
  }

  test("partition-column update moves rows; dml on partitioned tables") {
    val path = freshDir("partmove")
    Iceberg.write((0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      path, partitionBy = Seq("g"))
    val (_, n) = Iceberg.update(spark, path, Map("g" -> lit(9)), col("g") === 1)
    assert(n == 20)
    val back = Iceberg.read(spark, path)
    assert(back.filter(col("g") === 1).count() == 0)
    assert(back.filter(col("g") === 9).count() == 20)
    assert(back.count() == 60)
  }

  test("dml preserves externally-assigned field ids, format-version and sequence numbers") {
    import java.nio.file.{Files, Paths}
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    val path = freshDir("fieldids")
    Iceberg.write((0 until 100).map(i => (i.toLong, s"u$i")).toDF("id", "user"), path)

    // simulate an externally evolved v2 table: non-sequential field ids
    // (as after column add/drop/rename) and a commit sequence counter
    val metaDir = Paths.get(path, "metadata")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")), "UTF-8").trim
    val mf = metaDir.resolve(s"v$hint.metadata.json")
    val om = new ObjectMapper()
    val root = om.readTree(Files.readAllBytes(mf)).asInstanceOf[ObjectNode]
    root.put("format-version", 2)
    root.put("last-column-id", 9)
    root.put("last-sequence-number", 3L)
    val fields = root.get("schema").get("fields")
    fields.get(0).asInstanceOf[ObjectNode].put("id", 5)
    fields.get(1).asInstanceOf[ObjectNode].put("id", 9)
    Files.write(mf, om.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))

    // an append must key its manifest stats by the TABLE's ids (5, 9)...
    Iceberg.write((100 until 200).map(i => (i.toLong, s"u$i")).toDF("id", "user"), path)
    // ...and DML must carry the metadata verbatim, not regenerate it
    val (_, n) = Iceberg.delete(spark, path, col("id") >= 150L)
    assert(n == 50)
    assert(Iceberg.read(spark, path).count() == 150)

    val after = om.readTree(Files.readAllBytes(
      metaDir.resolve(s"v${new String(Files.readAllBytes(metaDir.resolve("version-hint.text")), "UTF-8").trim}.metadata.json")))
    assert(after.get("format-version").asInt == 2, "format-version must not be demoted")
    assert(after.get("last-column-id").asInt == 9)
    val ids = after.get("schema").get("fields").elements()
    assert(ids.next().get("id").asInt == 5 && ids.next().get("id").asInt == 9,
      "original field ids must survive DML verbatim")
    // two commits since the edit (append bumps once, delete bumps once)
    assert(after.get("last-sequence-number").asLong == 5L)
    val curSnap = after.get("current-snapshot-id").asLong
    val sn = after.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curSnap).get
    assert(sn.get("sequence-number").asLong == 5L)
  }

  test("a concurrent commit at the same version is refused, never overwritten") {
    import java.nio.file.{Files, Paths}
    val path = freshDir("conflict")
    Iceberg.write((0 until 50).map(i => (i.toLong, s"u$i")).toDF("id", "user"), path)
    val metaDir = Paths.get(path, "metadata")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")), "UTF-8").trim
    // a concurrent writer lands the next version between our planning
    // read and our publish
    val winner = metaDir.resolve(s"v${hint.toInt + 1}.metadata.json")
    Files.copy(metaDir.resolve(s"v$hint.metadata.json"), winner)
    val before = new String(Files.readAllBytes(winner), "UTF-8")
    val e = intercept[IllegalStateException](
      Iceberg.delete(spark, path, col("id") < 10L))
    assert(e.getMessage.contains("concurrent"))
    assert(new String(Files.readAllBytes(winner), "UTF-8") == before,
      "the winner's metadata file must be untouched")
    assert(Iceberg.read(spark, path).count() == 50, "table state intact after refusal")
  }

  test("delete matching nothing creates no snapshot") {
    val path = freshDir("noop")
    val s0 = Iceberg.write((1 to 10).map(i => (i.toLong, "r")).toDF("id", "r"), path)
    val (s1, n) = Iceberg.delete(spark, path, col("id") > 1000L)
    assert(s1 == s0 && n == 0)
  }
}
