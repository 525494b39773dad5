package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC source: streaming parse of a real-world capture (the reference
  * repo's test asset, read-only) + distributed write/read round-trip
  * (ref behavior: daft/io/_warc.py, tests/io/test_warc.py). */
class WarcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val example = "/root/reference/tests/assets/example.warc"

  test("parses a real WARC capture with the reference-shaped schema") {
    assume(new java.io.File(example).exists())
    val df = Warc.read(spark, example).cache()
    assert(df.count() == 30) // same count the reference's own test asserts
    assert(df.filter(col("WARC-Type") === "response").count() == 11)
    // warcinfo records carry no target URI (WARC spec §WARC-Target-URI)
    val warcinfo = df.filter(col("WARC-Type") === "warcinfo")
    assert(warcinfo.count() == 1)
    assert(warcinfo.filter(col("WARC-Target-URI").isNull).count() == 1)
    // remaining headers surface as queryable JSON
    val ct = df.filter(col("WARC-Type") === "response")
      .select(get_json_object(col("warc_headers"), "$['Content-Type']"))
      .head().getString(0)
    assert(ct != null && ct.startsWith("application/http"))
    // content length matches the declared header for every record
    val bad = df.filter(length(col("warc_content")) =!= col("Content-Length")).count()
    assert(bad == 0)
    df.unpersist()
  }

  test("gzipped WARC parses identically") {
    val gz = example + ".gz"
    assume(new java.io.File(gz).exists())
    assert(Warc.read(spark, gz).count() == 30)
  }

  test("write → read round-trips bytes and metadata") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, s"payload-$i éß", s"https://x.invalid/d/$i"))
    val df = rows.toDF("id", "text", "uri")
      .select(col("id"), encode(col("text"), "UTF-8").as("payload"), col("uri"))
      .repartition(4)
    val dir = "/tmp/graft_io/warc_spec"
    Warc.write(df, dir, "payload", "uri", "id")
    val back = Warc.read(spark, s"$dir/*.warc")
      .select(
        element_at(split(col("WARC-Target-URI"), "/"), -1).cast("long").as("id"),
        decode(col("warc_content"), "UTF-8").as("text"),
        col("WARC-Type").as("t"))
      .orderBy("id").collect()
    assert(back.length == 50)
    back.zip(rows.sortBy(_._1)).foreach { case (g, (id, text, _)) =>
      assert(g.getLong(0) == id && g.getString(1) == text && g.getString(2) == "response")
    }
  }
}
