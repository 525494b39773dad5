package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HuggingFace, HuggingFaceUpload}

/** write_huggingface over the public LFS-batch + commit APIs against the
  * in-process MiniHub: full write→read round trip, atomic overwrite,
  * content dedupe, preupload enforcement, token auth. */
class HuggingFaceUploadSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"row_$i", i * 1.5)).toDF("id", "name", "score")

  private def freshCache(tag: String): String = {
    val p = s"/tmp/graft_hfu_cache_$tag"
    graft.sources.Hudi.deleteTable(p)
    p
  }

  test("upload then read round-trips through the hub protocols") {
    val hub = new HuggingFaceUpload.MiniHub
    try {
      val df = fixture(0, 100).repartition(3)
      val ops = HuggingFaceUpload.upload(df, "org/ds", hub.endpoint)
      assert(ops.filter(col("operation") === "ADD").count() == 3,
        "one lfsFile per partition file")
      assert(hub.commits == 1, "finalize is ONE commit")
      val back = HuggingFace.read(spark, "org/ds", endpoint = hub.endpoint,
        cacheDir = freshCache("rt"))
      assert(back.schema.fieldNames.sorted.sameElements(Array("id", "name", "score")))
      assert(back.count() == 100)
      assert(back.agg(sum("id")).as[Long].head() == (0 until 100).map(_.toLong).sum)
    } finally hub.close()
  }

  test("overwrite deletes the old split files in the same atomic commit") {
    val hub = new HuggingFaceUpload.MiniHub
    try {
      HuggingFaceUpload.upload(fixture(0, 50).repartition(2), "org/ow", hub.endpoint)
      assert(hub.files("org/ow").size == 2)
      val ops = HuggingFaceUpload.upload(fixture(100, 130).coalesce(1), "org/ow",
        hub.endpoint, overwrite = true)
      assert(ops.filter(col("operation") === "DELETE").count() == 2)
      assert(hub.files("org/ow").size == 1, "old split files replaced")
      val back = HuggingFace.read(spark, "org/ow", endpoint = hub.endpoint,
        cacheDir = freshCache("ow"))
      assert(back.count() == 30)
      assert(back.agg(min("id"), max("id")).as[(Long, Long)].head() == ((100L, 129L)))
    } finally hub.close()
  }

  test("append without overwrite accumulates split files") {
    val hub = new HuggingFaceUpload.MiniHub
    try {
      HuggingFaceUpload.upload(fixture(0, 10).coalesce(1), "org/app", hub.endpoint)
      HuggingFaceUpload.upload(fixture(10, 25).coalesce(1), "org/app", hub.endpoint)
      val back = HuggingFace.read(spark, "org/app", endpoint = hub.endpoint,
        cacheDir = freshCache("app"))
      assert(back.count() == 25)
    } finally hub.close()
  }

  test("lfs batch dedupes already-uploaded content (no second PUT target)") {
    val hub = new HuggingFaceUpload.MiniHub
    try {
      val df = fixture(0, 20).coalesce(1)
      HuggingFaceUpload.upload(df, "org/d1", hub.endpoint)
      val before = hub.blobCount
      // identical bytes to a different repo: batch must return no upload
      // action and the commit must still attach the existing blob
      HuggingFaceUpload.upload(df, "org/d2", hub.endpoint)
      assert(hub.blobCount == before, "identical parquet bytes stored once")
      assert(hub.files("org/d2").size == 1)
    } finally hub.close()
  }

  test("commit with an unknown oid is rejected (preupload enforced)") {
    val hub = new HuggingFaceUpload.MiniHub
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      val body =
        """{"key":"header","value":{"summary":"x"}}
          |{"key":"lfsFile","value":{"path":"data/x.parquet","algo":"sha256","oid":"deadbeef","size":4}}
          |""".stripMargin
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${hub.endpoint}/api/datasets/org/bad/commit/main"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 400 && resp.body().contains("unknown lfs oid"))
      assert(hub.files("org/bad").isEmpty, "atomic: nothing applied")
    } finally hub.close()
  }

  test("token auth is enforced on batch and commit") {
    val hub = new HuggingFaceUpload.MiniHub(requiredToken = "hf_secret")
    try {
      val e = intercept[Exception] {
        HuggingFaceUpload.upload(fixture(0, 5).coalesce(1), "org/auth", hub.endpoint,
          token = Some("wrong"))
      }
      assert(e.getMessage.contains("401"))
      HuggingFaceUpload.upload(fixture(0, 5).coalesce(1), "org/auth", hub.endpoint,
        token = Some("hf_secret"))
      assert(hub.files("org/auth").size == 1)
    } finally hub.close()
  }
}
