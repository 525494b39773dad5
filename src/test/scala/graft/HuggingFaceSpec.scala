package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HuggingFace

/** hf://datasets resolution against an in-process hub: the dataset-viewer
  * parquet API contract (config→split→urls), distributed staged download,
  * cache hits, split filtering, listing-failure behavior. */
class HuggingFaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def delete(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
  }

  private def servedParquet(tag: String, n: Int): Array[Byte] = {
    val dir = s"/tmp/graft_hf_spec_src_$tag"
    delete(dir)
    (0 until n).map(i => (i.toLong, s"doc_$i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.readAllBytes(part)
  }

  /** In-process hub: `listing(endpoint)` builds the API JSON once the
    * port is known; `files` maps request paths to parquet bytes. */
  private def withHub(files: Map[String, Array[Byte]], listing: String => String)(
      body: (String, () => Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
    @volatile var fetches = 0
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val resp: Option[Array[Byte]] =
          if (path.startsWith("/api/datasets/")) Some(listing(endpoint).getBytes("UTF-8"))
          else files.get(path).map { b => fetches += 1; b }
        resp match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b); ex.close()
          case None =>
            ex.sendResponseHeaders(404, -1); ex.close()
        }
      }
    })
    server.start()
    try body(endpoint, () => fetches)
    finally server.stop(0)
  }

  test("reads a repo's parquet across configs/splits; cache skips refetch") {
    val trainBytes = servedParquet("train", 80)
    val testBytes = servedParquet("test", 20)
    val cache = "/tmp/graft_hf_spec_cache1"
    delete(cache)
    withHub(
      Map("/repo/train.parquet" -> trainBytes, "/repo/test.parquet" -> testBytes),
      ep => s"""{"default":{"train":["$ep/repo/train.parquet"],"test":["$ep/repo/test.parquet"]}}""") {
      (endpoint, fetches) =>
        val df = HuggingFace.read(spark, "user/ds", endpoint = endpoint, cacheDir = cache)
        assert(df.count() == 100)
        assert(df.agg(max("id")).head().getLong(0) == 79)
        val again = HuggingFace.read(spark, "user/ds", endpoint = endpoint, cacheDir = cache)
        assert(again.count() == 100)
        assert(fetches() == 2, "second read must be served from the cache")
    }
  }

  test("split filter restricts which files are staged") {
    val trainBytes = servedParquet("ftrain", 30)
    val testBytes = servedParquet("ftest", 7)
    val cache = "/tmp/graft_hf_spec_cache2"
    delete(cache)
    withHub(
      Map("/r/tr.parquet" -> trainBytes, "/r/te.parquet" -> testBytes),
      ep => s"""{"default":{"train":["$ep/r/tr.parquet"],"test":["$ep/r/te.parquet"]}}""") {
      (endpoint, fetches) =>
        val df = HuggingFace.read(spark, "user/ds2", endpoint = endpoint,
          split = Some("test"), cacheDir = cache)
        assert(df.count() == 7)
        assert(fetches() == 1, "train split must not be downloaded")
    }
  }

  test("listing failure raises, does not return an empty frame") {
    withHub(Map.empty, _ => "") { (endpoint, _) =>
      val e = intercept[Exception](
        HuggingFace.read(spark, "user/none", endpoint = endpoint + "/missing"))
      assert(e.getMessage.contains("failed") || e.getMessage.contains("no parquet"))
    }
  }
}
