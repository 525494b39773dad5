package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hugging Face dataset source — the `hf://datasets/{repo}` scheme (ref
  * `daft/io/huggingface/__init__.py:38` `read_huggingface`, which reads
  * the repo's auto-converted parquet). Resolution follows the PUBLIC
  * dataset-viewer API contract (huggingface.co/docs/dataset-viewer/
  * parquet): `GET {endpoint}/api/datasets/{repo}/parquet` returns
  * `{config: {split: [parquet urls]}}`, and the listed files are plain
  * parquet over HTTPS.
  *
  * Scale shape: the API call is driver-side planning (one tiny JSON);
  * file fetches are DISTRIBUTED — one Spark task per file, each task
  * streaming its URL to `cacheDir` with the lazy per-task HTTP client
  * pattern of [[graft.ops.UrlIO]] — then the staged files are read as
  * one parquet scan (pushdown/pruning as usual). Re-reads hit the
  * content-addressed cache and skip the network entirely.
  *
  * `cacheDir` must be storage every executor AND the driver can see: a
  * local path on local[*], a shared mount / fuse point on a cluster (the
  * same contract as any download-then-scan staging layer).
  *
  * `endpoint` exists so tests (and private hubs) can point at another
  * server; the default is the public hub. */
object HuggingFace {

  private def mapper = new ObjectMapper()

  /** Resolve the repo's parquet file URLs via the dataset-viewer API.
    * Returns (config, split, url) triples. */
  def listParquet(
      repo: String,
      endpoint: String = "https://huggingface.co",
      token: Option[String] = None): Seq[(String, String, String)] = {
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val req = {
      val b = HttpRequest.newBuilder(URI.create(s"$endpoint/api/datasets/$repo/parquet"))
        .timeout(Duration.ofSeconds(60)).GET()
      token.foreach(t => b.header("Authorization", s"Bearer $t"))
      b.build()
    }
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200,
      s"HF parquet listing for $repo failed: HTTP ${resp.statusCode()}")
    val root = mapper.readTree(resp.body())
    root.properties().asScala.flatMap { cfg =>
      cfg.getValue.properties().asScala.flatMap { split =>
        split.getValue.elements().asScala.map(u => (cfg.getKey, split.getKey, u.asText))
      }
    }.toSeq
  }

  /** Read a Hugging Face dataset (all configs/splits unless filtered),
    * e.g. `HuggingFace.read(spark, "username/dataset")`. */
  def read(
      spark: SparkSession,
      repo: String,
      endpoint: String = "https://huggingface.co",
      token: Option[String] = None,
      config: Option[String] = None,
      split: Option[String] = None,
      cacheDir: String = "/tmp/graft_hf_cache"): DataFrame = {
    val files = listParquet(repo, endpoint, token)
      .filter(f => config.forall(_ == f._1) && split.forall(_ == f._2))
    require(files.nonEmpty, s"no parquet files for $repo (config=$config split=$split)")
    val staged = stage(spark, files.map(_._3), token, cacheDir)
    spark.read.parquet(staged: _*)
  }

  /** Distributed download: one task per URL, lazily-initialized per-task
    * client, content-addressed target names (sha of the URL) so repeated
    * reads are cache hits and concurrent stagers can't collide. */
  private def stage(
      spark: SparkSession,
      urls: Seq[String],
      token: Option[String],
      cacheDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(cacheDir))
    val targets = urls.map(u => s"$cacheDir/${sha1(u)}.parquet")
    val todo = urls.zip(targets).filterNot { case (_, t) => Files.exists(Paths.get(t)) }
    if (todo.nonEmpty) {
      val tok = token
      spark.sparkContext
        .parallelize(todo, todo.size)
        .foreachPartition { it =>
          lazy val client = HttpClient.newBuilder()
            .followRedirects(HttpClient.Redirect.ALWAYS)
            .connectTimeout(Duration.ofSeconds(30)).build()
          it.foreach { case (url, target) =>
            val b = HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofMinutes(10)).GET()
            tok.foreach(t => b.header("Authorization", s"Bearer $t"))
            val tmp = Paths.get(target + s".tmp-${TaskContext.get().taskAttemptId()}")
            val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofFile(tmp))
            if (resp.statusCode() != 200) {
              Files.deleteIfExists(tmp)
              throw new java.io.IOException(s"HTTP ${resp.statusCode()} fetching $url")
            }
            try Files.move(tmp, Paths.get(target), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch { case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp) // concurrent stager won the race
            }
          }
        }
    }
    targets
  }

  private def sha1(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
