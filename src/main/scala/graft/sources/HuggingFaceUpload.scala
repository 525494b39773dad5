package graft.sources

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hugging Face dataset UPLOAD — ref `write_huggingface`
  * (`dataframe.py:2598`, `daft/io/huggingface/sink.py`), implemented
  * against the two PUBLISHED protocols the hub client uses underneath:
  * the git-lfs batch API (git-lfs.github.com/spec — `objects/batch` →
  * presigned upload hrefs) and the hub commit API
  * (`POST /api/datasets/{repo}/commit/{rev}`, NDJSON with `header` /
  * `lfsFile` / `deletedFile` entries).
  *
  * Scale shape mirrors the reference sink exactly: parquet bytes are
  * written and LFS-UPLOADED BY EXECUTOR TASKS (one per part file, sha256
  * streamed, content goes straight executor→storage); the driver's
  * finalize is ONE metadata commit listing (path, oid, size) triples —
  * KBs of JSON regardless of data volume. `overwrite` lists the split's
  * existing files via the tree API and deletes them in the same atomic
  * commit, exactly like the reference's finalize.
  */
object HuggingFaceUpload {

  private val om = new ObjectMapper

  private def sha256Hex(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Upload `df` as parquet files under `dataDir/` in the dataset repo,
    * one atomic commit. Returns the reference sink's output schema:
    * (path_in_repo, operation, src_path_in_repo). */
  def upload(
      df: DataFrame,
      repo: String,
      endpoint: String,
      token: Option[String] = None,
      revision: String = "main",
      dataDir: String = "data",
      split: String = "train",
      overwrite: Boolean = false,
      commitMessage: String = "graft write_huggingface",
      stagingRoot: String = "/tmp/graft_hf_stage"): DataFrame = {
    val spark = df.sparkSession
    val uploadId = UUID.randomUUID().toString
    val staging = s"$stagingRoot/$uploadId"
    df.write.parquet(staging)
    try {
      val parts = Files.list(Paths.get(staging)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
      val plan = parts.zipWithIndex.map { case (p, i) =>
        (p.toString, s"$dataDir/$split-$uploadId-$i.parquet")
      }

      // executor-side: sha256 + LFS batch + content PUT, one task per file
      val tok = token
      val ep = endpoint
      val rp = repo
      val uploaded: Seq[(String, String, Long)] = spark.sparkContext
        .parallelize(plan, math.max(plan.size, 1))
        .map { case (local, pathInRepo) =>
          val p = Paths.get(local)
          val oid = sha256Hex(p)
          val size = Files.size(p)
          val client = HttpClient.newHttpClient()
          val batchReq = om.createObjectNode()
          batchReq.put("operation", "upload")
          batchReq.putArray("transfers").add("basic")
          val obj = batchReq.putArray("objects").addObject()
          obj.put("oid", oid); obj.put("size", size)
          val bb = HttpRequest.newBuilder(
              URI.create(s"$ep/datasets/$rp.git/info/lfs/objects/batch"))
            .header("Content-Type", "application/vnd.git-lfs+json")
          tok.foreach(t => bb.header("Authorization", s"Bearer $t"))
          val batchResp = client.send(
            bb.POST(HttpRequest.BodyPublishers.ofByteArray(om.writeValueAsBytes(batchReq)))
              .build(),
            HttpResponse.BodyHandlers.ofString())
          require(batchResp.statusCode() == 200,
            s"lfs batch -> HTTP ${batchResp.statusCode()}: ${batchResp.body()}")
          val action = om.readTree(batchResp.body()).get("objects").get(0).get("actions")
          // no actions → the hub already has this content (dedupe): skip PUT
          if (action != null && action.has("upload")) {
            val href = action.get("upload").get("href").asText
            val putResp = client.send(
              HttpRequest.newBuilder(URI.create(href))
                .PUT(HttpRequest.BodyPublishers.ofFile(p)).build(),
              HttpResponse.BodyHandlers.ofString())
            require(putResp.statusCode() == 200,
              s"lfs upload -> HTTP ${putResp.statusCode()}: ${putResp.body()}")
          }
          (pathInRepo, oid, size)
        }.collect().toSeq

      // driver-side finalize: optional overwrite deletes + ONE commit
      val deletes: Seq[String] =
        if (!overwrite) Nil
        else listTree(endpoint, repo, revision, dataDir, token)
          .filter(_.startsWith(s"$dataDir/$split-"))

      val lines = new StringBuilder
      val header = om.createObjectNode()
      header.put("key", "header")
      header.putObject("value").put("summary", commitMessage)
      lines.append(om.writeValueAsString(header)).append('\n')
      uploaded.foreach { case (path, oid, size) =>
        val n = om.createObjectNode()
        n.put("key", "lfsFile")
        val v = n.putObject("value")
        v.put("path", path); v.put("algo", "sha256"); v.put("oid", oid); v.put("size", size)
        lines.append(om.writeValueAsString(n)).append('\n')
      }
      deletes.foreach { path =>
        val n = om.createObjectNode()
        n.put("key", "deletedFile")
        n.putObject("value").put("path", path)
        lines.append(om.writeValueAsString(n)).append('\n')
      }
      val client = HttpClient.newHttpClient()
      val cb = HttpRequest.newBuilder(
          URI.create(s"$endpoint/api/datasets/$repo/commit/$revision"))
        .header("Content-Type", "application/x-ndjson")
      token.foreach(t => cb.header("Authorization", s"Bearer $t"))
      val commitResp = client.send(
        cb.POST(HttpRequest.BodyPublishers.ofString(lines.toString)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(commitResp.statusCode() == 200,
        s"hf commit -> HTTP ${commitResp.statusCode()}: ${commitResp.body()}")

      import spark.implicits._
      (uploaded.map(u => (u._1, "ADD", null: String)) ++
        deletes.map(d => (d, "DELETE", null: String)))
        .toDF("path_in_repo", "operation", "src_path_in_repo")
    } finally PartitionedFiles.deleteRecursively(Paths.get(staging))
  }

  private def listTree(endpoint: String, repo: String, revision: String,
      path: String, token: Option[String]): Seq[String] = {
    val client = HttpClient.newHttpClient()
    val b = HttpRequest.newBuilder(
      URI.create(s"$endpoint/api/datasets/$repo/tree/$revision/$path")).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404) Nil // split not written yet
    else {
      require(resp.statusCode() == 200, s"hf tree -> HTTP ${resp.statusCode()}")
      om.readTree(resp.body()).elements().asScala
        .filter(n => n.get("type").asText == "file")
        .map(_.get("path").asText).toSeq
    }
  }

  /** In-process hub stub implementing the subset of the published APIs
    * the writer and `HuggingFace.read` touch (MiniBroker pattern):
    * git-lfs batch with content dedupe, sha256-VERIFIED uploads, atomic
    * NDJSON commits that reject unknown oids, the tree listing, the
    * dataset-viewer parquet listing, and blob serving. */
  final class MiniHub(requiredToken: String = "") extends AutoCloseable {
    private val blobs = new ConcurrentHashMap[String, Array[Byte]]() // oid → bytes
    // repo → (path → oid)
    private val repos = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
    @volatile private var commitCount = 0
    def commits: Int = commitCount
    def blobCount: Int = blobs.size
    def files(repo: String): Map[String, String] =
      Option(repos.get(repo)).map(_.asScala.toMap).getOrElse(Map.empty)

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
        ct: String = "application/json"): Unit = {
      ex.getResponseHeaders.add("Content-Type", ct)
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

    private def authorized(ex: HttpExchange): Boolean =
      requiredToken.isEmpty ||
        Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains(s"Bearer $requiredToken")

    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        (ex.getRequestMethod, path) match {
          case ("PUT", p) if p.startsWith("/lfs/") =>
            val oid = p.stripPrefix("/lfs/")
            val bytes = ex.getRequestBody.readAllBytes()
            val got = MessageDigest.getInstance("SHA-256").digest(bytes)
              .map(b => f"$b%02x").mkString
            if (got != oid)
              respond(ex, 400, s"""{"error":"sha256 mismatch: $got != $oid"}""".getBytes(UTF_8))
            else { blobs.put(oid, bytes); respond(ex, 200, Array.emptyByteArray) }
          case ("GET", p) if p.startsWith("/lfs/") =>
            Option(blobs.get(p.stripPrefix("/lfs/"))) match {
              case Some(b) => respond(ex, 200, b, "application/octet-stream")
              case None => respond(ex, 404, """{"error":"no such blob"}""".getBytes(UTF_8))
            }
          case ("POST", p) if p.endsWith(".git/info/lfs/objects/batch") =>
            if (!authorized(ex)) respond(ex, 401, """{"error":"unauthorized"}""".getBytes(UTF_8))
            else {
              val req = om.readTree(ex.getRequestBody.readAllBytes())
              require(req.get("operation").asText == "upload", "only upload supported")
              val out = om.createObjectNode()
              out.put("transfer", "basic")
              val arr = out.putArray("objects")
              req.get("objects").elements().asScala.foreach { o =>
                val oid = o.get("oid").asText
                val on = arr.addObject()
                on.put("oid", oid); on.put("size", o.get("size").asLong)
                if (!blobs.containsKey(oid)) // dedupe: known content needs no upload
                  on.putObject("actions").putObject("upload")
                    .put("href", s"$endpoint/lfs/$oid")
              }
              respond(ex, 200, om.writeValueAsBytes(out))
            }
          case ("POST", CommitPath(repo, _)) =>
            if (!authorized(ex)) respond(ex, 401, """{"error":"unauthorized"}""".getBytes(UTF_8))
            else {
              val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
              val entries = body.split("\n").filter(_.trim.nonEmpty).map(om.readTree).toSeq
              require(entries.headOption.exists(_.get("key").asText == "header"),
                "first NDJSON entry must be the header")
              val files = repos.computeIfAbsent(repo, _ => new ConcurrentHashMap())
              // validate everything BEFORE mutating: commits are atomic
              entries.tail.foreach { e =>
                e.get("key").asText match {
                  case "lfsFile" =>
                    val oid = e.get("value").get("oid").asText
                    require(blobs.containsKey(oid), s"unknown lfs oid $oid (preupload first)")
                  case "deletedFile" => ()
                  case other => throw new IllegalArgumentException(s"unsupported entry $other")
                }
              }
              entries.tail.foreach { e =>
                val v = e.get("value")
                e.get("key").asText match {
                  case "lfsFile" => files.put(v.get("path").asText, v.get("oid").asText)
                  case "deletedFile" => files.remove(v.get("path").asText)
                }
              }
              commitCount += 1
              respond(ex, 200,
                s"""{"commitOid":"${UUID.randomUUID()}"}""".getBytes(UTF_8))
            }
          case ("GET", TreePath(repo, _, prefix)) =>
            val files = Option(repos.get(repo)).map(_.asScala).getOrElse(Map.empty)
            val hits = files.keys.filter(_.startsWith(prefix + "/")).toSeq.sorted
            if (hits.isEmpty) respond(ex, 404, """{"error":"not found"}""".getBytes(UTF_8))
            else {
              val arr = om.createArrayNode()
              hits.foreach { p =>
                val n = arr.addObject(); n.put("path", p); n.put("type", "file")
              }
              respond(ex, 200, om.writeValueAsBytes(arr))
            }
          case ("GET", ParquetPath(repo)) =>
            val files = Option(repos.get(repo)).map(_.asScala).getOrElse(Map.empty)
            val out = om.createObjectNode()
            val cfg = out.putObject("default")
            files.toSeq.sortBy(_._1).foreach { case (p, oid) =>
              if (p.endsWith(".parquet")) {
                // data/{split}-{uuid}-{i}.parquet → split
                val base = p.substring(p.lastIndexOf('/') + 1)
                val split = base.takeWhile(_ != '-')
                val arr = Option(cfg.get(split)).map(_.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode])
                  .getOrElse(cfg.putArray(split))
                arr.add(s"$endpoint/lfs/$oid")
              }
            }
            respond(ex, 200, om.writeValueAsBytes(out))
          case (m, p) =>
            respond(ex, 404, s"""{"error":"no route $m $p"}""".getBytes(UTF_8))
        }
      } catch {
        case e: Throwable =>
          respond(ex, 400, s"""{"error":"${Option(e.getMessage).getOrElse(e.toString).replace("\"", "'")}"}""".getBytes(UTF_8))
      }
    })
    server.start()

    private object CommitPath {
      private val Re = """/api/datasets/([\w\-./]+)/commit/([\w\-.]+)""".r
      def unapply(p: String): Option[(String, String)] =
        p match { case Re(r, rev) => Some((r, rev)); case _ => None }
    }
    private object TreePath {
      private val Re = """/api/datasets/([\w\-.]+/[\w\-.]+)/tree/([\w\-.]+)/(.+)""".r
      def unapply(p: String): Option[(String, String, String)] =
        p match { case Re(r, rev, pre) => Some((r, rev, pre)); case _ => None }
    }
    private object ParquetPath {
      private val Re = """/api/datasets/([\w\-.]+/[\w\-.]+)/parquet""".r
      def unapply(p: String): Option[String] =
        p match { case Re(r) => Some(r); case _ => None }
    }

    override def close(): Unit = server.stop(0)
  }
}
