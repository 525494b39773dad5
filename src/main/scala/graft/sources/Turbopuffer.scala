package graft.sources

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Turbopuffer vector-store writer over the PUBLIC HTTP API
  * (turbopuffer.com/docs/write, v2 wire shape) — ref `write_turbopuffer`
  * (`dataframe.py:2499`, `daft/io/turbopuffer/turbopuffer_data_sink.py`).
  * Mirrors the reference's document mapping: `id_column` renames to `id`,
  * `vector_column` to `vector`, every other column becomes an attribute.
  *
  * Scale shape: standard [[DataSink]] — each partition batches its own
  * `upsert_rows` POSTs from the executor (upserts are idempotent by id,
  * so per-batch retry is safe); the driver sees one row per partition.
  */
object Turbopuffer {

  private val om = new ObjectMapper

  final class Sink(
      endpoint: String,
      namespace: String,
      apiKey: String = "",
      idColumn: String = "id",
      vectorColumn: String = "vector",
      distanceMetric: String = "cosine_distance",
      batchRows: Int = 1000) extends DataSink {

    def name = s"turbopuffer:$namespace"

    def writePartition(pid: Int, rows: Iterator[Row], schema: StructType): WriteResult = {
      val idIdx = schema.fieldIndex(idColumn)
      val vecIdx = schema.fields.indexWhere(_.name == vectorColumn)
      val http = HttpClient.newHttpClient()
      var n = 0L
      var bytes = 0L
      rows.grouped(batchRows).foreach { batch =>
        val root = om.createObjectNode()
        root.put("distance_metric", distanceMetric)
        val arr = root.putArray("upsert_rows")
        batch.foreach { r =>
          val doc = arr.addObject()
          putValue(doc, "id", r.get(idIdx))
          if (vecIdx >= 0) putValue(doc, "vector", r.get(vecIdx))
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (i != idIdx && i != vecIdx) putValue(doc, f.name, r.get(i))
          }
          n += 1
        }
        val body = om.writeValueAsBytes(root)
        bytes += body.length
        val req = HttpRequest.newBuilder(URI.create(s"$endpoint/v2/namespaces/$namespace"))
          .header("Authorization", s"Bearer $apiKey")
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"turbopuffer upsert -> HTTP ${resp.statusCode()}: ${resp.body()}")
      }
      WriteResult(pid, n, bytes, s"$endpoint/v2/namespaces/$namespace")
    }
  }

  private def putValue(doc: ObjectNode, name: String, v: Any): Unit = v match {
    case null => doc.putNull(name)
    case l: Long => doc.put(name, l)
    case i: Int => doc.put(name, i)
    case d: Double => doc.put(name, d)
    case f: Float => doc.put(name, f.toDouble)
    case b: Boolean => doc.put(name, b)
    case s: scala.collection.Seq[_] =>
      val a = doc.putArray(name)
      s.foreach {
        case x: Float => a.add(x.toDouble)
        case x: Double => a.add(x)
        case x: Long => a.add(x)
        case x: Int => a.add(x)
        case x => a.add(String.valueOf(x))
      }
    case other => doc.put(name, String.valueOf(other))
  }

  /** Top-k query against a namespace (`POST /v2/namespaces/:ns/query`,
    * `rank_by: ["vector", "ANN", q]`) — returns (id, distance) pairs.
    * Validation-scale readback for round-trip checks. */
  def queryTopK(endpoint: String, namespace: String, q: Seq[Double], k: Int,
      apiKey: String = ""): Seq[(Long, Double)] = {
    val root = om.createObjectNode()
    val rb = root.putArray("rank_by")
    rb.add("vector"); rb.add("ANN")
    val qv = rb.addArray(); q.foreach(qv.add)
    root.put("top_k", k)
    val http = HttpClient.newHttpClient()
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"$endpoint/v2/namespaces/$namespace/query"))
        .header("Authorization", s"Bearer $apiKey")
        .POST(HttpRequest.BodyPublishers.ofByteArray(om.writeValueAsBytes(root))).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"query -> ${resp.statusCode()}: ${resp.body()}")
    om.readTree(resp.body()).get("rows").elements().asScala.map { r =>
      (r.get("id").asLong, r.get("$dist").asDouble)
    }.toSeq
  }

  /** In-process stub implementing the same public wire shape (MiniBroker
    * pattern): bearer-auth check, upsert-by-id semantics, exact ANN
    * scoring for cosine_distance / euclidean_squared. */
  final class MiniTurbopuffer(requiredKey: String = "") extends AutoCloseable {
    // namespace → (id → (vector, attributes json))
    private val spaces =
      new ConcurrentHashMap[String, ConcurrentHashMap[Long, (Array[Double], ObjectNode)]]()
    @volatile private var metric = "cosine_distance"
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def size(ns: String): Int = Option(spaces.get(ns)).map(_.size).getOrElse(0)

    server.createContext("/v2/namespaces", (ex: HttpExchange) => {
      try {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        require(requiredKey.isEmpty || auth == s"Bearer $requiredKey", "unauthorized")
        val path = ex.getRequestURI.getPath.stripPrefix("/v2/namespaces/")
        val body = om.readTree(ex.getRequestBody.readAllBytes())
        val out =
          if (path.endsWith("/query")) query(path.stripSuffix("/query"), body)
          else upsert(path, body)
        val b = om.writeValueAsBytes(out)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      } catch {
        case e: Throwable =>
          val b = s"""{"error":"${e.getMessage}"}""".getBytes(UTF_8)
          ex.sendResponseHeaders(
            if (e.getMessage != null && e.getMessage.contains("unauthorized")) 401 else 400,
            b.length)
          ex.getResponseBody.write(b)
      } finally ex.close()
    })
    server.start()

    private def upsert(ns: String, body: JsonNode): ObjectNode = {
      Option(body.get("distance_metric")).foreach(m => metric = m.asText)
      val space = spaces.computeIfAbsent(ns, _ => new ConcurrentHashMap())
      val rows = body.get("upsert_rows")
      require(rows != null && rows.isArray, "upsert_rows required")
      rows.elements().asScala.foreach { r =>
        val id = Option(r.get("id")).map(_.asLong)
          .getOrElse(throw new IllegalArgumentException("document missing id"))
        val vec = Option(r.get("vector"))
          .map(_.elements().asScala.map(_.asDouble).toArray)
          .getOrElse(Array.emptyDoubleArray)
        val attrs = om.createObjectNode()
        r.properties().asScala.foreach { e =>
          if (e.getKey != "id" && e.getKey != "vector")
            attrs.set[JsonNode](e.getKey, e.getValue)
        }
        space.put(id, (vec, attrs)) // upsert: same id replaces
      }
      om.createObjectNode().put("status", "OK")
    }

    private def query(ns: String, body: JsonNode): ObjectNode = {
      val space = Option(spaces.get(ns))
        .getOrElse(throw new IllegalArgumentException(s"namespace $ns not found"))
      val rb = body.get("rank_by")
      require(rb != null && rb.get(0).asText == "vector" && rb.get(1).asText == "ANN",
        "only rank_by [vector, ANN, q] supported")
      val q = rb.get(2).elements().asScala.map(_.asDouble).toArray
      val k = Option(body.get("top_k")).map(_.asInt).getOrElse(10)
      val scored = space.asScala.toSeq.map { case (id, (v, _)) =>
        (id, distance(q, v))
      }.sortBy { case (id, d) => (d, id) }.take(k)
      val root = om.createObjectNode()
      val rows = root.putArray("rows")
      scored.foreach { case (id, d) =>
        val r = rows.addObject(); r.put("id", id); r.put("$dist", d)
      }
      root
    }

    private def distance(a: Array[Double], b: Array[Double]): Double = {
      require(a.length == b.length, s"dim mismatch ${a.length} vs ${b.length}")
      metric match {
        case "euclidean_squared" =>
          a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        case _ => // cosine_distance
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          val na = math.sqrt(a.map(x => x * x).sum)
          val nb = math.sqrt(b.map(x => x * x).sum)
          if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (na * nb)
      }
    }

    override def close(): Unit = server.stop(0)
  }
}
