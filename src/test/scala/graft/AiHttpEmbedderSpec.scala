package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ai

/** OpenAI-compatible `/v1/embeddings` client conformance (ref
  * `daft/ai/openai/` provider protocol): request wire shape, index-based
  * re-ordering, count/index anomaly handling, dimensions enforcement, and
  * the batched per-partition execution path through Ai.embedText — all
  * against an in-process HTTP server. Only the model itself is external. */
class AiHttpEmbedderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Server computing embedding[j] = f(text, j) for an inspectable f. */
  private def withServer(
      respond: (Seq[String], com.fasterxml.jackson.databind.node.ObjectNode,
        com.fasterxml.jackson.databind.ObjectMapper) => String)(
      body: (String, java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val root = mapper.readTree(ex.getRequestBody.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val in = root.get("input")
        val texts = (0 until in.size()).map(i => in.get(i).asText())
        val out = respond(texts, root, mapper)
        val bytes = out.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings", requests)
    finally server.stop(0)
  }

  /** Deterministic fake model: emb(text) = [len, hash%7, 1] normalized-ish
    * (values just need to be recognizable per input). */
  private def fakeEmb(t: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (t.length * (j + 1)).toFloat)

  private def okResponse(texts: Seq[String], dim: Int, reverse: Boolean,
      m: com.fasterxml.jackson.databind.ObjectMapper): String = {
    val resp = m.createObjectNode()
    val data = resp.putArray("data")
    val ordered = texts.zipWithIndex
    (if (reverse) ordered.reverse else ordered).foreach { case (t, i) =>
      val d = data.addObject()
      d.put("index", i)
      val e = d.putArray("embedding")
      fakeEmb(t, dim).foreach(e.add)
    }
    m.writeValueAsString(resp)
  }

  test("request carries model, encoding_format, dimensions and input array") {
    var seen: Option[(String, String, Int, Int)] = None
    withServer { (texts, root, m) =>
      seen = Some((root.get("model").asText(), root.get("encoding_format").asText(),
        root.get("dimensions").asInt(), texts.length))
      okResponse(texts, 3, reverse = false, m)
    } { (endpoint, _) =>
      val c = new Ai.HttpTextEmbedder(endpoint, 3, model = "m-test")
      c.embedBatch(Seq("ab", "cdef"))
      assert(seen.contains(("m-test", "float", 3, 2)))
    }
  }

  test("data returned out of order is re-ordered by index") {
    withServer((t, _, m) => okResponse(t, 4, reverse = true, m)) { (endpoint, _) =>
      val c = new Ai.HttpTextEmbedder(endpoint, 4)
      val out = c.embedBatch(Seq("a", "bbb", "cc"))
      assert(out.map(_.toSeq) == Seq("a", "bbb", "cc").map(fakeEmb(_, 4).toSeq))
    }
  }

  test("count mismatch is an error, not a silent shift") {
    withServer((t, _, m) => okResponse(t.drop(1), 4, reverse = false, m)) {
      (endpoint, _) =>
        val c = new Ai.HttpTextEmbedder(endpoint, 4)
        val e = intercept[IllegalArgumentException](c.embedBatch(Seq("a", "b")))
        assert(e.getMessage.contains("embeddings for"))
    }
  }

  test("duplicate index is an error") {
    withServer { (texts, _, m) =>
      val resp = m.createObjectNode()
      val data = resp.putArray("data")
      texts.foreach { t =>
        val d = data.addObject()
        d.put("index", 0) // every row claims slot 0
        val e = d.putArray("embedding")
        fakeEmb(t, 2).foreach(e.add)
      }
      m.writeValueAsString(resp)
    } { (endpoint, _) =>
      val c = new Ai.HttpTextEmbedder(endpoint, 2)
      val e = intercept[IllegalArgumentException](c.embedBatch(Seq("a", "b")))
      assert(e.getMessage.contains("index"))
    }
  }

  test("dimension mismatch is an error") {
    withServer((t, _, m) => okResponse(t, 5, reverse = false, m)) { (endpoint, _) =>
      val c = new Ai.HttpTextEmbedder(endpoint, 8)
      val e = intercept[IllegalArgumentException](c.embedBatch(Seq("a")))
      assert(e.getMessage.contains("dims"))
    }
  }

  test("HTTP error status surfaces as IOException") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(503, -1); ex.close()
      }
    })
    server.start()
    try {
      val c = new Ai.HttpTextEmbedder(
        s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings", 2)
      val e = intercept[java.io.IOException](c.embedBatch(Seq("a")))
      assert(e.getMessage.contains("503"))
    } finally server.stop(0)
  }

  test("embedText over HTTP micro-batches (requests << rows) and matches local") {
    withServer { (texts, _, m) =>
      val resp = m.createObjectNode()
      val data = resp.putArray("data")
      val local = new Ai.HashingEmbedder(16)
      local.embedBatch(texts).zipWithIndex.reverse.foreach { case (v, i) =>
        val d = data.addObject()
        d.put("index", i)
        val e = d.putArray("embedding")
        v.foreach(e.add)
      }
      m.writeValueAsString(resp)
    } { (endpoint, requests) =>
      val df = (1 to 96).map(i => (i.toLong, s"doc words $i")).toDF("id", "text")
        .repartition(3)
      val viaHttp = Ai.embedText(df, "text", "e_http",
        new Ai.HttpTextEmbedder(endpoint, 16), batchSize = 16)
      val both = Ai.embedText(viaHttp, "text", "e_local", new Ai.HashingEmbedder(16))
      val rows = both.select(col("id"), (col("e_http") === col("e_local")).as("ok"))
        .collect()
      assert(rows.length == 96 && rows.forall(_.getBoolean(1)))
      // 96 rows / batch 16 = 6 requests minimum; far fewer than row count
      assert(requests.get() >= 6 && requests.get() < 48, s"requests=${requests.get()}")
    }
  }
}
