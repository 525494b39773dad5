package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmInference

/** HTTP-backed LLM client: the full generate() path — prefix sort,
  * micro-batching, per-partition lazy client — against an in-process HTTP
  * endpoint (deterministic "model": reversed prompt). Only the model
  * server itself is external to this test. */
class LlmClientSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def withServer(handler: Seq[String] => String)(
      body: (String, java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/complete", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val root = mapper.readTree(ex.getRequestBody.readAllBytes())
        val arr = if (root.has("prompt")) root.get("prompt") else root.get("prompts")
        val prompts = (0 until arr.size()).map(i => arr.get(i).asText())
        val bytes = handler(prompts).getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/complete", requests)
    finally server.stop(0)
  }

  test("generate() round-trips batches via the lines protocol") {
    withServer(prompts =>
      prompts.map(p => p.replace("\n", "\\n").reverse).mkString("\n")
    ) { (endpoint, requests) =>
      val df = (1 to 100).map(i => (i.toLong, s"prompt$i")).toDF("id", "prompt")
        .repartition(4)
      val out = LlmInference.generate(
          df, "prompt", "resp",
          mkClient = () => new LlmInference.HttpCompletionClient(endpoint, protocol = "lines"),
          maxBatchSize = 16)
        .select(col("id"), col("resp")).orderBy("id").collect()
      assert(out.length == 100)
      out.foreach(r => assert(r.getString(1) == s"prompt${r.getLong(0)}".reverse))
      // micro-batching actually batched: far fewer requests than rows
      assert(requests.get() >= 100 / 16 && requests.get() < 50,
        s"requests=${requests.get()}")
    }
  }

  test("openai protocol: vLLM-shape JSON, index-ordered, newline-safe") {
    withServer { prompts =>
      val root = mapper.createObjectNode()
      val choices = root.putArray("choices")
      // deliberately out of order + embedded newlines: index must win
      prompts.zipWithIndex.reverse.foreach { case (p, i) =>
        val c = choices.addObject()
        c.put("index", i)
        c.put("text", s"out:\n$p")
      }
      mapper.writeValueAsString(root)
    } { (endpoint, _) =>
      val df = (1 to 40).map(i => (i.toLong, s"prompt$i")).toDF("id", "prompt")
        .repartition(3)
      val out = LlmInference.generate(
          df, "prompt", "resp",
          mkClient = () => new LlmInference.HttpCompletionClient(endpoint),
          maxBatchSize = 8)
        .select(col("id"), col("resp")).orderBy("id").collect()
      assert(out.length == 40)
      out.foreach(r => assert(r.getString(1) == s"out:\nprompt${r.getLong(0)}"))
    }
  }

  test("lines protocol: count mismatch is an error, not a silent shift") {
    withServer(prompts => prompts.map(_.reverse).mkString("\n") + "\nextra") {
      (endpoint, _) =>
        val client = new LlmInference.HttpCompletionClient(endpoint, protocol = "lines")
        val e = intercept[IllegalArgumentException](client.generate(Seq("a", "b")))
        assert(e.getMessage.contains("lines"))
    }
  }

  test("lines protocol unescapes \\n and \\\\ in single scan order") {
    withServer(_ => "a\\nb\\\\n") { (endpoint, _) =>
      val client = new LlmInference.HttpCompletionClient(endpoint, protocol = "lines")
      val out = client.generate(Seq("x"))
      assert(out == Seq("a\nb\\n"))
    }
  }
}
