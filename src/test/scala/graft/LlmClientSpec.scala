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

  test("generate() round-trips batches through a real HTTP endpoint") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/complete", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        // parse {"prompts":["a","b",...]} minimally; respond one line each
        val prompts = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findAllMatchIn(body.dropWhile(_ != '[')).map(_.group(1)).toSeq
        val out = prompts.map(p => p.replace("\\n", " ").reverse).mkString("\n")
        val bytes = out.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/v1/complete"
      val df = (1 to 100).map(i => (i.toLong, s"prompt$i")).toDF("id", "prompt")
        .repartition(4)
      val out = LlmInference.generate(
          df, "prompt", "resp",
          mkClient = () => new LlmInference.HttpCompletionClient(endpoint),
          maxBatchSize = 16)
        .select(col("id"), col("resp")).orderBy("id").collect()
      assert(out.length == 100)
      out.foreach(r => assert(r.getString(1) == s"prompt${r.getLong(0)}".reverse))
      // micro-batching actually batched: far fewer requests than rows
      assert(requests.get() >= 100 / 16 && requests.get() < 50,
        s"requests=${requests.get()}")
    } finally server.stop(0)
  }
}
