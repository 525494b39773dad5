package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch LLM-inference projection — the reference's `VLLMProject`
  * (`src/daft-logical-plan/src/ops/vllm.rs`, `Expr::VLLM`
  * `src/daft-dsl/src/expr/mod.rs:306` with prefix-routing/batching knobs)
  * re-expressed as a Spark operator:
  *
  *  - rows are sorted within partitions by prompt so shared prefixes are
  *    adjacent (the prefix-cache routing knob),
  *  - grouped into micro-batches of `maxBatchSize` (the batching knob),
  *  - each batch goes through a per-partition lazily-initialized client
  *    (the actor-pool execution shape — one client per executor core, not
  *    per row).
  *
  * The client here is a deterministic STUB (no inference endpoint in this
  * environment); a real deployment swaps `StubClient` for an HTTP/vLLM
  * client with async pipelining inside the same partition loop.
  */
object LlmInference {

  trait Client extends Serializable {
    /** Generate one response per prompt; called once per micro-batch. */
    def generate(prompts: Seq[String]): Seq[String]
  }

  /** Deterministic stand-in: echoes a "summary" (first `k` tokens) plus a
    * token count — stable across runs so pipelines are testable. */
  final class StubClient(k: Int) extends Client {
    def generate(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      if (p == null) null
      else {
        val toks = p.trim.split("\\s+")
        s"${toks.take(k).mkString(" ")} [${toks.length} tokens]"
      }
    }
  }

  /** Real HTTP completion client. Two wire protocols:
    *
    *  - `protocol = "openai"` (default): OpenAI/vLLM completions JSON —
    *    POST `{"model":…, "prompt":[…]}` and read
    *    `{"choices":[{"index":i,"text":…},…]}`, ordering by `index`, so a
    *    stock vLLM endpoint works unmodified and embedded newlines in
    *    completions are unambiguous.
    *  - `protocol = "lines"`: newline framing for trivial servers — the
    *    server MUST return exactly one line per prompt with any embedded
    *    newlines escaped as `\n` (unescaped on receipt); a count mismatch
    *    is an error, never a silent row/response shift.
    *
    * Lazily built per partition; a per-batch POST is the pipelining unit.
    * Tested against an in-process HTTP server (LlmClientSpec) in both
    * framings — only the model server itself is external. */
  final class HttpCompletionClient(
      endpoint: String,
      protocol: String = "openai",
      model: String = "default",
      timeoutSec: Long = 60) extends Client {
    require(protocol == "openai" || protocol == "lines", s"protocol=$protocol")
    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    // single-scan unescape: \n → newline, \\ → backslash (a naive pair of
    // String.replace calls corrupts "\\n" — escaped backslash + n).
    private def unescapeLine(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def post(body: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"LLM endpoint HTTP ${resp.statusCode()}")
      resp.body()
    }

    def generate(prompts: Seq[String]): Seq[String] = {
      val root = mapper.createObjectNode()
      root.put("model", model)
      val arr = root.putArray(if (protocol == "openai") "prompt" else "prompts")
      prompts.foreach(p => arr.add(Option(p).getOrElse("")))
      val body = post(mapper.writeValueAsString(root))
      if (protocol == "openai") {
        val choices = mapper.readTree(body).path("choices")
        require(choices.isArray && choices.size() == prompts.length,
          s"endpoint returned ${choices.size()} choices for ${prompts.length} prompts")
        val out = new Array[String](prompts.length)
        choices.forEach { c =>
          val i = if (c.has("index")) c.get("index").asInt() else -1
          require(i >= 0 && i < out.length && out(i) == null,
            s"bad/duplicate choice index $i")
          out(i) = c.path("text").asText()
        }
        out.toSeq
      } else {
        val lines = body.split("\n", -1).toSeq
        require(lines.length == prompts.length,
          s"endpoint returned ${lines.length} lines for ${prompts.length} prompts" +
            " (lines protocol requires exactly one escaped line per prompt)")
        lines.map(unescapeLine)
      }
    }
  }

  def generate(
      df: DataFrame,
      promptCol: String,
      outCol: String,
      mkClient: () => Client = () => new StubClient(5),
      maxBatchSize: Int = 32,
      prefixRoute: Boolean = true): DataFrame = {
    val sortedDf =
      if (prefixRoute) df.sortWithinPartitions(promptCol) else df
    val schema = StructType(sortedDf.schema.fields :+ StructField(outCol, StringType))
    val enc = Encoders.row(schema)
    val idx = sortedDf.schema.fieldIndex(promptCol)
    sortedDf.mapPartitions { rows =>
      lazy val client = mkClient() // one client per partition, built lazily
      rows.grouped(maxBatchSize).flatMap { batch =>
        val responses = client.generate(batch.map(_.getString(idx)))
        batch.lazyZip(responses).map((r, resp) => Row.fromSeq(r.toSeq :+ resp))
      }
    }(enc)
  }
}
