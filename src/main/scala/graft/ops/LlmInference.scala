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

  /** Real HTTP completion client (OpenAI-/vLLM-completions shape): POSTs a
    * JSON batch to `endpoint`, expects one completion line per prompt in
    * the response body. Lazily built per partition; a per-batch POST is
    * the pipelining unit. Tested against an in-process HTTP server
    * (LlmClientSpec) — only the model server itself is external. */
  final class HttpCompletionClient(
      endpoint: String, timeoutSec: Long = 60) extends Client {
    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    private def esc(s: String) =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def generate(prompts: Seq[String]): Seq[String] = {
      val body = prompts.map(p => s""""${esc(Option(p).getOrElse(""))}"""")
        .mkString("""{"prompts":[""", ",", "]}")
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"LLM endpoint HTTP ${resp.statusCode()}")
      val lines = resp.body().split("\n", -1).toSeq
      require(lines.length >= prompts.length,
        s"endpoint returned ${lines.length} completions for ${prompts.length} prompts")
      lines.take(prompts.length)
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
