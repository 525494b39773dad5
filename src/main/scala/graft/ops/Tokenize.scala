package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-vocabulary tokenization (ref `daft/functions/str.py`
  * tokenize_encode:1086 / tokenize_decode:1129 — there backed by tiktoken
  * vocab files; here by a corpus-built vocabulary, the fully-distributed
  * equivalent used when training custom vocabs).
  *
  * encode: tokens → dense int ids via a frequency-ranked vocab (broadcast
  * join); decode: ids → tokens → text. Both stages are plain joins/HOFs, so
  * they scale with the corpus and the vocab stays a broadcast-sized dim
  * table (standard for ≤1M-entry vocabs). */
object Tokenize {

  /** Build a frequency-ranked vocabulary (id 0 = most frequent; ties by
    * token for determinism). Ranking uses the two-pass range-partition
    * scheme ([[Global.withGlobalRank]]) — an unpartitioned `Window.orderBy`
    * here would pull the entire distinct-token set through one task. */
  def buildVocab(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    Global.withGlobalRank(counts, Seq(col("freq").desc, col("token").asc), "__rk")
      .withColumn("token_id", (col("__rk") - 1).cast("int"))
      .select("token", "token_id", "freq")
  }

  /** text → array<int> of vocab ids (unknown tokens dropped, like a
    * filtered encode). */
  def encode(docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame = {
    val exploded = docs.select(
      col(idCol), posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "token")))
    exploded
      .join(broadcast(vocab.select("token", "token_id")), Seq("token"), "left")
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("ids"))
  }

  /** array<int> ids → text (inverse of encode for in-vocab tokens). */
  def decode(encoded: DataFrame, idCol: String, idsCol: String, vocab: DataFrame): DataFrame = {
    val exploded = encoded.select(
      col(idCol), posexplode(col(idsCol)).as(Seq("pos", "token_id")))
    exploded
      .join(broadcast(vocab.select("token", "token_id")), Seq("token_id"), "left")
      .groupBy(idCol)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          s => s.getField("token")),
        " ").as("decoded"))
  }
}
