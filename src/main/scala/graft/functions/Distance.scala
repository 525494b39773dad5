package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding distance/similarity namespace — mirrors the reference's
  * `daft/functions/distance.py` + `similarity.py`. Implemented with Spark
  * higher-order functions (`zip_with`/`aggregate`) over `array<float>`
  * columns, computed in double — no UDF serialization, stays inside
  * Catalyst so it can be pushed through projects/joins. */
object Distance {

  /** Σ aᵢ·bᵢ in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))

  /** Fused single-pass codegen variant for `array<float>` (see
    * [[graft.expressions.CosineSimilarityExpr]]) — bit-identical results,
    * one loop instead of three HOF aggregates; used on the dedup/ANN hot
    * path. */
  def cosineSimilarityNative(a: Column, b: Column): Column =
    graft.expressions.CosineSimilarityExpr.cosineSimilarity(a, b)

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Count of differing positions. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 0L).otherwise(1L)),
      lit(0L), (acc, x) => acc + x)

  /** Set-Jaccard over array elements. */
  def jaccardSimilarity(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Pearson correlation between two equal-length vectors. */
  def pearson(a: Column, b: Column): Column = {
    val n = size(a).cast("double")
    val sx = aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))
    val sy = aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double"))
    val sxx = dotProduct(a, a)
    val syy = dotProduct(b, b)
    val sxy = dotProduct(a, b)
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }
}
