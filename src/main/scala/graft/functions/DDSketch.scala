package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** DDSketch-style mergeable quantile sketch (ref AggExpr::ApproxSketch /
  * MergeSketch — the reference's sketch pair; algorithm from the public
  * DDSketch paper, Masson et al., VLDB 2019): log-γ bucketing gives a
  * RELATIVE-error guarantee |est/true - 1| ≤ α for any quantile, and the
  * sketch is a bucket-count map, so merging = summing counts — exactly
  * what Spark's partial aggregation needs for map-side combine.
  *
  * Scale shape: each partition folds its rows into a local sketch
  * (`reduce`), partials merge associatively (`merge`) — the same
  * partial/merge split Catalyst gives HLL/approx_percentile. Sketch size
  * is O(log(max/min)/α) buckets regardless of row count. */
object DDSketch {

  /** Bucket-count state: positive values in log-γ buckets, a mirrored
    * negative store (log-γ buckets over |x|, standard DDSketch two-store
    * layout), and an exact zero count — the relative-error guarantee
    * holds for negative data too. */
  case class Buf(counts: Map[Int, Long], negCounts: Map[Int, Long],
      zeroCount: Long, total: Long)

  class Agg(alpha: Double, q: Double) extends Aggregator[Double, Buf, Double] {
    private val gamma = (1 + alpha) / (1 - alpha)
    private val lnGamma = math.log(gamma)

    def zero: Buf = Buf(Map.empty, Map.empty, 0L, 0L)

    private def bucket(mag: Double): Int =
      math.ceil(math.log(mag) / lnGamma).toInt

    def reduce(b: Buf, x: Double): Buf =
      if (x == 0 || x.isNaN) b.copy(zeroCount = b.zeroCount + 1, total = b.total + 1)
      else if (x > 0) {
        val i = bucket(x)
        b.copy(counts = b.counts.updated(i, b.counts.getOrElse(i, 0L) + 1L),
          total = b.total + 1)
      } else {
        val i = bucket(-x)
        b.copy(negCounts = b.negCounts.updated(i, b.negCounts.getOrElse(i, 0L) + 1L),
          total = b.total + 1)
      }

    private def mergeMaps(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

    def merge(a: Buf, b: Buf): Buf = Buf(
      mergeMaps(a.counts, b.counts),
      mergeMaps(a.negCounts, b.negCounts),
      a.zeroCount + b.zeroCount,
      a.total + b.total)

    def finish(b: Buf): Double = {
      if (b.total == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(q * b.total).toLong)
      // Value order: negatives (descending bucket index = most-negative
      // first), then zeros, then positives (ascending bucket index).
      var seen = 0L
      for (i <- b.negCounts.keys.toSeq.sorted(Ordering[Int].reverse)) {
        seen += b.negCounts(i)
        if (seen >= rank) return -2 * math.pow(gamma, i) / (gamma + 1)
      }
      seen += b.zeroCount
      if (seen >= rank) return 0.0
      for (i <- b.counts.keys.toSeq.sorted) {
        seen += b.counts(i)
        if (seen >= rank) return 2 * math.pow(gamma, i) / (gamma + 1)
      }
      Double.NaN // unreachable: counts sum to total
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: approximate quantile `q` with relative accuracy `alpha`. */
  def sketchQuantile(c: Column, q: Double, alpha: Double = 0.01): Column =
    udaf(new Agg(alpha, q)).apply(c)
}
