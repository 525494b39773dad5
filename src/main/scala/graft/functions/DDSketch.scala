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

  /** Bucket-count state: positive values in log-γ buckets, zeros/negatives
    * tracked separately (standard DDSketch collapsing for non-positive). */
  case class Buf(counts: Map[Int, Long], zeroCount: Long, total: Long)

  class Agg(alpha: Double, q: Double) extends Aggregator[Double, Buf, Double] {
    private val gamma = (1 + alpha) / (1 - alpha)
    private val lnGamma = math.log(gamma)

    def zero: Buf = Buf(Map.empty, 0L, 0L)

    def reduce(b: Buf, x: Double): Buf =
      if (x <= 0 || x.isNaN) b.copy(zeroCount = b.zeroCount + 1, total = b.total + 1)
      else {
        val i = math.ceil(math.log(x) / lnGamma).toInt
        b.copy(counts = b.counts.updated(i, b.counts.getOrElse(i, 0L) + 1L),
          total = b.total + 1)
      }

    def merge(a: Buf, b: Buf): Buf = Buf(
      (a.counts.keySet ++ b.counts.keySet).iterator
        .map(k => k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L))).toMap,
      a.zeroCount + b.zeroCount,
      a.total + b.total)

    def finish(b: Buf): Double = {
      if (b.total == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(q * b.total).toLong)
      if (rank <= b.zeroCount) return 0.0
      var seen = b.zeroCount
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
