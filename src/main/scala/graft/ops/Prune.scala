package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-shuffle row pruning (builder brief) — the cheapest 100 TB win there
  * is: rows that cannot join are dropped at the SCAN side, before they pay
  * the shuffle write + network + sort of a fact⋈fact join.
  *
  * Spark's own runtime filters (`spark.sql.optimizer.runtimeFilter.*`) do
  * this opportunistically for some plan shapes; this operator is the
  * explicit form for when the build side is known-selective a priori
  * (e.g. "only orders placed this week" joined against the full history).
  */
object Prune {

  /** Inner equi-join `big ⋈ small` with a broadcast Bloom-filter prefilter
    * on the big side. The filter is built in one distributed aggregation
    * over `small` (driver holds only the merged ~MB-sized bitmap) and
    * broadcast; false positives only ever ADD non-matching rows that the
    * join itself then drops, so the result is exactly the plain join.
    * `expectedItems`/`fpp` size the bitmap (1% fpp ≈ 9.6 bits/key). */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf { (k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k)
    }
    big.filter(mightContain(col(bigKey).cast("long")))
      .join(small, big(bigKey) === small(smallKey))
  }
}
