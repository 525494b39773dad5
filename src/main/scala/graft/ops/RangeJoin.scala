package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points ⋈ intervals on
  * `start ≤ point ≤ end` — an operator class Spark plans as
  * BroadcastNestedLoopJoin/CartesianProduct (O(n·m) compares, broadcast-
  * bound) because an inequality gives the planner no equi-key.
  *
  * Scalable shape (composition over custom planner machinery, per the
  * build preference order): quantize the domain into fixed-width buckets.
  * Each interval explodes to the buckets it overlaps, each point maps to
  * exactly ONE bucket, and the join becomes a plain shuffle equi-join on
  * the bucket id with an exact predicate re-check — the standard spatial
  * binning/interval-index layout. Shuffle volume: points × 1 +
  * intervals × avg_span/bucketWidth. Pick bucketWidth ≈ the typical
  * interval span so interval replication stays O(1) per row.
  *
  * Long/skewed intervals fan out over many buckets — cap pathological
  * replication by clamping with `maxBucketsPerInterval` (rows exceeding it
  * are handled exactly in a small residual nested-loop pass). */
object RangeJoin {

  /** Inner range join. `point`, `start`, `end` are long-typed expressions
    * in the same units (cast dates/timestamps to epoch first). */
  def join(
      points: DataFrame, intervals: DataFrame,
      point: Column, start: Column, end: Column,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bkt", floor(point / bucketWidth).cast("long"))
    val span = (floor(end / bucketWidth) - floor(start / bucketWidth)).cast("long")

    val shortIv = intervals.filter(span < maxBucketsPerInterval)
      .withColumn("__bkt",
        explode(sequence(
          floor(start / bucketWidth).cast("long"),
          floor(end / bucketWidth).cast("long"))))
    val shortJoined = p.join(shortIv, "__bkt")
      .filter(point >= start && point <= end)
      .drop("__bkt")

    // residual: pathologically long intervals (rare by construction) go
    // through a broadcast nested-loop on the exact predicate
    val longIv = intervals.filter(span >= maxBucketsPerInterval)
    val longJoined = p.drop("__bkt")
      .join(broadcast(longIv), point >= start && point <= end)

    shortJoined.unionByName(longJoined)
  }
}
