package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (nearest-key) join — the reference's largest custom join operator
  * (`src/daft-logical-plan/src/ops/asof_join.rs:74-87`,
  * `src/daft-local-execution/src/join/asof_join.rs`; strategies
  * `AsofJoinStrategy::{Backward, Forward, Nearest}`,
  * `src/daft-core/src/join.rs:158-162`). Spark has no built-in equivalent
  * (SURVEY §2.3).
  *
  * Implementation (Spark-first, SURVEY §7.1): both sides are shuffled ONCE
  * by the `by` keys via `cogroup` (same hash partitioning a
  * ShuffledHashJoin would use), then each key group is sorted by the `on`
  * key and merged with a two-pointer pass — O(n log n) per group, no
  * quadratic blowup, no driver collect. This parallelizes across by-keys
  * exactly like the reference's distributed asof (hash-partition on
  * left_by). A global as-of (no by-keys) degenerates to one group —
  * documented limitation; a range-partitioned variant is the planned
  * upgrade path.
  *
  * Left-outer semantics: every left row is kept; unmatched ⇒ right side
  * null. `toleranceMicros` (a pandas-style superset knob) nulls matches
  * farther than the bound.
  */
object AsofJoin {

  sealed trait Strategy
  case object Backward extends Strategy // greatest right.on <= left.on
  case object Forward extends Strategy  // least right.on >= left.on
  case object Nearest extends Strategy  // min |diff|, tie -> backward

  private val SEP = ""

  private def timeExpr(df: DataFrame, on: String): Column =
    df.schema(on).dataType match {
      case TimestampType | TimestampNTZType =>
        // Tables.eventTimeMicros handles the NTZ dispatch (Spark 4's
        // unix_micros rejects TIMESTAMP_NTZ; UTC session makes the cast
        // instant-preserving). Integral on-keys stay raw ordering keys, so
        // they are handled below, not by the events-specific helper.
        graft.Tables.eventTimeMicros(df, on)
      case DateType => col(on).cast("long") * 86400000000L
      case ByteType | ShortType | IntegerType | LongType => col(on).cast("long")
      case other =>
        throw new IllegalArgumentException(s"asof on-key type $other not supported (timestamp/date/integral)")
    }

  private def keyExpr(by: Seq[String]): Column =
    if (by.isEmpty) lit("") else concat_ws(SEP, by.map(c => col(c).cast("string")): _*)

  /** @param left      probe side (all rows preserved)
    * @param right     build side
    * @param leftOn    ordered key on the left (timestamp/date/integral)
    * @param rightOn   ordered key on the right
    * @param leftBy    exact-match partition keys on the left (may be empty)
    * @param rightBy   exact-match partition keys on the right
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      leftBy: Seq[String] = Nil,
      rightBy: Seq[String] = Nil,
      strategy: Strategy = Backward,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(leftBy.size == rightBy.size, "leftBy and rightBy must align")
    val dupNames = left.columns.toSet.intersect(right.columns.toSet) -- rightBy.toSet
    require(
      dupNames.isEmpty || rightBy.toSet.nonEmpty,
      s"ambiguous output columns: $dupNames — rename right-side columns first")

    val leftAug = left
      .withColumn("__graft_k", keyExpr(leftBy))
      .withColumn("__graft_t", timeExpr(left, leftOn))
    val rightAug = right
      .withColumn("__graft_k", keyExpr(rightBy))
      .withColumn("__graft_t", timeExpr(right, rightOn))

    val nLeft = left.schema.size
    val rightOut = StructType(right.schema.map(_.copy(nullable = true)))
    val outSchema = StructType(left.schema.fields ++ rightOut.fields)

    val lEnc = Encoders.row(leftAug.schema)
    val rEnc = Encoders.row(rightAug.schema)
    val outEnc = Encoders.row(outSchema)
    val strat = strategy
    val tol = toleranceMicros
    val nRight = right.schema.size

    val lKV = leftAug.as(lEnc).groupByKey((r: Row) => r.getString(nLeft))(Encoders.STRING)
    val rKV = rightAug.as(rEnc).groupByKey((r: Row) => r.getString(nRight))(Encoders.STRING)

    lKV.cogroup(rKV) { (_, lIt, rIt) =>
      val ls = lIt.toArray
      if (ls.isEmpty) Iterator.empty
      else {
        val rs = rIt.toArray
        java.util.Arrays.sort(ls, Ordering.by((r: Row) => r.getLong(nLeft + 1)))
        java.util.Arrays.sort(rs, Ordering.by((r: Row) => r.getLong(nRight + 1)))
        mergeSorted(ls, rs, nLeft, nRight, strat, tol)
      }
    }(outEnc)
      .toDF()
  }

  /** Two-pointer merge of time-sorted left/right row arrays (shared by the
    * by-key and global paths). */
  private def mergeSorted(
      ls: Array[Row], rs: Array[Row], nLeft: Int, nRight: Int,
      strat: Strategy, tol: Option[Long]): Iterator[Row] = {
    val rTimes = rs.map(_.getLong(nRight + 1))
    val nullRight = Seq.fill(nRight)(null)
    var j = 0 // count of right rows with rTime <= current left t
    ls.iterator.map { lRow =>
      val t = lRow.getLong(nLeft + 1)
      while (j < rs.length && rTimes(j) <= t) j += 1
      val backIdx = j - 1                       // last <= t, or -1
      val fwdIdx = if (j < rs.length) j else -1 // first > t
      // forward means >=, so an exact match (== t) is backIdx as well
      val fwdGeIdx =
        if (backIdx >= 0 && rTimes(backIdx) == t) backIdx else fwdIdx
      val pick: Int = strat match {
        case Backward => backIdx
        case Forward  => fwdGeIdx
        case Nearest =>
          (backIdx, fwdIdx) match {
            case (-1, f) => f
            case (b, -1) => b
            case (b, f)  => if (t - rTimes(b) <= rTimes(f) - t) b else f
          }
      }
      val withinTol = pick >= 0 && tol.forall(m => math.abs(t - rTimes(pick)) <= m)
      val rightVals =
        if (withinTol) rs(pick).toSeq.take(nRight) else nullRight
      Row.fromSeq(lRow.toSeq.take(nLeft) ++ rightVals)
    }
  }

  /** Global as-of join (no by-keys) that does NOT collapse to one group —
    * the range-partitioned upgrade path (SURVEY §7.3 hard-part #1):
    *
    *  1. Range-partition the union of both sides on the time key, sorted
    *     within partitions — co-locates every left row with the right rows
    *     of its time range.
    *  2. First pass computes per-partition right-row boundary summaries
    *     (earliest/latest right row of each partition) — N_partitions rows
    *     collected to the driver (tiny) and broadcast back.
    *  3. Second pass merges each partition with the carried-in neighbor
    *     rows, so backward matches before the partition's first right row,
    *     forward matches after its last, and nearest across boundaries are
    *     all exact.
    */
  def joinGlobal(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      strategy: Strategy = Backward,
      toleranceMicros: Option[Long] = None,
      numPartitions: Int = 0): DataFrame = {
    val spark = left.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val nLeft = left.schema.size
    val nRight = right.schema.size
    val rightOut = StructType(right.schema.map(_.copy(nullable = true)))
    val outSchema = StructType(left.schema.fields ++ rightOut.fields)

    // tag sides and align schemas: (t, side, leftFields..., rightFields...)
    val lCols = left.schema.fieldNames.map(col) ++ rightOut.fieldNames.map(n => lit(null).cast(rightOut(n).dataType).as(n))
    val rCols = left.schema.fieldNames.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++ right.schema.fieldNames.map(col)
    val lTagged = left.select((Seq(timeExpr(left, leftOn).as("__graft_t"), lit(0).as("__graft_side")) ++ lCols): _*)
    val rTagged = right.select((Seq(timeExpr(right, rightOn).as("__graft_t"), lit(1).as("__graft_side")) ++ rCols): _*)
    val union = lTagged.unionByName(rTagged)
      .repartitionByRange(parts, col("__graft_t"))
      .sortWithinPartitions("__graft_t", "__graft_side")

    val taggedSchema = union.schema
    val enc = Encoders.row(taggedSchema)
    val unionDs = union.as(enc)

    // pass 1: per-partition first/last RIGHT rows (whole tagged rows)
    val summaries: Array[(Int, Row, Row)] = unionDs.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var first: Row = null
        var last: Row = null
        it.foreach { r =>
          if (r.getInt(1) == 1) { if (first == null) first = r; last = r }
        }
        if (first == null) Iterator.empty else Iterator((pid, first, last))
      }
      .collect()
    val bcSummaries = spark.sparkContext.broadcast(summaries)
    val strat = strategy
    val tol = toleranceMicros

    // STREAMING two-pointer merge: partitions arrive already sorted by
    // (t, side) — never materialized. A left row buffers only until the
    // first STRICTLY-later right row arrives (equal-t rights must all be
    // seen first: backward is an inclusive bound and forward/nearest pick
    // the last equal-t right, matching mergeSorted's array semantics), so
    // peak memory is the left-row count between two consecutive right
    // rows — not the partition (the r6 `it.toArray` spike). Range
    // partitioning puts equal t values in one partition, so carry-ins are
    // strictly outside the local time range.
    val merged = unionDs.rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = bcSummaries.value
      val before = sums.filter(_._1 < pid).sortBy(_._1).lastOption.map(_._3)
      val after = sums.filter(_._1 > pid).sortBy(_._1).headOption.map(_._2)
      val nullRight = Seq.fill(nRight)(null)

      def resolve(l: Row, back: Row, fwd: Row): Row = {
        val t = l.getLong(0)
        val pick: Row = strat match {
          case Backward => back
          case Forward =>
            // exact match counts as both back and forward; back is the
            // LAST equal-t right, which mergeSorted also picked
            if (back != null && back.getLong(0) == t) back else fwd
          case Nearest =>
            (back, fwd) match {
              case (null, f) => f
              case (b, null) => b
              case (b, f) =>
                if (t - b.getLong(0) <= f.getLong(0) - t) b else f
            }
        }
        val ok = pick != null &&
          tol.forall(m => math.abs(t - pick.getLong(0)) <= m)
        Row.fromSeq(
          l.toSeq.slice(2, 2 + nLeft) ++
            (if (ok) pick.toSeq.drop(2 + nLeft) else nullRight))
      }

      val pending = new scala.collection.mutable.ArrayDeque[Row]()
      var lastRight: Row = before.orNull
      val body = it.flatMap { row =>
        if (row.getInt(1) == 1) {
          val tR = row.getLong(0)
          // lefts strictly older than this right are final (pending is in
          // ascending t order — resolve the prefix); equal-t lefts wait
          // for possible later equal-t rights
          val back = lastRight
          lastRight = row
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (pending.nonEmpty && pending.head.getLong(0) < tR)
            out += resolve(pending.removeHead(), back, row)
          out.iterator
        } else {
          pending += row
          Iterator.empty
        }
      }
      val tail = Iterator.single(()).flatMap { _ =>
        val fwd = after.orNull
        pending.iterator.map(l => resolve(l, lastRight, fwd))
      }
      body ++ tail
    }
    spark.createDataFrame(merged, outSchema)
  }
}
