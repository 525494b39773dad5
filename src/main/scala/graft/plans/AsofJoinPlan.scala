package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.ops.AsofJoin

/** Planner-integrated as-of join — the full Spark extension stack for a
  * whole-operator semantic (build brief tier (c)): a custom `LogicalPlan`
  * node, a `SparkStrategy` planning it, and a `SparkPlan` that declares
  * its distribution/ordering requirements so CATALYST (EnsureRequirements)
  * owns the exchanges and sorts — exactly how SortMergeJoin is planned.
  *
  * Compared to the cogroup implementation in [[graft.ops.AsofJoin]] (same
  * runtime merge), the planner variant:
  *  - declares `ClusteredDistribution(by-keys)` on both children, so an
  *    input already hash-partitioned on the keys (bucketed table, prior
  *    aggregate) skips the shuffle entirely — cogroup always shuffles;
  *  - declares child orderings, so the sort can be absorbed by an
  *    already-sorted child for free;
  *  - executes as a streaming merge of sorted key-runs — per-KEY buffering
  *    (bounded by the largest key group), never per-partition arrays.
  *
  * Registered through `SparkSessionExtensions.injectPlannerStrategy` in
  * `Engine.session` (ref reference logical op `ops/asof_join.rs:74`).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftOn: Attribute,
    rightOn: Attribute,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    strategy: AsofJoin.Strategy,
    toleranceMicros: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lo, ro, lb, rb, st, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lo, ro, lb, rb, st, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftOn: Attribute,
    rightOn: Attribute,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    strategy: AsofJoin.Strategy,
    toleranceMicros: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  // co-partition both sides on the by-keys; EnsureRequirements inserts the
  // exchanges only where the child isn't already clustered correctly
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  // sorted key-runs within partitions; sorts are absorbed if already sorted
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(a => SortOrder(a, Ascending)),
    (rightBy :+ rightOn).map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(a => SortOrder(a, Ascending))

  /** Normalize the on-key to comparable micros (timestamps are stored as
    * Long micros in InternalRow; dates as Int days). */
  private def timeNormalizer(attr: Attribute, out: Seq[Attribute]): InternalRow => Long = {
    val bound = BindReferences.bindReference(attr: Expression, out)
    attr.dataType match {
      case DateType => r => bound.eval(r).asInstanceOf[Int].toLong * 86400000000L
      case TimestampType | TimestampNTZType | LongType => r => bound.eval(r).asInstanceOf[Long]
      case IntegerType => r => bound.eval(r).asInstanceOf[Int].toLong
      case ShortType => r => bound.eval(r).asInstanceOf[Short].toLong
      case ByteType => r => bound.eval(r).asInstanceOf[Byte].toLong
      case other => throw new IllegalArgumentException(s"asof on-key type $other unsupported")
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lByBound = leftBy.map(BindReferences.bindReference(_: Expression, lOut))
    val rByBound = rightBy.map(BindReferences.bindReference(_: Expression, rOut))
    val keyTypes = leftBy.map(_.dataType)
    val lTimeF = timeNormalizer(leftOn, lOut)
    val rTimeF = timeNormalizer(rightOn, rOut)
    val nRight = rOut.size
    val strat = strategy
    val tol = toleranceMicros
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lByBound)
      val rKeyProj = UnsafeProjection.create(rByBound)
      val keyOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      // sorted rows → iterator of (key, rows-of-that-key) runs
      def groupRuns(it: Iterator[InternalRow], proj: UnsafeProjection)
          : BufferedIterator[(UnsafeRow, Array[InternalRow])] =
        new Iterator[(UnsafeRow, Array[InternalRow])] {
          private val base = it.buffered
          def hasNext: Boolean = base.hasNext
          def next(): (UnsafeRow, Array[InternalRow]) = {
            val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            val key = proj(base.head).copy()
            buf += base.next().copy()
            while (base.hasNext && proj(base.head) == key) buf += base.next().copy()
            (key, buf.toArray)
          }
        }.buffered

      val lRuns = groupRuns(lIt, lKeyProj)
      val rRuns = groupRuns(rIt, rKeyProj)

      lRuns.flatMap { case (lk, ls) =>
        // advance right to the matching key run (both sides key-sorted)
        while (rRuns.hasNext && keyOrd.compare(rRuns.head._1, lk) < 0) rRuns.next()
        val rs: Array[InternalRow] =
          if (rRuns.hasNext && keyOrd.compare(rRuns.head._1, lk) == 0) rRuns.head._2
          else Array.empty
        val rTimes = rs.map(rTimeF)
        var j = 0
        ls.iterator.map { lRow =>
          val t = lTimeF(lRow)
          while (j < rs.length && rTimes(j) <= t) j += 1
          val backIdx = j - 1
          val fwdIdx = if (j < rs.length) j else -1
          val fwdGeIdx =
            if (backIdx >= 0 && rTimes(backIdx) == t) backIdx else fwdIdx
          val pick: Int = strat match {
            case AsofJoin.Backward => backIdx
            case AsofJoin.Forward  => fwdGeIdx
            case AsofJoin.Nearest =>
              (backIdx, fwdIdx) match {
                case (-1, f) => f
                case (b, -1) => b
                case (b, f)  => if (t - rTimes(b) <= rTimes(f) - t) b else f
              }
          }
          val ok = pick >= 0 && tol.forall(m => math.abs(t - rTimes(pick)) <= m)
          // j is a per-run cursor: reset not needed within a run (ls sorted
          // ascending), but must restart for the next left row scan point
          resultProj(joined(lRow, if (ok) rs(pick) else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: as-of join through the planner-integrated operator. */
object PlannedAsof {
  def join(
      left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      leftBy: Seq[String], rightBy: Seq[String],
      strategy: AsofJoin.Strategy = AsofJoin.Backward,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark: SparkSession = left.sparkSession
    val lPlan = Bridge.analyzedPlan(left)
    val rPlan = Bridge.analyzedPlan(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    Bridge.ofRows(spark, AsofJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftOn), attr(rPlan, rightOn),
      leftBy.map(attr(lPlan, _)), rightBy.map(attr(rPlan, _)),
      strategy, toleranceMicros))
  }
}
