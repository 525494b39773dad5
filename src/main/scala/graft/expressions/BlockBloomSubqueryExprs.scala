package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.ops.SplitBlockBloom

/** Aggregate that builds a [[SplitBlockBloom]] from a LONG hash column and
  * emits its wire form (BinaryType) — the build half of the
  * optimizer-injected runtime prefilter
  * ([[graft.plans.BloomPrefilterRule]]). The rule plants this under a
  * scalar subquery on the join's creation side, the same structure as
  * Spark's own `InjectRuntimeFilter`/`BloomFilterAggregate` pair — but
  * over the split-block filter, whose probe is one 32-byte load and whose
  * measured fpp holds at 100M+ keys where `util.sketch.BloomFilter`
  * degrades ~5× (r8 profile; ref
  * `src/daft-logical-plan/src/optimization/rules/push_down_filter.rs` does
  * its pruning statically — Spark's runtime-subquery form is the
  * equivalent hook in a Catalyst engine).
  *
  * Distributed build semantics: partial aggregates build
  * partition-local filters (serialize = wire form), merge ORs them —
  * byte-identical to [[SplitBlockBloom.build]]'s mapPartitions+fold. Null
  * hashes are skipped (a null join key never matches an equi-join).
  */
case class BlockBloomAggregate(
    child: Expression,
    numBlocks: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SplitBlockBloom] with UnaryLike[Expression] {

  override def prettyName: String = "graft_block_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom aggregate expects a LONG hash child, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): SplitBlockBloom = new SplitBlockBloom(numBlocks)

  override def update(buffer: SplitBlockBloom, input: InternalRow): SplitBlockBloom = {
    val v = child.eval(input)
    if (v != null) buffer.insertHash(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: SplitBlockBloom, b: SplitBlockBloom): SplitBlockBloom = a.merge(b)

  override def eval(buffer: SplitBlockBloom): Any = buffer.toBytes
  override def serialize(buffer: SplitBlockBloom): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): SplitBlockBloom =
    SplitBlockBloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BlockBloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BlockBloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BlockBloomAggregate =
    copy(child = newChild)
}

/** Probe of a serialized [[SplitBlockBloom]] whose bytes arrive through a
  * scalar subquery (the probe half of [[graft.plans.BloomPrefilterRule]]).
  *
  * Mirrors Spark's `BloomFilterMightContain` contract: `filterExpr` is
  * evaluated ONCE lazily (subquery results are materialized before the
  * consuming stage runs) and the deserialized filter is embedded into the
  * generated code as a reference object, so the per-row work inside
  * whole-stage codegen is the same single-cache-line
  * `SplitBlockBloom.contains` call as the broadcast-based
  * [[BlockBloomMightContainExpr]]. A null filter (empty creation side
  * evaluates to an all-zero filter, so this is only a defensive path)
  * passes every row — false positives/negatives must never change join
  * results. */
case class BlockBloomMightContainBytes(filterExpr: Expression, hashExpr: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = filterExpr
  override def right: Expression = hashExpr
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (filterExpr.dataType == BinaryType && hashExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (BINARY filter, LONG hash), got " +
        s"(${filterExpr.dataType.simpleString}, ${hashExpr.dataType.simpleString})")

  @transient private lazy val filter: SplitBlockBloom = {
    val bytes = filterExpr.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null else SplitBlockBloom.fromBytes(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val f = filter
    if (f == null) true
    else {
      val h = hashExpr.eval(input)
      if (h == null) null
      else f.mightContainHash(h.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = filter
    if (f == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = true;""")
    } else {
      val cls = classOf[SplitBlockBloom].getName
      val blocksRef = ctx.addReferenceObj("graftBloomBlocks", f.blocks, "int[]")
      val h = hashExpr.genCode(ctx)
      ev.copy(code = code"""
        ${h.code}
        boolean ${ev.isNull} = ${h.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $cls.contains($blocksRef, ${f.numBlocks}, ${h.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BlockBloomMightContainBytes =
    copy(filterExpr = newLeft, hashExpr = newRight)
}
