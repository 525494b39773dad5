package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

import graft.ops.SplitBlockBloom

/** Codegen probe of a broadcast [[SplitBlockBloom]] over an xxhash64 key —
  * successor to the r5 classic-BloomFilter probe on the hot prefilter
  * path ([[graft.ops.Prune]]). The split-block layout makes the per-row probe
  * ONE 32-byte cache-line load instead of the classic filter's ~7
  * scattered word reads; on a 100 TB fact scan the probe is the
  * dominant per-row cost, so the miss count is the whole game (profiled
  * r8: the classic probe was the largest CPU line in q3's scan stage).
  *
  * `doGenCode` caches the broadcast's block array in per-operator fields
  * at init and emits a static `SplitBlockBloom.contains` call inside the
  * generated loop (monomorphic, JIT-inlinable); interpreted eval is the
  * identical probe for non-codegen paths.
  */
case class BlockBloomMightContainExpr(child: Expression, bloom: Broadcast[SplitBlockBloom])
    extends UnaryExpression {

  // the child is unresolved at construction (Spark 4 Columns resolve at
  // analysis), so the type contract is checked post-resolution
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom probe expects a LONG hash child, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType

  @transient private lazy val bf: SplitBlockBloom = bloom.value

  override def nullSafeEval(k: Any): Any =
    bf.mightContainHash(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[SplitBlockBloom].getName
    val bcRef = ctx.addReferenceObj("blockBloomBroadcast", bloom,
      classOf[Broadcast[SplitBlockBloom]].getName)
    val blocksField = ctx.addMutableState("int[]", "graftBloomBlocks",
      v => s"$v = (($cls) $bcRef.value()).blocks();")
    val nbField = ctx.addMutableState("int", "graftBloomNumBlocks",
      v => s"$v = (($cls) $bcRef.value()).numBlocks();")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = $cls.contains($blocksField, $nbField, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlockBloomMightContainExpr =
    copy(child = newChild)
}

object BlockBloomMightContainExpr {
  /** Column-API entry point: `mightContain(bc, xxhash64(col(key)))`. */
  def mightContain(bloom: Broadcast[SplitBlockBloom], hashed: Column): Column =
    Bridge.column(BlockBloomMightContainExpr(Bridge.expression(hashed), bloom))
}
