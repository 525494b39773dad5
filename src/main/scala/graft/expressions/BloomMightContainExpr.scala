package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen probe of a broadcast Bloom filter over an xxhash64 key — the
  * hottest filter in the bloom-prefiltered join path ([[graft.ops.Prune]]):
  * it runs on EVERY fact-table row ahead of the scan's shuffle, so a
  * boxed-Long Scala UDF there allocates per row and breaks whole-stage
  * codegen right where the pipeline should be tightest (same role as
  * Spark's own runtime-filter BloomFilterMightContain, which is not
  * callable with an explicit broadcast).
  *
  * `doGenCode` caches `broadcast.value()` in a per-operator field at init
  * and emits a primitive `mightContainLong` call inside the generated
  * loop; interpreted eval is the identical probe for non-codegen paths.
  */
case class BloomMightContainExpr(child: Expression, bloom: Broadcast[BloomFilter])
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

  @transient private lazy val bf: BloomFilter = bloom.value

  override def nullSafeEval(k: Any): Any =
    bf.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBroadcast", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val bfField = ctx.addMutableState(bfClass, "graftBloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $bfField.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Column-API entry point: `mightContain(bc, xxhash64(col(key)))`. */
  def mightContain(bloom: Broadcast[BloomFilter], hashed: Column): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(hashed), bloom))
}
