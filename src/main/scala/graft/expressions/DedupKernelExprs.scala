package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Misc

/** Static kernels behind the dedup signature expressions — plain methods a
  * whole-stage-codegen call site can reach through Scala's static
  * forwarders (the same pattern Spark's own expressions use for
  * `UTF8String.*` helpers). Inputs/outputs are Catalyst-native
  * (`UTF8String`, `ArrayData`) so no Scala collection boxing happens on
  * the 100 TB-hot path; the hash math itself is shared with
  * [[graft.functions.Misc]] so UDF- and expression-computed signatures are
  * bit-identical (the SQL-registered UDF surface keeps working). */
object DedupKernels {

  /** Hashed, sorted-distinct word n-gram shingles (see
    * [[Misc.hashedShingles]]). */
  def hashedShingles(text: UTF8String, n: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Misc.hashedShingles(text.toString, n, seed))

  /** LSH band buckets from pre-hashed shingles — the fused
    * signature+banding kernel ([[Misc.minhashBandsFromHashes]]), reading
    * the long array straight out of the unsafe row. */
  def minhashBands(hashes: ArrayData, k: Int, bandRows: Int, seed: Long): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      val base = Misc.mix64(hashes.getLong(t) ^ seed)
      var i = 0
      while (i < k) {
        val h = Misc.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    val nBands = k / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var r = 0
      while (r < bandRows) { h = Misc.mix64(h ^ sig(b * bandRows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit simhash vote over pre-hashed tokens
    * ([[Misc.simhash64FromHashes]]) — fully primitive in and out. */
  def simhash64(hashes: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      val h = hashes.getLong(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd shingle kernel: `string → array<long>` of hashed
  * sorted-distinct word n-grams. Promoted off ScalaUDF (VERDICT r12 #6) so
  * the one projection every 100 TB dedup pass runs stays inside
  * whole-stage codegen — no encoder round-trip of the token array, no
  * UDF-boundary boxing. Null text → null (callers filter empties anyway;
  * the UDF form returned an empty array, which the same `size(..) > 0`
  * guards also drop). */
case class HashedShinglesExpr(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  require(n >= 1, s"shingle n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"
  override def nullSafeEval(t: Any): Any =
    DedupKernels.hashedShingles(t.asInstanceOf[UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DedupKernels.hashedShingles($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}

/** Codegen'd fused minhash-signature + band-bucket kernel:
  * `array<long> → array<long>` (one bucket hash per band). */
case class MinhashBandsExpr(child: Expression, k: Int, bandRows: Int, seed: Long)
    extends UnaryExpression {
  require(k >= 1 && bandRows >= 1 && k % bandRows == 0,
    s"minhash bands need k divisible by bandRows, got k=$k bandRows=$bandRows")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"
  override def nullSafeEval(hs: Any): Any =
    DedupKernels.minhashBands(hs.asInstanceOf[ArrayData], k, bandRows, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DedupKernels.minhashBands($c, $k, $bandRows, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
}

/** Codegen'd simhash vote kernel: `array<long> → long`. */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullSafeEval(hs: Any): Any =
    DedupKernels.simhash64(hs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DedupKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

object DedupKernelExprs {
  /** Column-API entry points (the dedup pipelines' signature stage). */
  def hashedShingles(text: Column, n: Int, seed: Long = 0L): Column =
    Bridge.column(HashedShinglesExpr(Bridge.expression(text), n, seed))
  def minhashBands(hashes: Column, k: Int, bandRows: Int, seed: Long): Column =
    Bridge.column(MinhashBandsExpr(Bridge.expression(hashes), k, bandRows, seed))
  def simhash64(hashes: Column): Column =
    Bridge.column(Simhash64Expr(Bridge.expression(hashes)))
}
