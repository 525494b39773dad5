package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed user-defined aggregates — the Spark counterpart of the reference's
  * UDAF contract (`daft/udf/udaf.py:16-80`: aggregate/combine/finalize with
  * an associative+commutative state) is `Aggregator[IN, BUF, OUT]`
  * (reduce/merge/finish). These run inside Tungsten's hash aggregate with
  * partial (map-side) combine, so they scale the same way built-in
  * aggregates do. */
object Udafs {

  /** Product of doubles (ref AggExpr::Product, expr/mod.rs:406 —
    * no Spark builtin). */
  class ProductAgg extends Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted mean over (value, weight) pairs — demonstrates a struct-input
    * Aggregator with a composite buffer. */
  class WeightedMeanAgg extends Aggregator[Row, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: Row): (Double, Double) =
      (b._1 + a.getDouble(0) * a.getDouble(1), b._2 + a.getDouble(1))
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val productUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new ProductAgg, Encoders.scalaDouble)

  val weightedMeanUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new WeightedMeanAgg, Encoders.row(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("weight", org.apache.spark.sql.types.DoubleType)))))

  def product(c: Column): Column = productUdaf(c)
}
