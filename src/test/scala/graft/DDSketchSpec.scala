package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DDSketch

/** DDSketch mergeable quantile sketch: relative-error contract, partition-
  * layout independence (merge associativity), zero handling. */
class DDSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("quantile estimates honor the relative-error bound") {
    val xs = (1 to 10000).map(_.toDouble)
    val df = xs.toDF("x")
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = df.select(DDSketch.sketchQuantile(col("x"), q, alpha = 0.01)).head().getDouble(0)
      val exact = xs((q * xs.length).toInt.min(xs.length - 1))
      assert(math.abs(est / exact - 1) <= 0.011, s"q=$q est=$est exact=$exact")
    }
  }

  test("result is independent of partition layout (merge correctness)") {
    val xs = (1 to 5000).map(i => (i % 997 + 1).toDouble)
    val one = xs.toDF("x").coalesce(1)
      .select(DDSketch.sketchQuantile(col("x"), 0.9)).head().getDouble(0)
    val many = xs.toDF("x").repartition(17)
      .select(DDSketch.sketchQuantile(col("x"), 0.9)).head().getDouble(0)
    assert(one == many, s"partition layout changed the sketch: $one vs $many")
  }

  test("negative values keep the relative-error bound (mirrored store)") {
    val xs = (1 to 10000).map(i => -i.toDouble) // -1 .. -10000
    val sorted = xs.sorted // most negative first
    val df = xs.toDF("x")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = df.select(DDSketch.sketchQuantile(col("x"), q, alpha = 0.01)).head().getDouble(0)
      val exact = sorted(((q * xs.length).toInt - 1).max(0).min(xs.length - 1))
      assert(math.abs(est / exact - 1) <= 0.011, s"q=$q est=$est exact=$exact")
    }
  }

  test("mixed-sign data orders negatives < zeros < positives") {
    val df = Seq(-5.0, 0.0, 0.0, 10.0).toDF("x")
    val p10 = df.select(DDSketch.sketchQuantile(col("x"), 0.1)).head().getDouble(0)
    assert(math.abs(p10 / -5.0 - 1) <= 0.011, s"p10=$p10")
    val p50 = df.select(DDSketch.sketchQuantile(col("x"), 0.5)).head().getDouble(0)
    assert(p50 == 0.0)
    val p99 = df.select(DDSketch.sketchQuantile(col("x"), 0.99)).head().getDouble(0)
    assert(math.abs(p99 / 10.0 - 1) <= 0.011)
  }

  test("merge correctness holds across signs") {
    val xs = (-2500 to 2500).filter(_ != 0).map(_.toDouble)
    val one = xs.toDF("x").coalesce(1)
      .select(DDSketch.sketchQuantile(col("x"), 0.25)).head().getDouble(0)
    val many = xs.toDF("x").repartition(13)
      .select(DDSketch.sketchQuantile(col("x"), 0.25)).head().getDouble(0)
    assert(one == many, s"partition layout changed the sketch: $one vs $many")
  }
}
