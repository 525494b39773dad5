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

  test("zeros and negatives collapse to the zero bucket") {
    val df = Seq(-5.0, 0.0, 0.0, 10.0).toDF("x")
    val p25 = df.select(DDSketch.sketchQuantile(col("x"), 0.25)).head().getDouble(0)
    assert(p25 == 0.0)
    val p99 = df.select(DDSketch.sketchQuantile(col("x"), 0.99)).head().getDouble(0)
    assert(math.abs(p99 / 10.0 - 1) <= 0.011)
  }
}
