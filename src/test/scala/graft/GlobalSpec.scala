package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass global rank/prefix-scan (ops/Global): must agree exactly with
  * the single-partition Window it replaces, while never funneling the data
  * through one task. */
class GlobalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("withGlobalRank matches an unpartitioned Window exactly") {
    val base = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"),
        floor(col("o_totalprice")).cast("long").as("v"))

    val viaGlobal = graft.ops.Global.withGlobalRank(
        base, Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        "rk", runningSumOf = Some(("v", "run")))
      .select("o_orderkey", "rk", "run")
      .orderBy("rk").collect()

    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = base
      .select(col("o_orderkey"),
        row_number().over(w).cast("long").as("rk"),
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run"))
      .orderBy("rk").collect()

    assert(viaGlobal.length == viaWindow.length && viaGlobal.length > 0)
    viaGlobal.zip(viaWindow).foreach { case (a, b) => assert(a == b) }
  }

  test("rank-only variant covers the vocab-build shape") {
    val counts = Tables(spark, dir).documents
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val vocab = graft.ops.Tokenize.buildVocab(Tables(spark, dir).documents, "text")
    // ids are dense 0..n-1 and ordered by (freq desc, token asc)
    val n = counts.count()
    assert(vocab.count() == n)
    val top = vocab.orderBy("token_id").limit(3).collect()
    val expected = counts.orderBy(col("freq").desc, col("token").asc).limit(3).collect()
    top.zip(expected).zipWithIndex.foreach { case ((v, e), i) =>
      assert(v.getAs[String]("token") == e.getAs[String]("token"))
      assert(v.getAs[Int]("token_id") == i)
    }
  }
}
