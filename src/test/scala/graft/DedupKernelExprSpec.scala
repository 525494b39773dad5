package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{DedupKernelExprs => GKern}
import graft.functions.{Misc => GMisc}
import graft.ops.Dedup

/** Codegen promotion of the dedup signature kernels (VERDICT r12 #6): the
  * shingle/minhash-band/simhash stage is the one projection every 100 TB
  * dedup pass runs, and a ScalaUDF there breaks whole-stage codegen and
  * pays an encoder round-trip per row. The native expressions must be
  * bit-identical to the UDF kernels (the SQL surface still binds those)
  * and the dedup pipelines must plan WITHOUT any ScalaUDF node. */
class DedupKernelExprSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l m",
    "one two", // shorter than n=3 → empty shingle set
    "repeat repeat repeat repeat repeat",
    "ütf8 tökens with ünicode graphemes mixed in here"
  )

  test("expression kernels are bit-identical to the UDF kernels") {
    val df = texts.toDF("text").select(
      col("text"),
      GKern.hashedShingles(col("text"), 3).as("sh_native"),
      GMisc.hashedShinglesUdf(3)(col("text")).as("sh_udf"))
      .select(
        col("sh_native"), col("sh_udf"),
        GKern.minhashBands(col("sh_native"), 64, 8, 1L).as("mb_native"),
        GMisc.minhashBandsFromHashesUdf(64, 8, 1L)(col("sh_udf")).as("mb_udf"),
        GKern.simhash64(col("sh_native")).as("sim_native"),
        GMisc.simhash64FromHashesUdf(col("sh_udf")).as("sim_udf"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "shingles must match UDF")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "bands must match UDF")
      assert(r.getLong(4) == r.getLong(5), "simhash must match UDF")
    }
  }

  test("null text yields null shingles (callers' size()>0 guards drop both forms)") {
    val df = Seq[(java.lang.Long, String)]((1L, "a b c d"), (2L, null))
      .toDF("id", "text")
      .select(col("id"), GKern.hashedShingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
    assert(df.filter(size(col("sh")) > 0).count() == 1)
  }

  test("signature stage stays inside whole-stage codegen (no ScalaUDF)") {
    // parquet-backed input: a literal LocalRelation would be constant-folded
    // into a LocalTableScan and never exercise doGenCode
    val dir = java.nio.file.Files.createTempDirectory("graft_kern").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), GKern.hashedShingles(col("text"), 3).as("sh"))
      .select(col("id"), GKern.minhashBands(col("sh"), 64, 8, 1L).as("mb"))
    val plan = df.queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"kernel projection must be codegen'd:\n$plan")
    // force real codegen execution (a doGenCode bug would only surface here)
    assert(df.collect().forall(_.getSeq[Long](1).length == 8))
  }

  test("minhash/simhash/ngram dedup pipelines plan with zero ScalaUDF nodes") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val plans = Seq(
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, k = 64, bandRows = 1, threshold = 0.8),
      Dedup.simhashPairs(docs, "doc_id", "text", shingleN = 3, maxHamming = 3),
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
    try plans.foreach { df =>
      val udfs = df.queryExecution.optimizedPlan.collect {
        case p => p.expressions.flatMap(_.collect { case u: ScalaUDF => u })
      }.flatten
      assert(udfs.isEmpty,
        s"dedup signature stage must not plan a ScalaUDF, found: $udfs")
    } finally graft.ops.Caches.releaseAll()
  }
}
