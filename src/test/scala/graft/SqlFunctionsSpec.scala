package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Misc

/** Graft functions on the spark.sql surface (extension-injected native
  * expression + registered UDFs), mirroring daft-sql's function binding. */
class SqlFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("graft_cosine_similarity in SQL plans the native codegen expression") {
    val df = spark.sql(
      "SELECT graft_cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(0.6 as float), cast(0.8 as float))) AS s")
    assert(math.abs(df.as[Double].head() - 0.6) < 1e-6)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"must be the native expression, not a UDF:\n$plan")
  }

  test("graft_cosine_similarity arity and type errors are analysis-time") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_cosine_similarity(array(1), array(2), array(3))").collect())
    assert(e.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_cosine_similarity('a', 'b')").collect())
    assert(e2.getMessage.contains("array<float>") || e2.getMessage.contains("DATATYPE"))
  }

  test("graft_jq extracts from JSON on the SQL surface") {
    val got = spark.sql(
      """SELECT graft_jq('{"meta":{"tags":["x","y"]}}', '.meta.tags[1]') AS v""")
      .as[String].head()
    assert(got == "\"y\"") // jq text output: JSON-rendered, strings quoted
  }

  test("graft_minhash and graft_simhash match the Column-API kernels") {
    val row = spark.sql(
      "SELECT graft_minhash(array('a','b','c'), 4) AS mh, graft_simhash(array('a','b','c')) AS sh")
      .as[(Seq[Long], Long)].head()
    assert(row._1 == Misc.minhashSignature(Seq("a", "b", "c"), 4, 1L).toSeq)
    // seed 0L = the Column-API default (simhashUdfDefault), so SQL and
    // Column fingerprints are directly hamming-comparable
    assert(row._2 == Misc.simhash64(Seq("a", "b", "c"), 0L))
  }
}
