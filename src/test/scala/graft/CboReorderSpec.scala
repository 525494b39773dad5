package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Stats-driven join reorder (ref reorder_joins + enrich_with_stats;
  * Spark-first = CBO over ANALYZE'd catalog tables, enabled in
  * Engine.session). Pins: (1) the reorder FIRES on a pessimally-written
  * 3-table join once stats exist, (2) results are invariant to the
  * reorder, (3) path-based reads (no catalog stats) are untouched — the
  * guarantee that keeps every pinned bench plan safe under the global
  * conf. */
class CboReorderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def innermostJoin(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.last.toString

  test("analyzed catalog tables: selective dim join reordered under the fact") {
    val sess = new GraftSession(spark)
    val fact = spark.range(200000).select(
      ($"id" % 1000).as("custkey"), ($"id" % 97).cast("double").as("price"))
    val cust = spark.range(1000).select(
      $"id".as("c_custkey"), ($"id" % 25).as("c_nationkey"))
    val nat = spark.range(25).select(
      $"id".as("n_nationkey"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("N"), $"id").as("n_name"))
    try {
      sess.createTable("cbo_spec_fact", fact)
      sess.createTable("cbo_spec_cust", cust)
      sess.createTable("cbo_spec_nat", nat)
      sess.analyzeTable("cbo_spec_fact", Seq("custkey"))
      sess.analyzeTable("cbo_spec_cust", Seq("c_custkey", "c_nationkey"))
      sess.analyzeTable("cbo_spec_nat", Seq("n_nationkey", "n_name"))
      val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val oldCbo = spark.conf.get("spark.sql.cbo.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // scoped enable — the session default is off (Engine.session doc)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        val q =
          """SELECT n_name, count(*) AS c FROM cbo_spec_fact
            |JOIN cbo_spec_cust ON custkey = c_custkey
            |JOIN cbo_spec_nat ON c_nationkey = n_nationkey
            |WHERE n_name = 'N7' GROUP BY n_name""".stripMargin
        val df = spark.sql(q)
        val inner = innermostJoin(df)
        assert(inner.contains("cbo_spec_nat") && inner.contains("cbo_spec_cust") &&
          !inner.contains("cbo_spec_fact"),
          s"expected the dim-dim join innermost, got:\n$inner")
        val withReorder = df.collect().map(_.toString).sorted.toSeq
        // result invariance: same query with the reorder disabled
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        val without = spark.sql(q).collect().map(_.toString).sorted.toSeq
        assert(withReorder == without)
        // 200k rows of fact, 1000/25th survive the N7 filter
        assert(withReorder.nonEmpty)
      } finally {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", oldCbo)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      }
    } finally {
      Seq("cbo_spec_fact", "cbo_spec_cust", "cbo_spec_nat").foreach(sess.dropTable)
    }
  }

  test("path-based reads carry no catalog row counts: reorder stays inert") {
    // the safety property that protects every pinned bench plan: a
    // parquet path scan exposes size-only stats (no rowCount), and
    // CostBasedJoinReorder requires row counts on ALL join inputs
    val dir = java.nio.file.Files.createTempDirectory("cbo-path").toString
    spark.range(100).toDF("id").write.parquet(s"$dir/t")
    val oldCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true") // even with CBO on
      val df = spark.read.parquet(s"$dir/t")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isEmpty,
        s"path scan unexpectedly exposes a row count: $stats")
    } finally spark.conf.set("spark.sql.cbo.enabled", oldCbo)
  }
}
