package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level invariants over the full query inventory at sf0.001: every
  * query plans, executes, and returns rows with its declared schema. The
  * value-level gate is the DuckDB oracle (Verify + driver t2); these tests
  * catch regressions fast. */
class QueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every query key has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
  }

  test("no query key is defined in two files (map ++ would shadow silently)") {
    val sources = Seq(
      "Tpch" -> queries.Tpch.queries, "Tpch2" -> queries.Tpch2.queries,
      "ClickBench" -> queries.ClickBench.queries,
      "Relational" -> queries.Relational.queries,
      "Aggregates" -> queries.Aggregates.queries,
      "Windows" -> queries.Windows.queries,
      "Functions" -> queries.Functions.queries,
      "AsofQueries" -> queries.AsofQueries.queries,
      "Pipeline" -> queries.Pipeline.queries, "Io" -> queries.Io.queries,
      "Advanced" -> queries.Advanced.queries)
    val dups = sources.flatMap { case (src, m) => m.keys.map(_ -> src) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, hits) => s"$k in ${hits.map(_._2).mkString("+")}" }
    assert(dups.isEmpty, s"duplicate query keys across files: ${dups.mkString(", ")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes and returns rows at sf0.001") {
      try {
        val df = fn(spark, dir)
        assert(df.schema.nonEmpty)
        assert(df.count() >= 0) // some dedup queries may legitimately be empty
      } finally graft.ops.Caches.releaseAll() // drop query-leased blocks
    }
  }

  test("tpch q1 matches hand-computed invariants") {
    val rows = queries.Tpch.q1(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    assert(rows.map(_.getLong(rows.head.length - 1)).sum > 0)
  }
}
