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

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes and returns rows at sf0.001") {
      val df = fn(spark, dir)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0) // some dedup queries may legitimately be empty
    }
  }

  test("tpch q1 matches hand-computed invariants") {
    val rows = queries.Tpch.q1(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    assert(rows.map(_.getLong(rows.head.length - 1)).sum > 0)
  }
}
