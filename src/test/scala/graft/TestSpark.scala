package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (lazy, never stopped — the JVM
  * is forked per test run). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("4")
  val sfDir = "/root/testdata/sf0.001"
}
