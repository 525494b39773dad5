package graft

import java.nio.file.Files

import graft.ops.SkipExisting
import graft.sources.Sql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** skip_existing (ref dataframe.py:3233) + write_sql (ref dataframe.py:911)
  * contracts that the oracle rows don't cover: permissive paths, composite
  * keys, csv format, null keys, and the three write modes. */
class SkipExistingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("no existing path exists -> frame unchanged") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = SkipExisting.skipExisting(df,
      Seq("/tmp/graft-skip-nothing-here", "/tmp/graft-skip-nor-here"), Seq("id"))
    assert(out.count() == 2)
  }

  test("subset of paths exists -> filters against the existing subset") {
    val dir = tmp("skip-partial")
    Seq(Tuple1(1L)).toDF("id").write.mode("overwrite").parquet(s"$dir/p0")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val out = SkipExisting.skipExisting(df,
      Seq(s"$dir/p0", s"$dir/never-written"), Seq("id"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("composite keys match on the full tuple") {
    val dir = tmp("skip-composite")
    Seq((1L, "x"), (2L, "y")).toDF("id", "k").write.parquet(s"$dir/done")
    val df = Seq((1L, "x", 10), (1L, "y", 11), (2L, "y", 12), (3L, "x", 13))
      .toDF("id", "k", "v")
    val out = SkipExisting.skipExisting(df, Seq(s"$dir/done"), Seq("id", "k"))
    // (1,x) and (2,y) are processed; (1,y) and (3,x) remain
    assert(out.select("v").as[Int].collect().sorted.toSeq == Seq(11, 13))
  }

  test("csv existing data with reader options") {
    val dir = tmp("skip-csv")
    Seq(Tuple1(2L)).toDF("id").write.option("header", "true").csv(s"$dir/done")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = SkipExisting.skipExisting(df, Seq(s"$dir/done"), Seq("id"),
      format = "csv",
      readerOptions = Map("header" -> "true", "inferSchema" -> "true"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("null keys are always kept (equality never matches)") {
    val dir = tmp("skip-null")
    Seq(Tuple1(1L)).toDF("id").write.parquet(s"$dir/done")
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val out = SkipExisting.skipExisting(df, Seq(s"$dir/done"), Seq("id"))
    val got = out.select("id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.sorted.toSeq == Seq(-1L, 2L))
  }

  test("unsupported format is rejected loudly") {
    val df = Seq(Tuple1(1L)).toDF("id")
    intercept[IllegalArgumentException] {
      SkipExisting.skipExisting(df, Seq("/tmp/x"), Seq("id"), format = "avro")
    }
  }

  test("plan shape: LEFT ANTI join, small key set broadcasts (the 100 TB posture)") {
    val dir = tmp("skip-plan")
    Seq(Tuple1(1L)).toDF("id").write.parquet(s"$dir/done")
    val df = spark.range(1000).toDF("id")
    val out = SkipExisting.skipExisting(df, Seq(s"$dir/done"), Seq("id"))
    out.count() // materialize so AQE finalizes the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(500))
    // a tiny existing-key set must become the broadcast build side — the
    // probe (the 100 TB frame) never shuffles for this filter
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(500))
  }

  test("write_sql modes: overwrite resets, append accumulates, fail rejects") {
    val db = tmp("write-sql") + "/m.duckdb"
    val url = s"jdbc:duckdb:$db"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val m1 = Sql.writeSql(df, url, "t", writeMode = "overwrite").head()
    assert(m1.getLong(0) == 2L)
    val m2 = Sql.writeSql(df, url, "t", writeMode = "append").head()
    assert(m2.getLong(0) == 2L)
    val n = Sql.readSql(spark, url, "SELECT CAST(count(*) AS BIGINT) AS n FROM t").head().get(0).asInstanceOf[Number].longValue
    assert(n == 4L)
    Sql.writeSql(df, url, "t", writeMode = "overwrite").head()
    val n2 = Sql.readSql(spark, url, "SELECT CAST(count(*) AS BIGINT) AS n FROM t").head().get(0).asInstanceOf[Number].longValue
    assert(n2 == 2L)
    val ex = intercept[Exception] {
      Sql.writeSql(df, url, "t", writeMode = "fail").head()
    }
    assert(ex.getMessage.contains("already exists"))
  }

  test("append routes values by COLUMN NAME, not position") {
    val db = tmp("write-sql-order") + "/o.duckdb"
    val url = s"jdbc:duckdb:$db"
    // pre-existing table with the opposite column order
    Sql.execute(url, Seq("""CREATE TABLE t2 ("v" VARCHAR, "id" BIGINT)"""))
    val df = Seq((7L, "x")).toDF("id", "v")
    Sql.writeSql(df, url, "t2", writeMode = "append").head()
    val r = Sql.readSql(spark, url, "SELECT id, v FROM t2").head()
    assert(r.get(0).asInstanceOf[Number].longValue == 7L && r.getString(1) == "x")
  }

  test("write_sql non-primitive handling: str serializes JSON, error rejects") {
    val db = tmp("write-sql-np") + "/np.duckdb"
    val url = s"jdbc:duckdb:$db"
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    Sql.writeSql(df, url, "np", writeMode = "overwrite").head()
    val got = Sql.readSql(spark, url, "SELECT toks FROM np").head().getString(0)
    assert(got == """["a","b"]""")
    intercept[IllegalArgumentException] {
      Sql.writeSql(df, url, "np2", nonPrimitiveHandling = "error")
    }
  }
}
