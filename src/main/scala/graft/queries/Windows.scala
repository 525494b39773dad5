package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function coverage — SURVEY.md §2.5 (reference
  * `src/daft-dsl/src/expr/window.rs`): the four physical cases
  * (partition-only, partition+order, partition+order+frame, order-only)
  * plus every WindowExpr variant (row_number, rank, dense_rank, lag/lead,
  * first/last value, windowed aggs) and the `min_periods` guard.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Partition-only window: group-level aggregate broadcast to rows
    * (ref sinks/window_partition_only.rs). */
  def window_partition_only(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        sum("l_quantity").over(w).as("flag_total_qty"),
        count(lit(1)).over(w).as("flag_rows"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val windowPartitionOnlySql =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  sum(l_quantity) OVER (PARTITION BY l_returnflag) AS flag_total_qty,
      |  count(*) OVER (PARTITION BY l_returnflag) AS flag_rows
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** row_number / rank / dense_rank with ties
    * (ref WindowExpr::RowNumber/Rank/DenseRank). */
  def window_ranks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val wTies = Window.partitionBy("c_mktsegment").orderBy(col("c_nationkey").asc)
    t(s, dir).customer
      .filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        row_number().over(w).as("rn"),
        rank().over(wTies).as("rk"),
        dense_rank().over(wTies).as("drk"))
      .orderBy("c_custkey")
  }

  val windowRanksSql =
    """SELECT c_custkey, c_nationkey, c_mktsegment,
      |  row_number() OVER (PARTITION BY c_nationkey
      |                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
      |  rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS rk,
      |  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS drk
      |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin

  /** lag / lead with offset + default (ref WindowExpr::Offset). */
  def window_lag_lead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir).events
      .filter(col("user_id") < 30)
      .select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 2, -1.0).over(w).as("next2_value"))
      .orderBy("user_id", "event_id")
  }

  val windowLagLeadSql =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 2, -1.0) OVER w AS next2_value
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
      |ORDER BY user_id, event_id""".stripMargin

  /** first_value / last_value incl. ignore-nulls
    * (ref WindowExpr::FirstValue/LastValue(ignore_nulls)). */
  def window_first_last(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir).events
      .filter(col("user_id") < 30)
      .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .select(
        col("event_id"), col("user_id"),
        first(col("v")).over(w).as("first_any"),
        first(col("v"), ignoreNulls = true).over(w).as("first_nonnull"),
        last(col("v"), ignoreNulls = true).over(w).as("last_nonnull"))
      .orderBy("user_id", "event_id")
  }

  val windowFirstLastSql =
    """SELECT event_id, user_id,
      |  first_value(v) OVER w AS first_any,
      |  first_value(v IGNORE NULLS) OVER w AS first_nonnull,
      |  last_value(v IGNORE NULLS) OVER w AS last_nonnull
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events WHERE user_id < 30)
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin

  /** Running aggregate: rows-frame cumulative sum + moving average
    * (ref "dynamic frame" sinks, window_partition_and_dynamic_frame.rs). */
  def window_running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir).events
      .filter(col("user_id") < 30)
      .select(
        col("event_id"), col("user_id"),
        sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_value"),
        avg("value").over(w.rowsBetween(-2, Window.currentRow)).as("ma3"),
        min("value").over(w.rowsBetween(Window.currentRow, 1)).as("min_next2"))
      .orderBy("user_id", "event_id")
  }

  val windowRunningSql =
    """SELECT event_id, user_id,
      |  sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value,
      |  avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3,
      |  min(value) OVER (w ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS min_next2
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
      |ORDER BY user_id, event_id""".stripMargin

  /** Range-frame window over a numeric ordering key
    * (ref WindowBoundary::RangeOffset). */
  def window_range_frame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
        count(lit(1)).over(w).as("n_within_5"),
        sum("l_quantity").over(w).as("qty_within_5"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val windowRangeFrameSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |  count(*) OVER w AS n_within_5,
      |  sum(l_quantity) OVER w AS qty_within_5
      |FROM lineitem WHERE l_orderkey < 300
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
      |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Order-only global window (ref sinks/window_order_by_only.rs).
    * NOTE: a global window collapses to one partition — documented scale
    * limitation in Spark as in any engine; kept bounded by the filter. */
  def window_order_only(s: SparkSession, dir: String): DataFrame = {
    // Two-pass distributed global rank + prefix sum (ops/Global) — an
    // unpartitioned Window.orderBy would run in a single task at scale.
    // Integer-exact running total (floor→long): Spark's linear prefix scan vs
    // DuckDB's segment-tree windowed sum associate double adds differently, so
    // a double cumsum drifts in the last ulps; integer sums are exact in both.
    val base = t(s, dir).orders
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_totalprice"),
        floor(col("o_totalprice")).cast("long").as("__tp"))
    graft.ops.Global.withGlobalRank(
        base,
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        "global_rank",
        runningSumOf = Some(("__tp", "running_total")))
      .select(
        col("o_orderkey"), col("o_totalprice"),
        col("global_rank").cast("int").as("global_rank"),
        col("running_total"))
      .orderBy("global_rank")
  }

  val windowOrderOnlySql =
    """SELECT o_orderkey, o_totalprice,
      |  row_number() OVER w AS global_rank,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT))
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS running_total
      |FROM orders WHERE o_orderkey < 2000
      |WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY global_rank""".stripMargin

  /** min_periods guard (Pandas-ism in the reference, window.rs:92-105):
    * emit null until k observations — via count().over >= k. */
  def window_min_periods(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-3, Window.currentRow)
    val minPeriods = 3
    t(s, dir).events
      .filter(col("user_id") < 30)
      .select(
        col("event_id"), col("user_id"),
        when(count(lit(1)).over(w) >= minPeriods, avg("value").over(w))
          .otherwise(lit(null)).as("ma4_min3"))
      .orderBy("user_id", "event_id")
  }

  val windowMinPeriodsSql =
    """SELECT event_id, user_id,
      |  CASE WHEN count(*) OVER w >= 3 THEN avg(value) OVER w END AS ma4_min3
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Windowed agg over expression (ntile as a bonus + windowed stddev). */
  def window_misc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    t(s, dir).customer
      .filter(col("c_custkey") <= 400)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cdist"),
        percent_rank().over(w).as("prank"))
      .orderBy("c_custkey")
  }

  val windowMiscSql =
    """SELECT c_custkey, c_mktsegment,
      |  ntile(4) OVER w AS quartile,
      |  cume_dist() OVER w AS cdist,
      |  percent_rank() OVER w AS prank
      |FROM customer WHERE c_custkey <= 400
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_custkey""".stripMargin

  /** Batch gaps-and-islands sessionization — the batch counterpart of the
    * three streaming sessionization paths (native session_window / FMGWS /
    * transformWithState): a >30-minute silence splits a user's events
    * into sessions; one output row per session with its event count,
    * bounds and duration.
    *
    * Scale shape: ONE hash shuffle on user_id feeds everything — the lag
    * pass, the running-sum session numbering (same window partitioning,
    * no second exchange) and the per-(user, session) aggregate (a prefix
    * of the window partitioning). Ordering ties at equal ts are harmless:
    * a tied row's gap is 0, so flags and session assignment are
    * order-invariant. */
  def window_sessionize(s: SparkSession, dir: String): DataFrame = {
    // Output keeps ts in its fixture-native encoding — Tables.events
    // deliberately passes TIMESTAMP_NTZ through unchanged so start_ts/
    // end_ts types match what DuckDB reads from the same file (re-casting
    // via eventTimeTs tz-adjusted the outputs and broke schema_match in
    // r7). Gap arithmetic runs on an epoch-µs long from the one shared
    // dispatch helper, which handles all three fixture encodings.
    val raw = t(s, dir).events
    val ev = raw.select(col("user_id"), col("ts"),
      graft.Tables.eventTimeMicros(raw, "ts").as("__us"))
    val byUser = Window.partitionBy("user_id").orderBy("__us")
    ev
      .withColumn("__prev_us", lag(col("__us"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev_us").isNull ||
          col("__us") - col("__prev_us") > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        min(col("__us")).as("__min_us"), max(col("__us")).as("__max_us"))
      .withColumn("duration_sec", expr("(__max_us - __min_us) div 1000000"))
      .drop("__min_us", "__max_us")
      .orderBy("user_id", "session_seq")
  }

  val windowSessionizeSql =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev IS NULL OR
      |      epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev AS TIMESTAMP)) > 30*60*1000000
      |      THEN 1 ELSE 0 END AS newf
      |  FROM g),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(ts) AS start_ts, max(ts) AS end_ts,
      |  (epoch_us(CAST(max(ts) AS TIMESTAMP)) - epoch_us(CAST(min(ts) AS TIMESTAMP))) // 1000000
      |    AS duration_sec
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  val queries: Map[String, Q] = Map(
    "window_sessionize" -> (window_sessionize _),
    "window_partition_only" -> (window_partition_only _),
    "window_ranks" -> (window_ranks _),
    "window_lag_lead" -> (window_lag_lead _),
    "window_first_last" -> (window_first_last _),
    "window_running" -> (window_running _),
    "window_range_frame" -> (window_range_frame _),
    "window_order_only" -> (window_order_only _),
    "window_min_periods" -> (window_min_periods _),
    "window_misc" -> (window_misc _))

  val oracle: Map[String, String] = Map(
    "window_sessionize" -> windowSessionizeSql,
    "window_partition_only" -> windowPartitionOnlySql,
    "window_ranks" -> windowRanksSql,
    "window_lag_lead" -> windowLagLeadSql,
    "window_first_last" -> windowFirstLastSql,
    "window_running" -> windowRunningSql,
    "window_range_frame" -> windowRangeFrameSql,
    "window_order_only" -> windowOrderOnlySql,
    "window_min_periods" -> windowMinPeriodsSql,
    "window_misc" -> windowMiscSql)
}
