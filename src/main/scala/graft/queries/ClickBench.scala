package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickBench-style analytics corpus (the reference benchmarks the 43
  * ClickBench queries, `benchmarking/clickbench/queries.sql`) adapted to
  * the testdata `events` table — the hits-table query SHAPES (point
  * filters, distinct-user cardinalities, top-k by count, per-minute
  * drill-downs, JSON property extraction, quantiles) over our schema.
  * Every ordering carries a full tiebreak so results are deterministic
  * under any parallelism. */
object ClickBench {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Q1-3 shape: global scan aggregates with a selective filter. */
  def cb_scan_aggs(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events.agg(
      count(lit(1)).as("n"),
      count(when(col("event_type") =!= "view", 1)).as("n_nonview"),
      round(sum("value"), 2).as("sum_v"),
      round(avg("value"), 6).as("avg_v"))

  val cbScanAggsSql =
    """SELECT count(*) AS n,
      |  count(CASE WHEN event_type <> 'view' THEN 1 END) AS n_nonview,
      |  round(sum(value), 2) AS sum_v, round(avg(value), 6) AS avg_v
      |FROM events""".stripMargin

  /** Q5-7 shape: distinct cardinalities + time range. */
  def cb_cardinalities(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events.agg(
      countDistinct("user_id").as("nd_users"),
      countDistinct("event_type").as("nd_types"),
      // timestamp_ntz writes parquet isAdjustedToUTC=false, matching DuckDB's
      // plain TIMESTAMP for min(ts)/max(ts) (a raw TimestampType output reads
      // back as TIMESTAMP WITH TIME ZONE and fails the oracle dtype check).
      min("ts").cast("timestamp_ntz").as("t_min"),
      max("ts").cast("timestamp_ntz").as("t_max"))

  val cbCardinalitiesSql =
    """SELECT count(DISTINCT user_id) AS nd_users,
      |  count(DISTINCT event_type) AS nd_types,
      |  min(ts) AS t_min, max(ts) AS t_max
      |FROM events""".stripMargin

  /** Q8/Q13 shape: top groups by count with distinct-user drill-in. */
  def cb_top_types(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("c"), countDistinct("user_id").as("u"))
      .orderBy(col("c").desc, col("event_type").asc)

  val cbTopTypesSql =
    """SELECT event_type, count(*) AS c, count(DISTINCT user_id) AS u
      |FROM events GROUP BY event_type ORDER BY c DESC, event_type ASC""".stripMargin

  /** Q16 shape: top users by activity. */
  def cb_top_users(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("total"))
      .orderBy(col("c").desc, col("user_id").asc)
      .limit(10)

  val cbTopUsersSql =
    """SELECT user_id, count(*) AS c, round(sum(value), 2) AS total
      |FROM events GROUP BY user_id ORDER BY c DESC, user_id ASC LIMIT 10""".stripMargin

  /** Q19 shape: per-minute drill-down per user. */
  def cb_user_minute(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy(col("user_id"), minute(col("ts")).as("m"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id").asc, col("m").asc, col("event_type").asc)
      .limit(15)

  val cbUserMinuteSql =
    """SELECT user_id, CAST(minute(ts) AS INT) AS m, event_type, count(*) AS c
      |FROM events GROUP BY user_id, m, event_type
      |ORDER BY c DESC, user_id ASC, m ASC, event_type ASC LIMIT 15""".stripMargin

  /** JSON-property analytics (hits' URL/phrase columns → our props). */
  def cb_props(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("c"), round(avg("value"), 6).as("avg_v"))
      .orderBy(col("k_bucket").asc)

  val cbPropsSql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
      |  count(*) AS c, round(avg(value), 6) AS avg_v
      |FROM events GROUP BY k_bucket ORDER BY k_bucket ASC""".stripMargin

  /** Hourly histogram (EventTime bucketing shape). */
  def cb_hourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy(hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sum_v"))
      .orderBy(col("h").asc)

  val cbHourlySql =
    """SELECT CAST(hour(ts) AS INT) AS h, count(*) AS c, round(sum(value), 2) AS sum_v
      |FROM events GROUP BY h ORDER BY h ASC""".stripMargin

  /** Exact per-group quantiles over a double measure. */
  def cb_quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy("event_type")
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"))
      .orderBy("event_type")

  // exact interpolated percentile on both sides (Spark percentile ==
  // DuckDB quantile_cont definition)
  val cbQuantilesSql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q20 shape: needle point-lookup. */
  def cb_needle(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("user_id") === 13 && col("event_type") === "error")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))

  val cbNeedleSql =
    """SELECT count(*) AS n, round(sum(value), 2) AS sum_v
      |FROM events WHERE user_id = 13 AND event_type = 'error'""".stripMargin

  val queries: Map[String, Q] = Map(
    "cb_scan_aggs" -> (cb_scan_aggs _),
    "cb_cardinalities" -> (cb_cardinalities _),
    "cb_top_types" -> (cb_top_types _),
    "cb_top_users" -> (cb_top_users _),
    "cb_user_minute" -> (cb_user_minute _),
    "cb_props" -> (cb_props _),
    "cb_hourly" -> (cb_hourly _),
    "cb_quantiles" -> (cb_quantiles _),
    "cb_needle" -> (cb_needle _))

  val oracle: Map[String, String] = Map(
    "cb_scan_aggs" -> cbScanAggsSql,
    "cb_cardinalities" -> cbCardinalitiesSql,
    "cb_top_types" -> cbTopTypesSql,
    "cb_top_users" -> cbTopUsersSql,
    "cb_user_minute" -> cbUserMinuteSql,
    "cb_props" -> cbPropsSql,
    "cb_hourly" -> cbHourlySql,
    "cb_quantiles" -> cbQuantilesSql,
    "cb_needle" -> cbNeedleSql)
}
