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

  /** Q29 shape: regex EXTRACTION as the group key (hits' Referer-domain
    * rollup) — the regex runs per row inside the scan projection, then a
    * plain hash aggregate; no UDF. */
  def cb_regex_extract(s: SparkSession, dir: String): DataFrame =
    t(s, dir).documents
      .withColumn("src_id", regexp_extract(col("source"), "^src(\\d+)$", 1).cast("int"))
      .groupBy("src_id")
      .agg(round(avg(length(col("text"))), 6).as("l"),
        count(lit(1)).as("c"), min("source").as("m"))
      .filter(col("c") > 10)
      .orderBy(col("l").desc, col("src_id").asc)
      .limit(25)

  val cbRegexExtractSql =
    """SELECT CAST(regexp_extract(source, '^src(\d+)$', 1) AS INT) AS src_id,
      |  round(avg(length(text)), 6) AS l, count(*) AS c, min(source) AS m
      |FROM documents GROUP BY src_id HAVING count(*) > 10
      |ORDER BY l DESC, src_id ASC LIMIT 25""".stripMargin

  /** Q30 shape: a WIDE single-pass aggregate (hits does 90 sums) — one
    * scan must carry all expressions; a per-column-union plan would be a
    * regression. */
  def cb_sums_wide(s: SparkSession, dir: String): DataFrame = {
    val sums = (0 until 30).map(i => round(sum(col("value") + lit(i)), 2).as(s"s$i"))
    t(s, dir).events.agg(sums.head, sums.tail: _*)
  }

  val cbSumsWideSql =
    (0 until 30).map(i => s"round(sum(value + $i), 2) AS s$i")
      .mkString("SELECT ", ", ", " FROM events")

  /** Q31/33 shape: two-key drill-down (SearchEngineID, ClientIP) with
    * mixed aggregates under a selective filter. */
  def cb_pair_drill(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") =!= "view")
      .groupBy(col("event_type"), pmod(col("user_id"), lit(16)).as("ip_bucket"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("value") > 0.5, 1L).otherwise(0L)).as("refresh"),
        // hash-stable by construction (red in r6 AND r7 as a rounded
        // double): per-row floor(value*1000) is the same IEEE op in both
        // engines → exact longs, long sum is order-independent. The
        // division is FLOOR division on both sides — Spark's `div`
        // truncates toward zero, DuckDB's `//` floors, so a negative
        // milli-sum would diverge; subtracting pmod (always in
        // [0, count)) first makes the dividend an exact multiple, where
        // truncation and floor agree for any sign.
        expr("""(sum(CAST(floor(value * 1000) AS BIGINT))
                - pmod(sum(CAST(floor(value * 1000) AS BIGINT)), count(*)))
               div count(*)""").as("avg_milli"))
      .orderBy(col("c").desc, col("event_type").asc, col("ip_bucket").asc)
      .limit(10)

  val cbPairDrillSql =
    """SELECT event_type, user_id % 16 AS ip_bucket, count(*) AS c,
      |  CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS refresh,
      |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*) AS BIGINT) AS avg_milli
      |FROM events WHERE event_type <> 'view'
      |GROUP BY event_type, ip_bucket
      |ORDER BY c DESC, event_type ASC, ip_bucket ASC LIMIT 10""".stripMargin

  /** Q35 shape: EXPRESSIONS as group keys (ClientIP, ClientIP-1, ...) —
    * the keys are derived, not stored. */
  def cb_group_expr_keys(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy(col("user_id").as("u"),
        (col("user_id") - 1).as("u1"), (col("user_id") - 2).as("u2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("u").asc)
      .limit(10)

  val cbGroupExprKeysSql =
    """SELECT user_id AS u, user_id - 1 AS u1, user_id - 2 AS u2, count(*) AS c
      |FROM events GROUP BY u, u1, u2 ORDER BY c DESC, u ASC LIMIT 10""".stripMargin

  /** Q36-39 shape: selective flag+range filter, top-k with an OFFSET
    * page (hits' PageViews pagination). */
  def cb_topk_offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") === "click")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("k")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("k").asc)
      .offset(10)
      .limit(10)

  val cbTopkOffsetSql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS c
      |FROM events WHERE event_type = 'click'
      |GROUP BY k ORDER BY c DESC, k ASC LIMIT 10 OFFSET 10""".stripMargin

  /** Q43 shape: per-minute time series page (DATE_TRUNC + count, ordered
    * by the minute, with an offset). */
  def cb_minute_series(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") =!= "view")
      .groupBy(date_trunc("minute", col("ts")).cast("timestamp_ntz").as("m"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("m").asc)
      .offset(5)
      .limit(10)

  val cbMinuteSeriesSql =
    """SELECT date_trunc('minute', ts) AS m, count(*) AS page_views
      |FROM events WHERE event_type <> 'view'
      |GROUP BY m ORDER BY m ASC LIMIT 10 OFFSET 5""".stripMargin

  /** Q28 shape: HAVING over a count with a string-length average. */
  def cb_having(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .groupBy("event_type")
      .agg(round(avg(length(col("props"))), 6).as("l"), count(lit(1)).as("c"))
      .filter(col("c") > 100)
      .orderBy(col("l").desc, col("event_type").asc)
      .limit(25)

  val cbHavingSql =
    """SELECT event_type, round(avg(length(props)), 6) AS l, count(*) AS c
      |FROM events GROUP BY event_type HAVING count(*) > 100
      |ORDER BY l DESC, event_type ASC LIMIT 25""".stripMargin

  /** Q21/22 shape: LIKE-filtered aggregate with MIN over strings and a
    * distinct-user drill-in. */
  def cb_like_minmax(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("props").like("""%"k": 1%""") && col("event_type") =!= "view")
      .groupBy("event_type")
      .agg(min("props").as("m"), count(lit(1)).as("c"),
        countDistinct("user_id").as("u"))
      .orderBy(col("c").desc, col("event_type").asc)
      .limit(10)

  val cbLikeMinmaxSql =
    """SELECT event_type, min(props) AS m, count(*) AS c,
      |  count(DISTINCT user_id) AS u
      |FROM events WHERE props LIKE '%"k": 1%' AND event_type <> 'view'
      |GROUP BY event_type ORDER BY c DESC, event_type ASC LIMIT 10""".stripMargin

  /** Q24/25 shape: row-level top-k by event time (no aggregation — this
    * must plan as TakeOrdered, not a global sort). */
  def cb_time_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("t"))
      .orderBy(col("t").asc, col("event_id").asc)
      .limit(10)

  val cbTimeTopkSql =
    """SELECT event_id, user_id, ts AS t FROM events
      |WHERE event_type = 'error' ORDER BY t ASC, event_id ASC LIMIT 10""".stripMargin

  /** windowFunnel shape (ClickHouse `windowFunnel(86400)(ts, cond1..3)`):
    * per user, the deepest view→click→purchase chain reached in order
    * with the purchase within 24 h of its chain's view. No self-join —
    * two cascaded running-max passes over ONE user-partitioned sort:
    * `last_view` = latest view at-or-before each row; a click qualifies
    * against it; `best_v` = the best qualifying view carried through any
    * preceding click — a purchase closes level 3 iff `t − best_v ≤ 24 h`.
    * An exists-chain without materializing pairs: one shuffle, O(n log n)
    * per user, the shape that survives a billion-event day. */
  /** Per-user funnel depth over (user_id, event_type, t[µs]) rows — the
    * core of [[cb_funnel]], exposed so the property suite can drive it
    * with adversarial event permutations against a brute-force reference
    * (FunnelPropertySpec). Tie-break at equal t follows the window's
    * (t, event_type) lexicographic order. */
  def funnelLevels(e: DataFrame, day: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("t", "event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("t"))).over(byUser))
      .withColumn("best_v",
        max(when(col("event_type") === "click" && col("last_view").isNotNull,
          col("last_view"))).over(byUser))
      .groupBy("user_id")
      .agg(max(
        when(col("event_type") === "purchase" && col("best_v").isNotNull &&
          col("t") - col("best_v") <= day, 3)
        .when(col("event_type") === "click" && col("last_view").isNotNull &&
          col("t") - col("last_view") <= day, 2)
        .when(col("event_type") === "view", 1)
        .otherwise(0)).as("funnel_level"))
  }

  def cb_funnel(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir).events
    val e = raw
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        Tables.eventTimeMicros(raw, "ts").as("t"))
    funnelLevels(e)
      .groupBy("funnel_level")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_level")
  }

  val cbFunnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events WHERE event_type IN ('view','click','purchase')),
      |w1 AS (
      |  SELECT *, max(CASE WHEN event_type = 'view' THEN t END) OVER
      |    (PARTITION BY user_id ORDER BY t, event_type
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
      |  FROM e),
      |w2 AS (
      |  SELECT *, max(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
      |                     THEN last_view END) OVER
      |    (PARTITION BY user_id ORDER BY t, event_type
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best_v
      |  FROM w1),
      |lv AS (
      |  SELECT user_id, max(CASE
      |      WHEN event_type = 'purchase' AND best_v IS NOT NULL
      |           AND t - best_v <= 86400000000 THEN 3
      |      WHEN event_type = 'click' AND last_view IS NOT NULL
      |           AND t - last_view <= 86400000000 THEN 2
      |      WHEN event_type = 'view' THEN 1 ELSE 0 END) AS funnel_level
      |  FROM w2 GROUP BY user_id)
      |SELECT funnel_level, count(*) AS n_users
      |FROM lv GROUP BY funnel_level ORDER BY funnel_level""".stripMargin

  /** Retention shape (ClickHouse `retention(day0, day7, day14)`): of the
    * users active on the cohort day, how many returned exactly 7 and 14
    * days later. One conditional-aggregation pass per user then one
    * global rollup — two slim shuffles, no joins. */
  /** Cohort retention counts over (user_id, d[epoch-days]) rows — the
    * core of [[cb_retention]], exposed for the property suite. */
  def retentionCounts(activity: DataFrame, d0: Long): DataFrame = {
    val per = activity
      .groupBy("user_id")
      .agg(
        max(when(col("d") === d0, 1).otherwise(0)).as("a0"),
        max(when(col("d") === d0 + 7, 1).otherwise(0)).as("a7"),
        max(when(col("d") === d0 + 14, 1).otherwise(0)).as("a14"))
    per.agg(
      sum(col("a0")).as("day0_users"),
      sum(col("a0") * col("a7")).as("retained_7d"),
      sum(col("a0") * col("a14")).as("retained_14d"))
  }

  def cb_retention(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir).events
    // floor-div via double is exact here: 2024-era epoch-µs ≈ 1.7e15,
    // well inside a double's 53-bit mantissa
    val day = floor(Tables.eventTimeMicros(raw, "ts") / lit(86400000000L)).cast("long")
    retentionCounts(raw.select(col("user_id"), day.as("d")),
      d0 = 19723L) // 2024-01-01 in epoch-days
  }

  val cbRetentionSql =
    """WITH per AS (
      |  SELECT user_id,
      |    max(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = 19723 THEN 1 ELSE 0 END) AS a0,
      |    max(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = 19730 THEN 1 ELSE 0 END) AS a7,
      |    max(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = 19737 THEN 1 ELSE 0 END) AS a14
      |  FROM events GROUP BY user_id)
      |SELECT CAST(sum(a0) AS BIGINT) AS day0_users,
      |  CAST(sum(a0 * a7) AS BIGINT) AS retained_7d,
      |  CAST(sum(a0 * a14) AS BIGINT) AS retained_14d
      |FROM per""".stripMargin

  /** URL-hierarchy shape: build a path string, split it, group by its
    * segments (hits' URL-prefix rollups). */
  def cb_url_hierarchy(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("path", concat(col("event_type"), lit("/"),
        pmod(get_json_object(col("props"), "$.k").cast("int"), lit(10))))
      .groupBy(
        substring_index(col("path"), "/", 1).as("seg1"),
        substring_index(col("path"), "/", -1).as("seg2"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sum_v"))
      .orderBy(col("c").desc, col("seg1").asc, col("seg2").asc)
      .limit(20)

  val cbUrlHierarchySql =
    """SELECT split_part(path, '/', 1) AS seg1, split_part(path, '/', 2) AS seg2,
      |  count(*) AS c, round(sum(value), 2) AS sum_v
      |FROM (SELECT event_type || '/' ||
      |        (CAST(json_extract_string(props, '$.k') AS INT) % 10) AS path,
      |        value
      |      FROM events) t
      |GROUP BY seg1, seg2 ORDER BY c DESC, seg1 ASC, seg2 ASC LIMIT 20""".stripMargin

  /** Q11/12 shape: mobile-UA-style cardinalities — two low-cardinality
    * keys, distinct users, non-empty filter. */
  def cb_ua_cardinality(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("model", pmod(get_json_object(col("props"), "$.k").cast("int"), lit(5)))
      .filter(col("model").isNotNull)
      .groupBy(col("event_type"), col("model"))
      .agg(countDistinct("user_id").as("u"))
      .orderBy(col("u").desc, col("event_type").asc, col("model").asc)
      .limit(10)

  val cbUaCardinalitySql =
    """SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 5 AS model,
      |  count(DISTINCT user_id) AS u
      |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
      |GROUP BY event_type, model
      |ORDER BY u DESC, event_type ASC, model ASC LIMIT 10""".stripMargin

  /** Q40 shape: a CASE-derived group key alongside stored keys (hits'
    * Src = CASE WHEN ... THEN Referer ELSE '' END) with an OFFSET page. */
  def cb_case_group_key(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") =!= "view")
      .groupBy(col("event_type"),
        when(pmod(col("user_id"), lit(4)) === 0, substring(col("props"), 1, 8))
          .otherwise(lit("")).as("src"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("event_type").asc, col("src").asc)
      .offset(10)
      .limit(10)

  val cbCaseGroupKeySql =
    """SELECT event_type,
      |  CASE WHEN user_id % 4 = 0 THEN substring(props, 1, 8) ELSE '' END AS src,
      |  count(*) AS page_views
      |FROM events WHERE event_type <> 'view'
      |GROUP BY event_type, src
      |ORDER BY page_views DESC, event_type ASC, src ASC LIMIT 10 OFFSET 10""".stripMargin

  /** Q41/42 shape: highly selective conjunctive filter (IN-list + modular
    * point predicate) feeding a (key, date) rollup with an OFFSET page. */
  def cb_selective_page(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type").isin("click", "error") &&
        pmod(col("user_id"), lit(97)) === 3)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("user_id").asc, col("d").asc)
      .offset(5)
      .limit(10)

  val cbSelectivePageSql =
    """SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS page_views
      |FROM events
      |WHERE event_type IN ('click', 'error') AND user_id % 97 = 3
      |GROUP BY user_id, d
      |ORDER BY page_views DESC, user_id ASC, d ASC LIMIT 10 OFFSET 5""".stripMargin

  /** Q24 shape: SELECT * row-level top-k — FULL-WIDTH rows (all six
    * columns, including the wide props string) through TakeOrdered. */
  def cb_star_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("props").like("""%"k": 2%"""))
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .limit(10)

  val cbStarTopkSql =
    """SELECT event_id, ts, user_id, event_type, value, props FROM events
      |WHERE props LIKE '%"k": 2%' ORDER BY ts ASC, event_id ASC LIMIT 10""".stripMargin

  /** Q34/35 shape (`SELECT URL, COUNT(*) ... GROUP BY URL ORDER BY c DESC
    * LIMIT 10`): a HIGH-cardinality synthesized-string group key — the
    * URL column has no bounded domain (grows with users), so the group-by
    * hash map holds string keys and the exchange moves them. Deterministic
    * tiebreak on the key (counts tie heavily). */
  def cb_url_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      // concat (not concat_ws): `||` in the oracle propagates NULL, and
      // concat_ws silently DROPS null segments — a NULL event_type row
      // would group under 'https://ex.com/123' here but NULL there
      // (ADVICE r14). concat mirrors the || semantics exactly.
      .withColumn("url", concat(lit("https://ex.com/"),
        col("event_type"), lit("/"), col("user_id").cast("string")))
      .groupBy("url").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("url").asc)
      .limit(10)

  val cbUrlTopkSql =
    """SELECT 'https://ex.com/' || event_type || '/' ||
      |         CAST(user_id AS VARCHAR) AS url, count(*) AS c
      |FROM events GROUP BY 1 ORDER BY c DESC, url ASC LIMIT 10""".stripMargin

  /** Q39-43 shape (`... ORDER BY PageViews DESC LIMIT 10 OFFSET 1000`):
    * row-level pagination — FULL-WIDTH rows through an ordered
    * limit+offset. Spark plans CollectLimit(offset+k) and skips the
    * offset rows: bounded by offset+k however large the corpus, no
    * global sort materialization. */
  def cb_page_offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") =!= "error")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .offset(1000).limit(10)

  val cbPageOffsetSql =
    """SELECT event_id, ts, user_id, event_type, value, props FROM events
      |WHERE event_type <> 'error'
      |ORDER BY ts ASC, event_id ASC LIMIT 10 OFFSET 1000""".stripMargin

  val queries: Map[String, Q] = Map(
    "cb_url_topk" -> (cb_url_topk _),
    "cb_page_offset" -> (cb_page_offset _),
    "cb_case_group_key" -> (cb_case_group_key _),
    "cb_selective_page" -> (cb_selective_page _),
    "cb_star_topk" -> (cb_star_topk _),
    "cb_scan_aggs" -> (cb_scan_aggs _),
    "cb_cardinalities" -> (cb_cardinalities _),
    "cb_top_types" -> (cb_top_types _),
    "cb_top_users" -> (cb_top_users _),
    "cb_user_minute" -> (cb_user_minute _),
    "cb_props" -> (cb_props _),
    "cb_hourly" -> (cb_hourly _),
    "cb_quantiles" -> (cb_quantiles _),
    "cb_needle" -> (cb_needle _),
    "cb_regex_extract" -> (cb_regex_extract _),
    "cb_sums_wide" -> (cb_sums_wide _),
    "cb_pair_drill" -> (cb_pair_drill _),
    "cb_group_expr_keys" -> (cb_group_expr_keys _),
    "cb_topk_offset" -> (cb_topk_offset _),
    "cb_minute_series" -> (cb_minute_series _),
    "cb_having" -> (cb_having _),
    "cb_like_minmax" -> (cb_like_minmax _),
    "cb_time_topk" -> (cb_time_topk _),
    "cb_url_hierarchy" -> (cb_url_hierarchy _),
    "cb_ua_cardinality" -> (cb_ua_cardinality _),
    "cb_funnel" -> (cb_funnel _),
    "cb_retention" -> (cb_retention _))

  val oracle: Map[String, String] = Map(
    "cb_url_topk" -> cbUrlTopkSql,
    "cb_page_offset" -> cbPageOffsetSql,
    "cb_case_group_key" -> cbCaseGroupKeySql,
    "cb_selective_page" -> cbSelectivePageSql,
    "cb_star_topk" -> cbStarTopkSql,
    "cb_scan_aggs" -> cbScanAggsSql,
    "cb_cardinalities" -> cbCardinalitiesSql,
    "cb_top_types" -> cbTopTypesSql,
    "cb_top_users" -> cbTopUsersSql,
    "cb_user_minute" -> cbUserMinuteSql,
    "cb_props" -> cbPropsSql,
    "cb_hourly" -> cbHourlySql,
    "cb_quantiles" -> cbQuantilesSql,
    "cb_needle" -> cbNeedleSql,
    "cb_regex_extract" -> cbRegexExtractSql,
    "cb_sums_wide" -> cbSumsWideSql,
    "cb_pair_drill" -> cbPairDrillSql,
    "cb_group_expr_keys" -> cbGroupExprKeysSql,
    "cb_topk_offset" -> cbTopkOffsetSql,
    "cb_minute_series" -> cbMinuteSeriesSql,
    "cb_having" -> cbHavingSql,
    "cb_like_minmax" -> cbLikeMinmaxSql,
    "cb_time_topk" -> cbTimeTopkSql,
    "cb_url_hierarchy" -> cbUrlHierarchySql,
    "cb_ua_cardinality" -> cbUaCardinalitySql,
    "cb_funnel" -> cbFunnelSql,
    "cb_retention" -> cbRetentionSql)
}
