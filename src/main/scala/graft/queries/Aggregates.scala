package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation coverage — one named query per AggExpr variant from
  * SURVEY.md §2.4 (reference `src/daft-dsl/src/expr/mod.rs:395-500`).
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Count modes: All / Valid / Null (ref CountMode, expr/mod.rs:397).
    * Nulls derived via nullif-style case. */
  def agg_count_modes(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("v", when(col("value") < 2.0, lit(null)).otherwise(col("value")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("count_all"),
        count(col("v")).as("count_valid"),
        sum(col("v").isNull.cast("long")).as("count_null"))
      .orderBy("event_type")

  val aggCountModesSql =
    """SELECT event_type, count(*) AS count_all,
      |  count(CASE WHEN value < 2.0 THEN NULL ELSE value END) AS count_valid,
      |  CAST(sum(CASE WHEN value < 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS count_null
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CountDistinct (exact). */
  def agg_count_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
      .orderBy("l_returnflag")

  val aggCountDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sum / Mean / Min / Max over groups. */
  def agg_basic(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        avg("l_quantity").as("mean_qty"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        min("l_shipdate").cast("date").as("min_ship"),
        max("l_returnflag").as("max_flag"))
      .orderBy("l_linestatus")

  val aggBasicSql =
    """SELECT l_linestatus, sum(l_quantity) AS sum_qty, avg(l_quantity) AS mean_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  CAST(min(l_shipdate) AS DATE) AS min_ship, max(l_returnflag) AS max_flag
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Product aggregate (ref AggExpr::Product) via graft's typed Aggregator
    * (Spark has no built-in product). Small bounded groups keep the double
    * product stable. */
  def agg_product(s: SparkSession, dir: String): DataFrame = {
    val prod = graft.functions.Udafs.productUdaf
    t(s, dir).lineitem
      .filter(col("l_orderkey") <= 40)
      .groupBy("l_orderkey")
      .agg(prod(col("l_tax") + lit(1.0)).as("tax_factor"))
      .orderBy("l_orderkey")
  }

  val aggProductSql =
    """SELECT l_orderkey, product(l_tax + 1.0) AS tax_factor
      |FROM lineitem WHERE l_orderkey <= 40
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** Stddev / Var, sample and population ddof variants
    * (ref AggExpr::Stddev/Var(ddof)). */
  def agg_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_quantity"), 4).as("sd_samp"),
        round(stddev_pop("l_quantity"), 4).as("sd_pop"),
        round(var_samp("l_quantity"), 4).as("var_s"),
        round(var_pop("l_quantity"), 4).as("var_p"))
      .orderBy("l_returnflag")

  /** Pearson correlation + covariance (ref functions/agg.py
    * pearson_correlation): Spark's codegen'd corr/covar aggregates. */
  def agg_corr(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("r"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cov_s"))
      .orderBy("l_returnflag")

  val aggCorrSql =
    """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS r,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Small-magnitude column + round(4) on both sides: Spark and DuckDB use
  // different accumulation algorithms, so last-ulp drift is expected; at
  // l_quantity scale (~50) the drift (~1e-12) can't straddle a 1e-4 boundary.
  val aggStatsSql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_samp,
      |  round(stddev_pop(l_quantity), 4) AS sd_pop,
      |  round(var_samp(l_quantity), 4) AS var_s,
      |  round(var_pop(l_quantity), 4) AS var_p
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Skewness (Spark = population skewness m3/m2^1.5; DuckDB's builtin is
    * sample-corrected, so the oracle computes the population formula from
    * raw moments). */
  def agg_skew(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .groupBy("o_orderstatus")
      .agg(skewness("o_totalprice").as("skew"))
      .orderBy("o_orderstatus")

  val aggSkewSql =
    """SELECT o_orderstatus,
      |  (sum(pow(o_totalprice - m, 3)) / count(*)) /
      |    pow(sum(pow(o_totalprice - m, 2)) / count(*), 1.5) AS skew
      |FROM (SELECT o_orderstatus, o_totalprice,
      |        avg(o_totalprice) OVER (PARTITION BY o_orderstatus) AS m
      |      FROM orders) sub
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Exact percentile + median (ref AggExpr::Percentile/Median). */
  def agg_percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000000)).as("p50_approx_exactish"),
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        median(col("l_extendedprice")).as("med_price"))
      .orderBy("l_returnflag")

  val aggPercentileSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_approx_exactish,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.9) AS p90,
      |  quantile_cont(l_extendedprice, 0.5) AS med_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ApproxCountDistinct (HLL): sketches differ across engines, so the
    * checked invariant is relative error vs the exact count. */
  def agg_approx_count_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_linestatus")
      .agg(
        countDistinct("l_partkey").as("exact_nd"),
        approx_count_distinct("l_partkey").as("approx_raw"))
      .select(
        col("l_linestatus"), col("exact_nd"),
        (abs(col("approx_raw") - col("exact_nd")) <= col("exact_nd") * 0.1).as("approx_ok"))
      .orderBy("l_linestatus")

  val aggApproxCountDistinctSql =
    """SELECT l_linestatus, count(DISTINCT l_partkey) AS exact_nd, true AS approx_ok
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** ApproxPercentile sketch (DDSketch in the reference, §2.4): checked as
    * within 5% of the exact percentile. */
  def agg_approx_percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(100)).as("p50_sketch"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
      .select(
        col("l_returnflag"),
        (abs(col("p50_sketch") - col("p50_exact")) <= col("p50_exact") * 0.05).as("sketch_ok"))
      .orderBy("l_returnflag")

  val aggApproxPercentileSql =
    """SELECT l_returnflag, true AS sketch_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** BoolAnd / BoolOr. */
  def agg_bool(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"))
      .orderBy("o_orderpriority")

  val aggBoolSql =
    """SELECT o_orderpriority,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_totalprice > 400000) AS any_over_400k
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** AnyValue — deterministic here because the group key determines the
    * value (ref AggExpr::AnyValue(ignore_nulls)). */
  def agg_any_value(s: SparkSession, dir: String): DataFrame =
    t(s, dir).nation
      .join(t(s, dir).region, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(any_value(col("r_name")).as("region_name"))
      .orderBy("n_name")

  val aggAnyValueSql =
    """SELECT n_name, any_value(r_name) AS region_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** List / Set collection aggs, canonicalized by sorting
    * (ref AggExpr::List/Set). */
  def agg_collect(s: SparkSession, dir: String): DataFrame =
    t(s, dir).nation
      .groupBy("n_regionkey")
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), "|").as("names"),
        array_join(transform(sort_array(collect_set(col("n_regionkey") * 10)),
            _.cast("string")), "|")
          .as("key_set"))
      .orderBy("n_regionkey")

  // Arrays serialized to delimited strings at the query boundary: the
  // driver's pandas-based compare cannot sort/hash ndarray cells.
  val aggCollectSql =
    """SELECT n_regionkey,
      |  array_to_string(list_sort(list(n_name)), '|') AS names,
      |  array_to_string(list_transform(list_sort(list(DISTINCT n_regionkey * 10)),
      |    x -> CAST(x AS VARCHAR)), '|') AS key_set
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** ApproxSketch/MergeSketch (ref AggExpr::ApproxSketch): DDSketch
    * quantiles as a custom mergeable Aggregator — partial sketches fold
    * per partition and merge map-side, the same split Catalyst gives HLL.
    * The oracle checks the sketch's own contract: relative error vs the
    * exact percentile within the configured α (plus interpolation slack). */
  def agg_sketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.DDSketch
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        DDSketch.sketchQuantile(col("l_extendedprice"), 0.5).as("p50_est"),
        DDSketch.sketchQuantile(col("l_extendedprice"), 0.95).as("p95_est"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_exact"))
      .select(
        col("l_returnflag"), col("n"),
        (abs(col("p50_est") / col("p50_exact") - 1) <= 0.02).as("p50_ok"),
        (abs(col("p95_est") / col("p95_exact") - 1) <= 0.02).as("p95_ok"))
      .orderBy("l_returnflag")
  }

  val aggSketchSql =
    """SELECT l_returnflag, count(*) AS n, true AS p50_ok, true AS p95_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mergeable HLL sketches (ref ApproxSketch/MergeSketch family): one
    * Datasketches HLL per group, then a sketch UNION across groups — the
    * two-level pattern that lets a 100 TB distinct-count be computed
    * incrementally (per-partition/per-day sketches persisted, merged at
    * read time) instead of re-scanning history. The estimate is checked
    * against the exact distinct within HLL's error bound. */
  def agg_hll_merge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val perStatus = o.groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perStatus
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = o.agg(countDistinct("o_custkey").as("exact_distinct"))
    merged.crossJoin(exact) // 1×1 rows — planned as a broadcast loop, not a cartesian scan
      .select(
        col("exact_distinct"),
        (abs(col("est") - col("exact_distinct")).cast("double") /
          col("exact_distinct") <= 0.05).as("hll_ok"))
  }

  val aggHllMergeSql =
    "SELECT count(DISTINCT o_custkey) AS exact_distinct, true AS hll_ok FROM orders"

  /** String-concat agg (ref AggExpr::Concat(delim)). */
  def agg_string_concat(s: SparkSession, dir: String): DataFrame =
    t(s, dir).nation
      .groupBy("n_regionkey")
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("all_names"))
      .orderBy("n_regionkey")

  val aggStringConcatSql =
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS all_names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Grouping sets / cube — not in the reference (noted superset,
    * SURVEY §2.4); free via Spark. */
  def agg_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val aggCubeSql =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Horizontal (multi-column) aggs: columns_sum/min/max/avg
    * (ref daft/functions/columnar.py). */
  def agg_horizontal(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + col("l_discount") + col("l_tax")).as("cols_sum"),
        greatest(col("l_quantity"), col("l_discount"), col("l_tax")).as("cols_max"),
        least(col("l_quantity"), col("l_discount"), col("l_tax")).as("cols_min"),
        ((col("l_quantity") + col("l_discount") + col("l_tax")) / 3).as("cols_mean"))
      .orderBy("l_orderkey", "l_linenumber")

  val aggHorizontalSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity + l_discount + l_tax AS cols_sum,
      |  greatest(l_quantity, l_discount, l_tax) AS cols_max,
      |  least(l_quantity, l_discount, l_tax) AS cols_min,
      |  (l_quantity + l_discount + l_tax) / 3 AS cols_mean
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** map_groups / flatMapGroups (ref GroupedDataFrame.map_groups,
    * dataframe.py:6495): per-group arbitrary logic — top-2 quantities. */
  def map_groups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir).lineitem
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (flag, rows) =>
        val top2 = rows.map(_._2).toArray.sorted(Ordering[Double].reverse).take(2)
        top2.zipWithIndex.map { case (q, i) => (flag, i + 1, q) }
      }
      .toDF("l_returnflag", "rank_in_group", "qty")
      .orderBy("l_returnflag", "rank_in_group")
  }

  val mapGroupsSql =
    """SELECT l_returnflag, CAST(rn AS INT) AS rank_in_group, qty FROM (
      |  SELECT l_returnflag, l_quantity AS qty,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rn
      |  FROM lineitem) sub
      |WHERE rn <= 2 ORDER BY l_returnflag, rank_in_group""".stripMargin

  /** User-defined typed aggregate (ref @daft.udaf → Aggregator[IN,BUF,OUT]):
    * weighted mean via a custom Aggregator. */
  def agg_udaf_weighted_mean(s: SparkSession, dir: String): DataFrame = {
    val wm = graft.functions.Udafs.weightedMeanUdaf
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(wm(col("l_extendedprice"), col("l_quantity")).as("wmean_price"))
      .orderBy("l_returnflag")
  }

  val aggUdafWeightedMeanSql =
    """SELECT l_returnflag,
      |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wmean_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "agg_count_modes" -> (agg_count_modes _),
    "agg_count_distinct" -> (agg_count_distinct _),
    "agg_basic" -> (agg_basic _),
    "agg_product" -> (agg_product _),
    "agg_stats" -> (agg_stats _),
    "agg_corr" -> (agg_corr _),
    "agg_skew" -> (agg_skew _),
    "agg_percentile" -> (agg_percentile _),
    "agg_approx_count_distinct" -> (agg_approx_count_distinct _),
    "agg_approx_percentile" -> (agg_approx_percentile _),
    "agg_bool" -> (agg_bool _),
    "agg_any_value" -> (agg_any_value _),
    "agg_collect" -> (agg_collect _),
    "agg_string_concat" -> (agg_string_concat _),
    "agg_sketch" -> (agg_sketch _),
    "agg_hll_merge" -> (agg_hll_merge _),
    "agg_cube" -> (agg_cube _),
    "agg_horizontal" -> (agg_horizontal _),
    "map_groups" -> (map_groups _),
    "agg_udaf_weighted_mean" -> (agg_udaf_weighted_mean _))

  val oracle: Map[String, String] = Map(
    "agg_count_modes" -> aggCountModesSql,
    "agg_count_distinct" -> aggCountDistinctSql,
    "agg_basic" -> aggBasicSql,
    "agg_product" -> aggProductSql,
    "agg_stats" -> aggStatsSql,
    "agg_corr" -> aggCorrSql,
    "agg_skew" -> aggSkewSql,
    "agg_percentile" -> aggPercentileSql,
    "agg_approx_count_distinct" -> aggApproxCountDistinctSql,
    "agg_approx_percentile" -> aggApproxPercentileSql,
    "agg_bool" -> aggBoolSql,
    "agg_any_value" -> aggAnyValueSql,
    "agg_collect" -> aggCollectSql,
    "agg_string_concat" -> aggStringConcatSql,
    "agg_sketch" -> aggSketchSql,
    "agg_hll_merge" -> aggHllMergeSql,
    "agg_cube" -> aggCubeSql,
    "agg_horizontal" -> aggHorizontalSql,
    "map_groups" -> mapGroupsSql,
    "agg_udaf_weighted_mean" -> aggUdafWeightedMeanSql)
}
