package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage — one named query per logical operator from
  * SURVEY.md §2.1 (reference `src/daft-logical-plan/src/logical_plan.rs:35-66`).
  * Each query is written so the result is deterministic (total ordering or
  * order-insensitive aggregate) and has a DuckDB oracle with identical
  * column names.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  // ---- Project / Filter / Limit / Offset ---------------------------------

  /** Project: column expressions incl. arithmetic + aliasing
    * (ref ops/project.rs). */
  def project(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        (col("l_quantity") * lit(2.0)).as("double_qty"))
      .orderBy("l_orderkey", "l_linenumber")

  val projectSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS net_price,
      |  l_quantity * 2.0 AS double_qty
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Filter: conjunctive/disjunctive predicates pushed to the scan
    * (ref ops/filter.rs). */
  def filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0) ||
              col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  val filterSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
      |   OR o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  /** Limit after total order (ref ops/limit.rs). */
  def limit(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").limit(25)

  val limitSql =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 25"

  /** Offset + limit (ref ops/offset.rs; Spark 3.4+ df.offset). */
  def offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders.orderBy("o_orderkey").select("o_orderkey", "o_custkey")
      .offset(100).limit(50)

  val offsetSql =
    "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100"

  /** TopN: sort+limit fused by Spark into TakeOrderedAndProject
    * (ref ops/top_n.rs). */
  def top_n(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_totalprice")
      .limit(15)

  val topNSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin

  // ---- Explode / Unpivot / Pivot -----------------------------------------

  /** Explode list column to rows (ref ops/explode.rs). */
  def explode_op(s: SparkSession, dir: String): DataFrame =
    t(s, dir).documents
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy("doc_id", "token")

  val explodeSql =
    """SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id, token""".stripMargin

  /** Unpivot wide→long (ref ops/unpivot.rs; Spark 3.4 df.unpivot). */
  def unpivot_op(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  val unpivotSql =
    """SELECT l_orderkey, l_linenumber, measure, val FROM (
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      |  FROM lineitem WHERE l_orderkey < 100)
      |UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** Pivot with explicit value list (ref ops/pivot.rs). */
  def pivot_op(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum("l_quantity"))
      .orderBy("l_returnflag")

  val pivotSql =
    """SELECT l_returnflag,
      |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
      |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- Sort / Distinct ----------------------------------------------------

  /** Multi-key sort with per-key direction + null placement
    * (ref ops/sort.rs). Nulls derived via nullif. */
  def sort_multi(s: SparkSession, dir: String): DataFrame =
    t(s, dir).customer
      .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .select("c_custkey", "c_nationkey", "bal")
      .orderBy(col("c_nationkey").asc, col("bal").desc_nulls_first, col("c_custkey").asc)

  val sortMultiSql =
    """SELECT c_custkey, c_nationkey,
      |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      |FROM customer
      |ORDER BY c_nationkey ASC, bal DESC NULLS FIRST, c_custkey ASC""".stripMargin

  /** Distinct over all columns (ref ops/distinct.rs). */
  def distinct_op(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val distinctSql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Dedup on a key subset, deterministically keeping the first row by a
    * defined order (Daft's dedup-on-subset; made deterministic via
    * row_number instead of dropDuplicates' arbitrary pick). */
  def distinct_subset(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the synthetic data —
    // break ties on the full remaining key so the kept row is well-defined.
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    t(s, dir).lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_orderkey")
  }

  val distinctSubsetSql =
    """SELECT l_orderkey, l_linenumber, l_partkey FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
      |  FROM lineitem) sub
      |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  // ---- Repartition family -------------------------------------------------

  /** Hash repartition on key then aggregate — result invariant under
    * partitioning (ref ops/repartition.rs RepartitionSpec::Hash). */
  def repartition_hash(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .repartition(8, col("l_suppkey"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      .orderBy("l_suppkey")

  val repartitionHashSql =
    """SELECT l_suppkey, count(*) AS n, sum(l_quantity) AS qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** Range repartition (ref RepartitionSpec::Range → repartitionByRange). */
  def repartition_range(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .repartitionByRange(8, col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("n"))
      .agg(sum("n").as("total_rows"), count(lit(1)).cast("long").as("n_parts_gt0"))

  // pid layout is Spark-specific; the invariant is total rows and 8 non-empty
  // range buckets.
  val repartitionRangeSql =
    "SELECT count(*) AS total_rows, CAST(8 AS BIGINT) AS n_parts_gt0 FROM orders"

  /** Random shuffle (ref ops/shuffle.rs) — content-invariant. */
  def shuffle_random(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .repartition(16)
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_sum"))

  // DuckDB sum(BIGINT) widens to HUGEINT; cast back so the dtype matches
  // Spark's int64 in the driver's hash compare.
  val shuffleRandomSql =
    "SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_sum FROM lineitem"

  /** Coalesce to n partitions without shuffle (ref ops/into_partitions.rs). */
  def into_partitions(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .coalesce(2)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_linestatus")

  val intoPartitionsSql =
    "SELECT l_linestatus, count(*) AS n FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"

  /** IntoBatches (ref ops/into_batches.rs): re-chunk into fixed-size batches
    * via mapPartitions; invariant = every batch except possibly one per
    * partition has exactly the requested size, and no rows are lost. */
  def into_batches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = t(s, dir).lineitem.select(col("l_orderkey")).as[Long]
    val batched = rows.mapPartitions(_.grouped(1000).map(b => b.size.toLong))
    batched.toDF("batch_size")
      .agg(sum("batch_size").as("total_rows"),
           max("batch_size").as("max_batch"))
  }

  val intoBatchesSql =
    "SELECT count(*) AS total_rows, CAST(1000 AS BIGINT) AS max_batch FROM lineitem"

  /** MonotonicallyIncreasingId (ref ops/monotonically_increasing_id.rs —
    * identical bit layout to Spark's). Invariant: ids are unique. */
  def monotonic_id(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .withColumn("id", monotonically_increasing_id())
      .agg(countDistinct("id").as("n_ids"), count(lit(1)).as("n_rows"))

  val monotonicIdSql =
    "SELECT count(*) AS n_ids, count(*) AS n_rows FROM lineitem"

  // ---- Sample -------------------------------------------------------------

  /** Sample without replacement — seeded, Spark-specific RNG so no value
    * oracle; the invariant checked is the sampled fraction staying within
    * Bernoulli-sampling bounds. */
  def sample_op(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir).lineitem
    val sampled = li.sample(withReplacement = false, fraction = 0.1, seed = 42)
      .agg(count(lit(1)).as("n_sampled"))
    val total = li.agg(count(lit(1)).as("n_total"))
    sampled.crossJoin(total)
      .select((col("n_sampled") > col("n_total") * 0.06 &&
               col("n_sampled") < col("n_total") * 0.14).as("frac_ok"))
  }

  val sampleSql = "SELECT true AS frac_ok"

  /** Absolute-size sample (ref ops/sample.rs:138 `size=`): exactly n
    * uniformly-random rows via rand-key top-n. The limit after the random
    * orderBy fuses to TakeOrderedAndProject — per-partition heaps + a
    * driver merge of n rows, never a global sort (same scale shape as
    * `top_n`). */
  def sample_size(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir).lineitem
    val sampled = li.withColumn("__r", rand(7L)).orderBy("__r").limit(137).drop("__r")
    // exact-count contract + the sample is a subset of the source domain
    sampled.agg(
      count(lit(1)).as("n"),
      min(col("l_quantity")).geq(lit(1)).and(
        max(col("l_quantity")).leq(lit(50))).as("within_domain"))
  }

  val sampleSizeSql =
    "SELECT CAST(137 AS BIGINT) AS n, true AS within_domain"

  /** Stratified sample: at most N rows per stratum, chosen by a
    * deterministic hash order (reproducible across runs and cluster
    * layouts — the property a training-data sampling stage needs for
    * resumability). Per-stratum row_number gets the WindowGroupLimit
    * pushdown, so each task keeps an N-row heap per key — no full sort. */
  def sample_stratified(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(xxhash64(col("o_orderkey")), col("o_orderkey"))
    o.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 100)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("o_orderstatus")
  }

  val sampleStratifiedSql =
    """SELECT o_orderstatus, least(count(*), 100) AS n_sampled
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- Set operations -----------------------------------------------------

  /** Concat / UNION ALL (ref ops/concat.rs). */
  def concat_op(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val a = o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
    val b = o.filter(col("o_orderstatus") === "P").select("o_orderkey", "o_orderstatus")
    a.union(b).orderBy("o_orderkey")
  }

  val concatSql =
    """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_orderkey""".stripMargin

  /** UNION DISTINCT (ref set_operations.rs SetQuantifier::Distinct). */
  def union_distinct(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir).customer
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
    val b = c.filter(col("c_mktsegment") === "MACHINERY").select("c_nationkey")
    a.union(b).distinct().orderBy("c_nationkey")
  }

  val unionDistinctSql =
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_nationkey""".stripMargin

  /** unionByName with differing column order
    * (ref UnionStrategy::ByName). */
  def union_by_name(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val a = o.filter(col("o_orderkey") < 1000).select("o_orderkey", "o_totalprice")
    val b = o.filter(col("o_orderkey") >= 29000).select("o_totalprice", "o_orderkey")
    a.unionByName(b).orderBy("o_orderkey")
  }

  val unionByNameSql =
    """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
      |UNION ALL
      |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey >= 29000
      |ORDER BY o_orderkey""".stripMargin

  /** INTERSECT (distinct) (ref set_operations.rs). */
  def intersect_op(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir).customer
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
    val b = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey")
    a.intersect(b).orderBy("c_nationkey")
  }

  val intersectSql =
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |ORDER BY c_nationkey""".stripMargin

  /** INTERSECT ALL (multiset). */
  def intersect_all(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir).lineitem
    val a = li.filter(col("l_returnflag") === "A").select("l_suppkey")
    val b = li.filter(col("l_returnflag") === "R").select("l_suppkey")
    a.intersectAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_suppkey")
  }

  val intersectAllSql =
    """SELECT l_suppkey, count(*) AS multiplicity FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      |  INTERSECT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R') sub
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** EXCEPT (distinct). */
  def except_op(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val a = o.select("o_custkey")
    val b = o.filter(col("o_totalprice") > 50000).select("o_custkey")
    a.except(b).orderBy("o_custkey")
  }

  val exceptSql =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 50000
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT ALL (multiset). */
  def except_all(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir).lineitem
    val a = li.filter(col("l_linenumber") <= 2).select("l_suppkey")
    val b = li.filter(col("l_linenumber") === 1).select("l_suppkey")
    a.exceptAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_suppkey")
  }

  val exceptAllSql =
    """SELECT l_suppkey, count(*) AS multiplicity FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
      |  EXCEPT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_linenumber = 1) sub
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  // ---- Joins (ref ops/join.rs, §2.3) --------------------------------------

  def join_inner(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.join(tt.customer, col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val joinInnerSql =
    """SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  def join_left(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val bigOrders = tt.orders.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    tt.customer.join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  val joinLeftSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer LEFT JOIN
      |  (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |   WHERE o_totalprice > 300000) o ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin

  def join_right(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val bigOrders = tt.orders.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    bigOrders.join(tt.customer, col("o_custkey") === col("c_custkey"), "right")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  val joinRightSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |      WHERE o_totalprice > 300000) o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin

  def join_outer(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val sup = tt.supplier.filter(col("s_suppkey") <= 60)
      .select(col("s_suppkey"), col("s_acctbal"))
    val li = tt.lineitem.filter(col("l_suppkey") >= 40)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_items"))
    sup.join(li, col("s_suppkey") === col("l_suppkey"), "full")
      .select("s_suppkey", "l_suppkey", "n_items", "s_acctbal")
      .orderBy(col("s_suppkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)
  }

  val joinOuterSql =
    """SELECT s_suppkey, l_suppkey, n_items, s_acctbal
      |FROM (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey <= 60) s
      |FULL JOIN (SELECT l_suppkey, count(*) AS n_items FROM lineitem
      |           WHERE l_suppkey >= 40 GROUP BY l_suppkey) l
      |  ON s_suppkey = l_suppkey
      |ORDER BY s_suppkey ASC NULLS FIRST, l_suppkey ASC NULLS FIRST""".stripMargin

  def join_semi(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.customer.join(
        tt.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val joinSemiSql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  def join_anti(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.customer.join(tt.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  def join_cross(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val r = tt.region.select(col("r_name").as("r1"))
    val r2 = tt.region.select(col("r_name").as("r2"))
    r.crossJoin(r2).orderBy("r1", "r2")
  }

  val joinCrossSql =
    """SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
      |ORDER BY r1, r2""".stripMargin

  /** Null-safe equality join (`<=>`, ref eq_null_safe misc.py:123). */
  def join_null_safe(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val a = tt.customer
      .withColumn("seg", when(col("c_nationkey") % 5 === 0, lit(null)).otherwise(col("c_mktsegment")))
      .groupBy("seg").agg(count(lit(1)).as("n_cust"))
    val b = tt.customer
      .withColumn("seg2", when(col("c_nationkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment")))
      .groupBy("seg2").agg(count(lit(1)).as("n_cust2"))
    a.join(b, col("seg") <=> col("seg2"), "inner")
      .select("seg", "n_cust", "n_cust2")
      .orderBy(col("seg").asc_nulls_first)
  }

  val joinNullSafeSql =
    """SELECT seg, n_cust, n_cust2 FROM
      |  (SELECT CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg,
      |          count(*) AS n_cust FROM customer GROUP BY 1) a
      |JOIN
      |  (SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg2,
      |          count(*) AS n_cust2 FROM customer GROUP BY 1) b
      |ON seg IS NOT DISTINCT FROM seg2
      |ORDER BY seg ASC NULLS FIRST""".stripMargin

  /** Theta (non-equi) join: band join on account balances over a reduced key
    * space (ref ops/join.rs general `on` predicate). */
  def join_theta(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val sup = tt.supplier.filter(col("s_suppkey") <= 20)
      .select(col("s_suppkey"), col("s_acctbal"))
    val cust = tt.customer.filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_acctbal"))
    sup.join(cust,
        col("c_acctbal") > col("s_acctbal") - 10 && col("c_acctbal") < col("s_acctbal") + 10)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_close"))
      .orderBy("s_suppkey")
  }

  val joinThetaSql =
    """SELECT s_suppkey, count(*) AS n_close
      |FROM (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey <= 20) s
      |JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 200) c
      |  ON c_acctbal > s_acctbal - 10 AND c_acctbal < s_acctbal + 10
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /** Range (interval) join via bucketized equi-join (ops/RangeJoin): the
    * inequality `point BETWEEN start AND end` never becomes a cartesian —
    * intervals explode to overlapped buckets, points map to one bucket,
    * and the exact predicate re-checks after the bucket equi-join. */
  def join_range(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.RangeJoin
    val pts = t(s, dir).events
      .filter(col("event_id") < 2000)
      .select(col("event_id"), (col("event_id") * 3).as("pt"))
    val ivs = t(s, dir).orders
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        (col("o_orderkey") * 5).as("ivs_start"),
        (col("o_orderkey") * 5 + pmod(col("o_orderkey"), lit(20))).as("ivs_end"))
    RangeJoin.join(pts, ivs, col("pt"), col("ivs_start"), col("ivs_end"), bucketWidth = 32)
      .select("event_id", "o_orderkey")
      .orderBy("event_id", "o_orderkey")
  }

  val joinRangeSql =
    """SELECT event_id, o_orderkey
      |FROM events JOIN orders
      |  ON event_id * 3 BETWEEN o_orderkey * 5 AND o_orderkey * 5 + o_orderkey % 20
      |WHERE event_id < 2000 AND o_orderkey < 2000
      |ORDER BY event_id, o_orderkey""".stripMargin

  // ---- Subqueries (ref Expr::Subquery/InSubquery/Exists, §2.6) ------------

  /** Scalar subquery: rows above the global average. */
  def subquery_scalar(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val avgPrice = o.agg(avg("o_totalprice").as("ap"))
    o.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap") * 1.9)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val subqueryScalarSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.9
      |ORDER BY o_orderkey""".stripMargin

  /** IN-subquery (decorrelates to a semi join). */
  def subquery_in(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val pKeys = tt.part.filter(col("p_type") === "PROMO").select(col("p_partkey"))
    tt.lineitem.join(pKeys, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val subqueryInSql =
    """SELECT l_returnflag, count(*) AS n FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated NOT EXISTS (anti join with extra predicate). */
  def subquery_not_exists(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val o = tt.orders
    val li = tt.lineitem
    o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_quantity") > 45, "left_anti")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  val subqueryNotExistsSql =
    """SELECT o_orderstatus, count(*) AS n FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- describe/summarize (ref ops/summarize.rs) --------------------------

  /** summarize: per-column count/nulls/distinct/min/max as rows.
    * Single-pass: all columns' stats come from ONE `agg` over one scan
    * (ref src/daft-logical-plan/src/ops/summarize.rs:48), then the 1-row
    * result is exploded to a row per column via graft.summarizeCols.
    */
  def summarize_op(s: SparkSession, dir: String): DataFrame = {
    import graft.implicits.GraftDataFrameOps
    t(s, dir).customer
      .summarizeColsWith(Seq("c_custkey", "c_name", "c_mktsegment"),
        approxDistinct = false) // exact for the DuckDB oracle
      .orderBy("column")
  }

  val summarizeSql =
    """SELECT * FROM (
      |SELECT 'c_custkey' AS "column", 'bigint' AS dtype, count(c_custkey) AS cnt,
      |  count(*) - count(c_custkey) AS nulls, count(DISTINCT c_custkey) AS n_distinct,
      |  CAST(min(c_custkey) AS VARCHAR) AS min_str, CAST(max(c_custkey) AS VARCHAR) AS max_str
      |FROM customer
      |UNION ALL
      |SELECT 'c_name', 'string', count(c_name), count(*) - count(c_name),
      |  count(DISTINCT c_name), min(c_name), max(c_name) FROM customer
      |UNION ALL
      |SELECT 'c_mktsegment', 'string', count(c_mktsegment), count(*) - count(c_mktsegment),
      |  count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment) FROM customer
      |) ORDER BY "column"""".stripMargin

  // ---- na.drop / fill (ref drop_null / fill_null) -------------------------

  def drop_null(s: SparkSession, dir: String): DataFrame =
    t(s, dir).customer
      .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .na.drop(Seq("bal"))
      .select("c_custkey", "bal")
      .orderBy("c_custkey")

  val dropNullSql =
    """SELECT c_custkey, c_acctbal AS bal FROM customer
      |WHERE NOT (c_acctbal < 0) ORDER BY c_custkey""".stripMargin

  def fill_null(s: SparkSession, dir: String): DataFrame =
    t(s, dir).customer
      .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .na.fill(Map("bal" -> 0.0))
      .select("c_custkey", "bal")
      .orderBy("c_custkey")

  val fillNullSql =
    """SELECT c_custkey,
      |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** with_columns / rename / exclude composition (ref dataframe.py
    * with_column(s)/exclude/with_columns_renamed). */
  def with_columns(s: SparkSession, dir: String): DataFrame =
    t(s, dir).part
      .withColumns(Map(
        "retail_eur" -> (col("p_retailprice") * 0.9),
        "big" -> (col("p_size") >= 25)))
      .withColumnsRenamed(Map("p_brand" -> "brand"))
      .drop("p_name", "p_type")
      .select("p_partkey", "brand", "retail_eur", "big")
      .orderBy("p_partkey")

  val withColumnsSql =
    """SELECT p_partkey, p_brand AS brand, p_retailprice * 0.9 AS retail_eur,
      |  p_size >= 25 AS big
      |FROM part ORDER BY p_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "project" -> (project _),
    "filter" -> (filter _),
    "limit" -> (limit _),
    "offset" -> (offset _),
    "top_n" -> (top_n _),
    "explode" -> (explode_op _),
    "unpivot" -> (unpivot_op _),
    "pivot" -> (pivot_op _),
    "sort_multi" -> (sort_multi _),
    "distinct" -> (distinct_op _),
    "distinct_subset" -> (distinct_subset _),
    "repartition_hash" -> (repartition_hash _),
    "repartition_range" -> (repartition_range _),
    "shuffle_random" -> (shuffle_random _),
    "into_partitions" -> (into_partitions _),
    "into_batches" -> (into_batches _),
    "monotonic_id" -> (monotonic_id _),
    "sample" -> (sample_op _),
    "sample_size" -> (sample_size _),
    "sample_stratified" -> (sample_stratified _),
    "concat" -> (concat_op _),
    "union_distinct" -> (union_distinct _),
    "union_by_name" -> (union_by_name _),
    "intersect" -> (intersect_op _),
    "intersect_all" -> (intersect_all _),
    "except" -> (except_op _),
    "except_all" -> (except_all _),
    "join_inner" -> (join_inner _),
    "join_left" -> (join_left _),
    "join_right" -> (join_right _),
    "join_outer" -> (join_outer _),
    "join_semi" -> (join_semi _),
    "join_anti" -> (join_anti _),
    "join_cross" -> (join_cross _),
    "join_null_safe" -> (join_null_safe _),
    "join_theta" -> (join_theta _),
    "join_range" -> (join_range _),
    "subquery_scalar" -> (subquery_scalar _),
    "subquery_in" -> (subquery_in _),
    "subquery_not_exists" -> (subquery_not_exists _),
    "summarize" -> (summarize_op _),
    "drop_null" -> (drop_null _),
    "fill_null" -> (fill_null _),
    "with_columns" -> (with_columns _))

  val oracle: Map[String, String] = Map(
    "project" -> projectSql,
    "filter" -> filterSql,
    "limit" -> limitSql,
    "offset" -> offsetSql,
    "top_n" -> topNSql,
    "explode" -> explodeSql,
    "unpivot" -> unpivotSql,
    "pivot" -> pivotSql,
    "sort_multi" -> sortMultiSql,
    "distinct" -> distinctSql,
    "distinct_subset" -> distinctSubsetSql,
    "repartition_hash" -> repartitionHashSql,
    "repartition_range" -> repartitionRangeSql,
    "shuffle_random" -> shuffleRandomSql,
    "into_partitions" -> intoPartitionsSql,
    "into_batches" -> intoBatchesSql,
    "monotonic_id" -> monotonicIdSql,
    "sample" -> sampleSql,
    "sample_size" -> sampleSizeSql,
    "sample_stratified" -> sampleStratifiedSql,
    "concat" -> concatSql,
    "union_distinct" -> unionDistinctSql,
    "union_by_name" -> unionByNameSql,
    "intersect" -> intersectSql,
    "intersect_all" -> intersectAllSql,
    "except" -> exceptSql,
    "except_all" -> exceptAllSql,
    "join_inner" -> joinInnerSql,
    "join_left" -> joinLeftSql,
    "join_right" -> joinRightSql,
    "join_outer" -> joinOuterSql,
    "join_semi" -> joinSemiSql,
    "join_anti" -> joinAntiSql,
    "join_cross" -> joinCrossSql,
    "join_null_safe" -> joinNullSafeSql,
    "join_theta" -> joinThetaSql,
    "join_range" -> joinRangeSql,
    "subquery_scalar" -> subqueryScalarSql,
    "subquery_in" -> subqueryInSql,
    "subquery_not_exists" -> subqueryNotExistsSql,
    "summarize" -> summarizeSql,
    "drop_null" -> dropNullSql,
    "fill_null" -> fillNullSql,
    "with_columns" -> withColumnsSql)
}
