package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TPC-H q11..q22, adapted to the testdata schema (no partsupp, no
  * commit/receipt dates, no phone/comment columns — substitutions noted
  * per query). Mirrors the reference's full TPC-H test corpus
  * (`benchmarking/tpch/answers.py`, `tests/assets/tpch-sqlite-queries/`). */
object Tpch2 {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** On-disk parquet bytes of one table under `dir` (file or directory). */
  private def tableBytes(dir: String, table: String): Long = {
    val f = new java.io.File(s"$dir/$table.parquet")
    if (f.isFile) f.length
    else if (f.isDirectory)
      Option(f.listFiles).getOrElse(Array.empty).filter(_.isFile).map(_.length).sum
    else 0L
  }

  /** q16's dedup-map fan-out: ~10 MB of lineitem parquet per task keeps
    * each task's primitive-long distinct map cache-resident (~600k
    * entries), clamped to [parallelism, 32×parallelism]. See the q16
    * repartition comment for the tier-by-tier A/B record. */
  private[queries] def dedupWidth(s: SparkSession, dir: String): Int =
    // profiling override only (A/B-ing the width without a recompile);
    // never set by the driver — the input-proportional formula is the shape
    sys.env.get("SPARK_GRAFT_DEDUP_WIDTH").filter(_.nonEmpty).map(_.toInt).getOrElse {
      val p = s.sparkContext.defaultParallelism
      val byWork = (tableBytes(dir, "lineitem") / (10L << 20)).toInt + 1
      math.max(p, math.min(32 * p, byWork))
    }

  /** Q11 (adapted): high-value parts supplied by NATION_5 suppliers —
    * value > 0.1% of that nation's total (scalar subquery over the same
    * aggregate). */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // base feeds BOTH the threshold scalar and the final filter — the two
    // consumers share one canonicalized shuffle subtree, so ReuseExchange
    // dedups the lineitem⋈supplier join + partkey agg at execution (an
    // explicit cache lease was A/B'd in r7: the 20M-row materialization
    // cost more than the reused shuffle files)
    val base = tt.lineitem
      .join(tt.supplier.filter(col("s_nationkey") === 5), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice")).as("value"))
    val total = base.agg(sum("value").as("tot"))
    base.crossJoin(broadcast(total))
      .filter(col("value") > col("tot") * 0.001)
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  val q11Sql =
    """SELECT l_partkey, sum(l_extendedprice) AS value
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey = 5
      |GROUP BY l_partkey
      |HAVING sum(l_extendedprice) > (
      |  SELECT sum(l_extendedprice) * 0.001
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE s_nationkey = 5)
      |ORDER BY value DESC, l_partkey ASC""".stripMargin

  /** Q12 (adapted: priority classes instead of ship modes): late-shipment
    * counts by line status, split urgent/non-urgent. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // both sides projected to only the columns the query reads before the
    // fact⋈fact shuffle (the year filter keeps ~1/8 of lineitem); the
    // non-equi shipdate>orderdate predicate rides the join condition so
    // no post-join filter pass re-reads o_orderdate
    val liF = tt.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate", "l_linestatus")
    // the priority STRING never needs to cross the exchange: the query
    // only asks "is it URGENT/HIGH", so fold it to a boolean map-side
    val oSlim = tt.orders.select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("__is_high"))
    // SHUFFLE_HASH with the year-sliver lineitem as build (r10 interleaved
    // A/B at k=1000: SHJ 14.2/15.3 s vs SMJ 17.9 s; pre-slim baseline
    // ~18.8-20.5 s): replaces both SMJ sorts (150M orders + 75M lineitem
    // rows) with per-task hash builds of the SMALLER side. Scale posture:
    // the build is the date sliver (~1/8 of lineitem) and shuffle
    // partition count scales with the data, so per-task build bytes stay
    // O(partition size); rows-per-key is bounded (<=7 lineitems/order),
    // so no skewed build partition exists for AQE to miss.
    oSlim
      .join(liF.hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("__is_high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!col("__is_high"), 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12Sql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Q13: customer order-count distribution (left join, nested agg). */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // pre-aggregate orders to (custkey, count) BEFORE the customer join:
    // the shuffle then carries one slim row per customer instead of every
    // order row with its priority string. count(o_orderkey) of the
    // left-join shape is exactly coalesce(count, 0) here.
    val perCustOrders = tt.orders.filter(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
    val perCust = tt.customer.select("c_custkey")
      .join(perCustOrders,
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("__n"), lit(0L)).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14: promo revenue share in a month. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // both sides projected before the fact⋈fact shuffle: part carries
    // only (key, type), lineitem only the month sliver's three columns.
    // The sliver is a FACT (it scales with the data): left to AQE it was
    // broadcast at the 13 GB tier — scale-wrong, and the driver-side
    // broadcast build was ~90% of q14's wall (17 s wall on 1.5 s of task
    // time, r8 stage profile). SHUFFLE_HASH with the sliver as build:
    // both sides shuffle, no sort, bounded per-task builds.
    tt.lineitem
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .hint("shuffle_hash")
      .join(tt.part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("promo_revenue"))
  }

  val q14Sql =
    """SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |  / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** Q15: top supplier(s) by quarterly revenue (revenue = max revenue). */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // revenue feeds both the max scalar and the final filter. LEASED: the
    // r12 executed-plan audit showed runtime exchange reuse does NOT fire
    // here — the join branch pushes an extra isnotnull(l_suppkey) into its
    // scan, so the two exchanges stop canonicalizing equal and the
    // lineitem scan + partial agg ran TWICE every execution. The cache is
    // one row per active supplier (dim-sized however large lineitem
    // grows); both consumers read it.
    val revenue = graft.ops.Caches.lease(tt.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue")))
    val maxRev = revenue.agg(max("total_revenue").as("mr"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("mr"))
      .join(tt.supplier, col("supplier_no") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON supplier_no = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 (adapted, no partsupp): distinct supplier counts per
    * (brand, type, size-band), excluding one brand. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // Two facts shape the plan: (a) lineitem's (partkey, suppkey) pairs are
    // ~98.5% distinct here, so a pre-distinct buys nothing yet costs a full
    // fact shuffle; (b) there are only ~900 distinct (brand, type, size_band)
    // groups however large part grows (attribute domains are fixed). So tag
    // each part with a dense int gid via a broadcast of that tiny group dim,
    // and every fact-wide stage moves 12-16 byte int rows: one shuffle to
    // hash-join part (shuffle_hash — no 100TB-side sort, unlike SMJ), one
    // shuffle to dedup (gid, suppkey). The count-by-gid and the final sort
    // then run on ~900 rows. part scales with the data: never broadcast.
    val part = tt.part.filter(col("p_brand") =!= "Brand#3")
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        floor(col("p_size") / 10).cast("int").as("size_band"))
    // dense gid WITHOUT an unpartitioned window (VERDICT r12 #7: the
    // Window.orderBy here is bounded-domain — ~900 rows however large part
    // grows — but it spammed WindowExec single-partition warnings into
    // every bench log). A 1-partition sort + monotonic id is the same
    // 900-row shuffle with no warning; gid only needs to be unique and
    // small enough for the pack invariant below, which 0..n-1 is.
    val dim = graft.ops.Caches.lease(
      part.select("p_brand", "p_type", "size_band").distinct()
        .repartition(1)
        .sortWithinPartitions("p_brand", "p_type", "size_band")
        .withColumn("gid", (monotonically_increasing_id() + 1).cast("int")))
    val partG = part.join(broadcast(dim), Seq("p_brand", "p_type", "size_band"))
      .select("p_partkey", "gid")
    // single-long dedup key: gid (≤ ~2k dense) and suppkey (≤ ~1.1e11
    // after the bench fixture's key remap) pack exactly into one BIGINT.
    // The distinct's hash map then holds primitive 8-byte keys on Spark's
    // fast single-key aggregate path instead of two-field unsafe rows —
    // the r8 stage dumps showed this exact stage (zero spill, identical
    // bytes) swinging 1.0M → 3.1M cpu-ms across same-binary runs, so
    // shrinking its per-entry footprint both speeds the median and
    // narrows the host-weather exposure.
    val packBase = 1000000000000L // > any remapped l_suppkey
    // pack-invariant guard (r9 ADVICE): a suppkey outside [0, packBase)
    // would silently merge distinct (gid, suppkey) pairs — so fail loudly.
    // The domain is validated on the SMALL supplier dim (TPC-H referential
    // integrity: every l_suppkey appears there). Guarding the fact-side expression itself was A/B'd at k=1000: a
    // when+raise_error wrapper makes the packed key NULLABLE, knocking the
    // distinct off the primitive single-long fast path — 107.8 s -> 259.0 s
    // same binary, same tier. The dim check costs one tiny action instead.
    val sb = tt.supplier.agg(min("s_suppkey").as("lo"), max("s_suppkey").as("hi")).head()
    require(sb.isNullAt(0) || (sb.getLong(0) >= 0L && sb.getLong(1) < packBase),
      s"q16 pack invariant: s_suppkey domain [${sb.get(0)}, ${sb.get(1)}] " +
        s"outside [0, $packBase)")
    val packed = tt.lineitem.select("l_partkey", "l_suppkey")
      .join(partG.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .select((col("gid").cast("long") * packBase + col("l_suppkey")).as("gk"))
      // pre-repartition on the dedup key: (gid, suppkey) pairs are ~98%
      // distinct, so the map-side partial aggregate a bare .distinct()
      // plans cannot collapse anything — it just builds a scan-task-sized
      // hash map (6M+ entries/task at the SF100-equivalent tier) that
      // spills 44 GB. Shuffling raw rows first moves BOTH dedup hash maps
      // behind the exchange onto advisory-sized partitions: same exchange
      // count, same bytes, zero-spill maps. 82.9 -> 51.3 s at k=1000.
      //
      // WIDE fan-out, input-proportional (r12→r13): at cores-count
      // partitions each dedup map held ~19M primitive-long entries
      // (~300 MB — every probe an L3 miss; the r12 stage dump put 1.25M
      // cpu-ms on this one stage). Shrinking a task's map to ~600k
      // entries (~10 MB, cache-resident) measured 64.5 -> 48.7 s at
      // k=1000 (4096 partitions was WORSE, 83 s — 32 mappers x 4096 sort
      // buckets dominates). But a FIXED 32× multiplier is the wrong
      // shape: it regressed k=100 3× (7.7 -> 24.6 s official — 1024
      // near-empty sort buckets over 1 GB; VERDICT r12 #1). The width
      // that sizes maps to cache is proportional to the post-join row
      // count ≈ lineitem rows ≈ lineitem file bytes: ~10 MB of parquet
      // per task reproduces the measured optimum at both tiers (k=1000
      // ~11 GB -> 1024 after the clamp; k=100 ~1.1 GB -> ~110), clamped
      // to [parallelism, 32×parallelism] so both ends scale with cluster
      // cores at 100 TB. Explicit N (not AQE): an explicit repartition
      // is never re-split, and the posture wants dedup maps sized to
      // cache, not to core count.
    // A/B variant (VERDICT r13 #3), measured and REJECTED: the residual
    // 2× quiet-run swing is the distinct's hash maps chasing pointers
    // under memory-bandwidth contention, so sort-based dedup inside the
    // already-repartitioned partitions (Tungsten radix sort on primitive
    // longs + a streaming adjacent-equal filter) was tried as the
    // sequential-access alternative. Measured under a REAL bandwidth
    // storm (r14, interleaved same-weather pairs, bw readings
    // in-artifact): k=100 the sort variant wins narrowly every pair
    // (9.7→9.6, 8.2→8.0, 9.0→8.3 s) but at k=1000 it loses ~2×
    // (hash 98.1 s @ bw 38.1 vs sort 183.6 s @ bw 30.4) — the typed
    // mapPartitions round-trip (deserialize→filter→reserialize ~450M
    // rows) costs far more than the hash probes it replaces, and the
    // radix sort buffers are just as bandwidth-bound as the maps. The
    // hash distinct stays; toggle kept for re-measurement:
    // SPARK_GRAFT_Q16_SORTDEDUP=1.
    // r15 single-pass dedup+rollup (guide §1.2 per-task work): the shipped
    // two-phase shape planned partial+final HashAggregate back-to-back
    // above the explicit exchange — every one of the ~450M post-exchange
    // rows hashed TWICE for a ~2% collapse, then a third partial pass for
    // the gid count (r14 stage dumps: this one stage carried 0.9-1.3M
    // cpu-ms of q16's 1.7-1.9M total). SinglePass.distinctCountByGid
    // probes one open-address long set per row and folds the gid count
    // into the same pass, emitting ~900 partial rows per task. Same
    // exchange count, same exchange bytes, same per-task map footprint
    // (dedupWidth unchanged) — only the redundant passes disappear.
    // Old paths kept as toggles for re-measurement
    // (SPARK_GRAFT_Q16_TWOPHASE=1 / SPARK_GRAFT_Q16_SORTDEDUP=1);
    // A/B numbers recorded in OPTIMIZATION_r15.md.
    val counted =
      if (sys.env.get("SPARK_GRAFT_Q16_SORTDEDUP").contains("1")) {
        import s.implicits._
        packed.repartition(dedupWidth(s, dir), col("gk"))
          .sortWithinPartitions("gk")
          .as[Long]
          .mapPartitions { it =>
            var prev = -1L // gk ≥ packBase > 0, so -1 is a safe sentinel
            it.filter { x => val keep = x != prev; prev = x; keep }
          }
          .toDF("gk")
          .select(expr(s"gk div $packBase").cast("int").as("gid"))
          .groupBy("gid").agg(count(lit(1)).as("supplier_cnt"))
      } else if (sys.env.get("SPARK_GRAFT_Q16_TWOPHASE").contains("1")) {
        packed.repartition(dedupWidth(s, dir), col("gk")).distinct()
          .select(expr(s"gk div $packBase").cast("int").as("gid"))
          .groupBy("gid").agg(count(lit(1)).as("supplier_cnt"))
      } else {
        graft.ops.SinglePass
          .distinctCountByGid(packed, dedupWidth(s, dir), packBase)
          .groupBy("gid").agg(sum("cnt").as("supplier_cnt"))
      }
    counted
      .join(broadcast(dim), Seq("gid"))
      .select(col("p_brand"), col("p_type"), col("size_band"), col("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc, col("p_type").asc,
        col("size_band").asc)
  }

  val q16Sql =
    """SELECT p_brand, p_type, CAST(floor(p_size / 10) AS INT) AS size_band,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3'
      |GROUP BY p_brand, p_type, CAST(floor(p_size / 10) AS INT)
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, size_band ASC""".stripMargin

  /** Q17: small-quantity-order revenue for one brand (correlated avg). */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // part scales with the data: an explicit broadcast of the brand's key
    // set is a fact broadcast that dies at 100 TB. Bloom-prune lineitem at
    // the scan instead (bounded ~MB bitmap), then shuffle-merge the exact
    // join. brandParts leased: bloom count/build + join = one part scan.
    //
    // r12 executed-plan audit: the old shape computed `li ⋈ part` TWICE
    // (avgQty branch + final branch — two full bloomed-lineitem scans,
    // sorts, and part joins per run). Two fixes: (a) the per-partkey
    // average doesn't need the part join at all — bloom false-positive
    // partkeys compute an avg nobody joins with, and a true key's average
    // is over its own rows regardless of other keys; (b) the bloomed
    // 3-column sliver (~1/25 of lineitem for one brand) is LEASED so the
    // average pass and the exact join read one materialization.
    val brandParts = graft.ops.Caches.lease(
      tt.part.filter(col("p_brand") === "Brand#5").select("p_partkey"))
    val liPruned = graft.ops.Caches.lease(graft.ops.Prune.bloomSemiPrefilter(
      tt.lineitem.select("l_partkey", "l_quantity", "l_extendedprice"),
      "l_partkey", brandParts, "p_partkey"))
    val avgQty = liPruned.groupBy(col("l_partkey").as("ap"))
      .agg((avg("l_quantity") * 0.5).as("half_avg"))
    // r15 A/B: SMJ sorted the leased brand sliver against unique-keyed
    // brandParts — the q12/q14/q19 SHJ rule candidate. Toggle measures
    // it; numbers in OPTIMIZATION_r15.md.
    val q17Hint =
      if (sys.env.get("SPARK_GRAFT_Q17_SMJ").contains("1")) "shuffle_merge"
      else "shuffle_hash"
    liPruned
      .join(brandParts.hint(q17Hint), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg((sum("l_extendedprice") / 7.0).as("avg_yearly"))
  }

  val q17Sql =
    """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#5'
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = lineitem.l_partkey)
      |ORDER BY avg_yearly""".stripMargin

  /** Q18: large-volume customers (order qty > 300). */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // pre-repartition before the ~order-count-group aggregate — the q16
    // trick, rediscovered via the r8 stage dump: lines of an order are
    // scattered across scan partitions, so the partial-agg hash maps on
    // scan-sized tasks held ~3.6M entries each and spilled 7.0 GB at the
    // SF100-equivalent tier. Shuffling raw (orderkey, qty) rows first
    // moves the same bytes but lands BOTH agg phases on AQE-coalesced
    // (advisory-sized) partitions: zero-spill maps.
    // r15 single-pass rollup (guide §1.2 per-task work + §2.3 narrower
    // types): the two-phase shape hashed every post-exchange row twice
    // (partial+final above the exchange) for a ~4:1 collapse, and the
    // exchange carried l_quantity as a DOUBLE. l_quantity is
    // integer-valued (FixturesSpec pins the fixture contract; covPairing
    // already sums it as long), so it ships as an INT — 12 bytes/row
    // instead of 16 before compression — and the per-order sum runs in
    // ONE open-address long→long pass whose long total is bit-exact under
    // any accumulation order; the emitted double equals the two-phase
    // plan's and the oracle's. Only orders passing the HAVING leave the
    // stage. Toggle SPARK_GRAFT_Q18_TWOPHASE=1 restores the old shape;
    // A/B numbers in OPTIMIZATION_r15.md.
    val bigOrders = graft.ops.Caches.lease(
      if (sys.env.get("SPARK_GRAFT_Q18_TWOPHASE").contains("1"))
        tt.lineitem
          .select("l_orderkey", "l_quantity")
          .repartition(col("l_orderkey"))
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 300)
      else
        graft.ops.SinglePass.sumIntByKeyFiltered(
          // round-then-cast (r15 ADVICE): a bare cast("int") truncates
          // toward zero, but the FixturesSpec integrality guard tolerates
          // |q − round(q)| < 1e-9 — round() makes the cast agree with the
          // guard for a value like 5 − 1e-12
          tt.lineitem.select(col("l_orderkey"),
            round(col("l_quantity")).cast("int").as("__q")),
          300L, "l_orderkey", "total_qty"))
    // join the SELECTIVE reduction first: qty > 300 keeps a sliver of
    // orders, so orders⋈bigOrders shrinks the customer join input by
    // orders of magnitude (the old customer⋈orders-first shape shuffled
    // the full fact pair before any reduction — the classic q18 killer).
    // r10: bloom-prune ORDERS on the sliver's orderkeys before its
    // exchange (the q4/q5 shape — ~2% survive, so the 2.6 GB orders
    // shuffle collapses to tens of MB), and prune CUSTOMER the same way
    // on the sliver's custkeys; bigOrders and oBig are leased (bloom
    // count+build plus the join). A/B at k=1000 in the commit message.
    // The customer join pins SHUFFLE_HASH with the sliver as build: left
    // to AQE it broadcast CUSTOMER (a fact — the compressed tier slips
    // it under the threshold; caught by the r8 fact-broadcast sweep).
    // the sliver is fact-SCALED (qty>300 grows with the data) but its
    // lease hides that from FactBroadcastGuard (an InMemoryRelation leaf
    // has no fact name), so the no-broadcast discipline is pinned by hand
    val oBig = graft.ops.Caches.lease(graft.ops.Prune.bloomSemiPrefilter(
        tt.orders, "o_orderkey", bigOrders.select("l_orderkey"), "l_orderkey")
      .join(bigOrders.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey")))
    val custBig = graft.ops.Prune.bloomSemiPrefilter(
      tt.customer, "c_custkey", oBig.select("o_custkey"), "o_custkey")
    oBig
      .hint("shuffle_hash")
      .join(custBig, col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(100)
  }

  val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  o_totalprice, total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
      |  ON o_orderkey = big.l_orderkey
      |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC LIMIT 100""".stripMargin

  /** Q19: disjunctive brand/size/quantity predicate revenue. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // The OR-of-conjunctions doesn't push through the join by itself, but
    // its derived BOUNDS do: every disjunct needs p_brand IN (1,2,3) AND
    // p_size BETWEEN 1 AND 35 (part side) and l_quantity BETWEEN 1 AND 30
    // (lineitem side). Pushing both into the scans shrinks the join
    // inputs ~10×/~2.5× at the parquet reader (r8 shipped the UNFILTERED
    // fact⋈fact join with the OR applied after — 3.6× regression).
    // candParts scales with the data (a fact in miniature), so its key
    // set must not broadcast: bloom-prune lineitem at the scan (bounded
    // ~MB bitmap, q17's shape), then an exact shuffle join. Leased:
    // bloom count/build + join = one part scan. SHUFFLE_HASH: the build
    // is a slim unique-keyed sliver of part, so the SMJ's sort of the
    // pruned lineitem stream would be pure overhead (r8 SHJ rule).
    val candParts = graft.ops.Caches.lease(
      tt.part
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 35))
        .select("p_partkey", "p_brand", "p_size"))
    graft.ops.Prune.bloomSemiPrefilter(
        tt.lineitem.filter(col("l_quantity") >= 1 && col("l_quantity") <= 30),
        "l_partkey", candParts, "p_partkey")
      .join(candParts.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30))
      // exact decimal sum (r14 float-sum sweep): one grand total over the
      // surviving rows — double summation drifted abs 2.8e-6 vs the oracle
      // at sf0.1 (pure re-association, grows with scale); the filtered set
      // is small, so the decimal agg costs nothing next to the scan+join
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("decimal(28,4)").cast("double").as("revenue"))
  }

  val q19Sql =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
      |  * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE)
      |  AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** Q20 (adapted, no partsupp): suppliers from one nation who shipped
    * 'red' parts with total quantity > 100 (nested semi joins). */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // same fact-broadcast fix as q17: 'red' covers a constant fraction of
    // part, so its key set scales with the data — bloom-prune lineitem,
    // then an exact shuffle semi join (leased: one part scan)
    val redParts = graft.ops.Caches.lease(
      tt.part.filter(col("p_name").contains("red")).select("p_partkey"))
    // r15 A/B: the semi's SMJ sorts the ~120M-row bloomed lineitem stream
    // against a unique-keyed part sliver — the q12/q14/q19 SHJ rule says
    // the sort is pure overhead. Toggle measures it; numbers in
    // OPTIMIZATION_r15.md.
    val q20Hint =
      if (sys.env.get("SPARK_GRAFT_Q20_SMJ").contains("1")) "shuffle_merge"
      else "shuffle_hash"
    val bigSuppliers = graft.ops.Prune.bloomSemiPrefilter(
        tt.lineitem, "l_partkey", redParts, "p_partkey")
      .join(redParts.hint(q20Hint),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 100)
      .select("l_suppkey")
    tt.supplier
      .join(broadcast(tt.nation.filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .join(bigSuppliers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  val q20Sql =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      |    GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 (adapted, no receipt/commit dates): suppliers whose lines shipped
    * >90 days after order date on completed orders where some other
    * supplier shipped on time (exists + not-exists pattern). */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    // SHUFFLE_HASH on the orders side: o_orderkey is UNIQUE (no build-side
    // skew, bounded per-partition hash map), so the SMJ's two fact sorts
    // — 600M lineitem rows sorted only to merge against a unique-keyed
    // build — were pure overhead. Profiled at the SF100-equivalent tier
    // (quiet machine): SMJ shape 238 s with 21.5 GB mem + 8.4 GB disk
    // spill; SHJ shape removes the sorts and their spill. Everything
    // downstream still rides the join's hash(l_orderkey) partitioning:
    // pair agg, per-order window, and final rollup add NO exchanges.
    // status F keeps ~half of orders: bloom-prune lineitem on the F
    // orderkeys BEFORE its shuffle (r8; the split-block filter makes the
    // probe one cache line per row), halving the join's stream side.
    // oF leased: bloom count + bloom build + join = one orders scan.
    val oF = graft.ops.Caches.lease(
      tt.orders.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"))
    val li = graft.ops.Prune.bloomSemiPrefilter(
        tt.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate"),
        "l_orderkey", oF.select("o_orderkey"), "o_orderkey")
      .join(oF.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
    // ONE pass folds each (order, supplier) pair to late/on-time flags —
    // the old shape consumed li twice (two filtered DISTINCTs) and then
    // paid a pair⋈pair semi join; this is a single pair-key shuffle plus
    // a per-order rollup. "another supplier was on time" becomes
    // (order's on-time supplier count − this pair's own flag) > 0, which
    // is exactly the ls =!= os exists condition on distinct pairs.
    // Flags are projected BEFORE the aggregate so the date arithmetic
    // runs once per line in codegen, not inside both agg phases.
    val flagged = li
      .select(
        col("l_orderkey").as("lk"), col("l_suppkey").as("ls"),
        when(col("l_shipdate") > date_add(col("o_orderdate"), 90), 1)
          .otherwise(0).as("lateF"))
    if (sys.env.get("SPARK_GRAFT_Q21_WINDOW").contains("1")) {
      // pre-r15 shape, kept as a toggle: pair HashAggregate (partial+final
      // above the join's exchange) + WindowExec per-order on-time count.
      // A/B numbers in OPTIMIZATION_r15.md.
      val pairs = flagged
        .groupBy("lk", "ls")
        .agg(
          max(col("lateF")).as("late"),
          // a line is on time iff it is not late: 1 - min(lateF)
          (lit(1) - min(col("lateF"))).as("ontime"))
      val culprits = pairs
        .withColumn("n_ontime",
          sum("ontime").over(Window.partitionBy(col("lk"))))
        .filter(col("late") === 1 && col("n_ontime") - col("ontime") > 0)
      culprits
        .join(tt.supplier, col("ls") === col("s_suppkey"))
        .groupBy(col("s_name"), col("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(25)
    } else {
      // r15 single-pass culprit rollup (guide §1.2 per-task work): the
      // pair dedup, the per-order on-time count and the "another supplier
      // was on time" filter all run in ONE partition-local pass over the
      // join output (hash(lk) partitioning makes every order
      // partition-local) — removing the pair HashAggregate's redundant
      // second hashing, the full-fact Tungsten sort that WindowExec
      // demanded, and WindowExec's row-at-a-time walk. The pass emits
      // per-supplier partial counts, so the supplier join consumes a
      // supplier-domain aggregate instead of every culprit pair.
      val perSupp = graft.ops.SinglePass.q21CulpritCounts(flagged)
        .groupBy("ls").agg(sum("cnt").as("numwait"))
      perSupp
        .join(tt.supplier, col("ls") === col("s_suppkey"))
        .select(col("s_name"), col("s_suppkey"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(25)
    }
  }

  val q21Sql =
    """WITH f AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM f
      |         WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
      |ontime AS (SELECT DISTINCT l_orderkey, l_suppkey FROM f
      |           WHERE l_shipdate <= o_orderdate + INTERVAL 90 DAY)
      |SELECT s_name, s_suppkey, count(*) AS numwait
      |FROM late JOIN supplier ON late.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM ontime
      |  WHERE ontime.l_orderkey = late.l_orderkey
      |    AND ontime.l_suppkey <> late.l_suppkey)
      |GROUP BY s_name, s_suppkey
      |ORDER BY numwait DESC, s_suppkey ASC LIMIT 25""".stripMargin

  /** Q22 (adapted: nationkey bands instead of phone country codes):
    * well-funded customers with no orders. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    val eligible = tt.customer.filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
    val avgBal = eligible.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("ab"))
    eligible.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(tt.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum("c_acctbal").as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Sql =
    """SELECT c_nationkey AS cntrycode, count(*) AS numcust, sum(c_acctbal) AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 7, 9)
      |  AND c_acctbal > (
      |    SELECT avg(c_acctbal) FROM customer
      |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin

  val queries: Map[String, Q] = Map(
    "q11" -> (q11 _), "q12" -> (q12 _), "q13" -> (q13 _), "q14" -> (q14 _),
    "q15" -> (q15 _), "q16" -> (q16 _), "q17" -> (q17 _), "q18" -> (q18 _),
    "q19" -> (q19 _), "q20" -> (q20 _), "q21" -> (q21 _), "q22" -> (q22 _))

  val oracle: Map[String, String] = Map(
    "q11" -> q11Sql, "q12" -> q12Sql, "q13" -> q13Sql, "q14" -> q14Sql,
    "q15" -> q15Sql, "q16" -> q16Sql, "q17" -> q17Sql, "q18" -> q18Sql,
    "q19" -> q19Sql, "q20" -> q20Sql, "q21" -> q21Sql, "q22" -> q22Sql)
}
