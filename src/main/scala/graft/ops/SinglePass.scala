package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GenericInternalRow}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.plans.SinglePassAggNode

/** Single-pass per-partition aggregation kernels over an exchange the
  * query already pays (OPTIMIZATION r15, guide §1.2 "per-task work").
  *
  * Spark plans `repartition(N, k).distinct()` / `.groupBy(k).agg(...)` as
  * partial + final HashAggregate ABOVE the exchange — both passes run
  * back-to-back in one stage, so every row is hashed and probed TWICE.
  * That is free money when the partial collapses the stream, but q16's
  * dedup keys are ~98% distinct, q18's per-order groups collapse only
  * ~4:1 and q21's pairs ~1.3:1, so the partial pass is mostly wasted work
  * on the hottest stage of all three queries (r14 stage dumps: q16
  * stage560 0.9-1.3M cpu-ms, q18 stage665 0.3M, q21 stage804 0.5-1.0M —
  * the largest line of each query). OSS Spark 4.1 has no
  * skip-partial-aggregate switch, so these kernels run the aggregation in
  * ONE pass per partition directly over the shuffled UnsafeRows (no typed
  * ser/deser — the r14 q16 sort-dedup A/B lost to exactly that
  * round-trip; reading primitives off an InternalRow costs nothing).
  * Planned through [[graft.plans.SinglePassAggNode]], so Catalyst owns
  * the exchange and the whole query stays one explainable plan.
  *
  * Scale posture: identical to the two-phase plans replaced — per-task
  * state is the same hash map the final aggregate would have built
  * (partition sizing unchanged: q16 pins its cache-sized dedup width,
  * q18/q21 stay on AQE advisory sizing); exchange count and bytes are
  * unchanged. Only the redundant second hash pass (and q21's full-fact
  * WindowExec sort) disappears.
  */
object SinglePass {

  /** Loud per-task entry cap (VERDICT r15 #3 — spill safety). The
    * two-phase HashAggregate these kernels replace would SORT-SPILL when a
    * partition's per-task state outgrew execution memory; the kernels hold
    * state in heap arrays and would OOM the executor instead. A partition
    * whose distinct-entry count crosses the cap now fails FAST with sizing
    * guidance rather than degrading the whole executor. Default 1<<26
    * entries ≈ 1–2 GB of parallel-array state per task depending on kernel
    * — ~50× the largest per-task load any timed tier produces (q16 k=1000:
    * ~450M distinct keys over a 32-wide pinned exchange ≈ 14M/task).
    * Deployments with coarser partitioning raise it via
    * SPARK_GRAFT_SINGLEPASS_MAX_ENTRIES (each executor reads its own env).
    * `var` so the cap-trip unit test can force it low in local mode. */
  private[graft] var maxEntries: Int =
    sys.env.get("SPARK_GRAFT_SINGLEPASS_MAX_ENTRIES").map(_.toInt)
      .getOrElse(1 << 26)

  @inline private def checkCap(n: Int, kernel: String): Unit =
    if (n >= maxEntries) throw new IllegalStateException(
      s"$kernel: per-task distinct-entry count reached $n >= cap $maxEntries " +
        "— partition too large for in-memory single-pass aggregation; raise " +
        "the exchange's partition count (AQE advisory size / pinned width) " +
        "or raise SPARK_GRAFT_SINGLEPASS_MAX_ENTRIES")

  /** splitmix64 finalizer — q16's packed keys are highly structured
    * (gid*1e12 + suppkey); a raw mask would collide entire key ranges. */
  @inline private def mix(x0: Long): Int = {
    var x = x0
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    (x ^ (x >>> 31)).toInt
  }

  private def attr(name: String, dt: DataType) =
    AttributeReference(name, dt, nullable = false)()

  /** Minimal open-address long→long accumulator map (0 = empty-slot
    * sentinel; callers shift 0-based keys +1). r15 shipped the per-key
    * stats legs of distinctPairCountByKey / q95OrderStats /
    * q21CulpritCounts as boxed `java.util.HashMap` — one `java.lang.Long`
    * allocation (often two) per distinct key, pure GC pressure on the
    * heavies (best_cust touches one entry per distinct (part, order)
    * pair). Entry counts are bounded by the kernel's capped pair set, so
    * no separate cap is needed here. */
  private final class LongLongMap(initialCap: Int) {
    private var cap = initialCap
    private var mask = cap - 1
    private var ks = new Array[Long](cap)
    private var vs = new Array[Long](cap)
    private var n = 0
    private def grow(): Unit = {
      val ok = ks; val ov = vs
      cap <<= 2; mask = cap - 1
      require(cap > 0, "LongLongMap.grow: hash table capacity overflow")
      ks = new Array[Long](cap); vs = new Array[Long](cap)
      var j = 0
      while (j < ok.length) {
        val k = ok(j)
        if (k != 0L) {
          var i = mix(k) & mask
          while (ks(i) != 0L) i = (i + 1) & mask
          ks(i) = k; vs(i) = ov(j)
        }
        j += 1
      }
    }
    /** vs(k) += delta, inserting on first touch. k must be != 0. */
    def add(k: Long, delta: Long): Unit = {
      var i = mix(k) & mask
      var done = false
      while (!done) {
        val s = ks(i)
        if (s == k) { vs(i) += delta; done = true }
        else if (s == 0L) {
          ks(i) = k; vs(i) = delta; n += 1
          if (n * 10L >= cap * 7L) grow()
          done = true
        } else i = (i + 1) & mask
      }
    }
    def get(k: Long, absent: Long): Long = {
      var i = mix(k) & mask
      while (true) {
        val s = ks(i)
        if (s == k) return vs(i)
        if (s == 0L) return absent
        i = (i + 1) & mask
      }
      absent
    }
    def size: Int = n
    /** Iterate occupied entries (unordered — downstream consumers are
      * order-free aggregates/joins, same as HashMap iteration was). */
    def entryIterator: Iterator[(Long, Long)] = {
      val capF = cap; val ksF = ks; val vsF = vs
      (0 until capF).iterator.filter(ksF(_) != 0L).map(i => (ksF(i), vsF(i)))
    }
  }

  /** q16's dedup+rollup collapsed to one pass: distinct packed keys
    * (`gid * packBase + suppkey`, all > 0) counted per dense gid, within
    * hash(gk) partitions of pinned `width` (the caller's cache-sized
    * dedup width). Emits per-partition partial rows `(gid int, cnt long)`
    * — ~|gid domain| rows per task instead of one row per distinct key —
    * replacing `.distinct().select(gk div base).groupBy(gid).count()`:
    * one hash probe per row instead of two full aggregate passes plus a
    * third partial-count pass.
    *
    * Preconditions (enforced loudly): one LongType column, keys > 0
    * (q16's pack invariant guarantees gid ≥ 1), gid = gk / packBase in a
    * bounded dense domain (the ~900-group attribute cross-product). */
  def distinctCountByGid(packed: DataFrame, width: Int, packBase: Long): DataFrame = {
    require(packed.schema.length == 1 &&
      packed.schema.head.dataType == LongType,
      s"distinctCountByGid expects one LongType column, got ${packed.schema}")
    val plan = Bridge.analyzedPlan(packed)
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17 // ~1 MB; grows x4 toward the ~600k-entry steady size
      var mask = cap - 1
      var slots = new Array[Long](cap)
      var n = 0
      def grow(): Unit = {
        val old = slots
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        slots = new Array[Long](cap)
        var j = 0
        while (j < old.length) {
          val key = old(j)
          if (key != 0L) {
            var i = mix(key) & mask
            while (slots(i) != 0L) i = (i + 1) & mask
            slots(i) = key
          }
          j += 1
        }
      }
      var counts = new Array[Long](1024)
      var maxGid = -1
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0)) throw new IllegalStateException(
          "distinctCountByGid: null packed key — pack invariant violated")
        val gk = row.getLong(0)
        if (gk <= 0L) throw new IllegalStateException(
          s"distinctCountByGid: key $gk — pack invariant requires keys > 0")
        // open-addressing add; 0 = empty sentinel (keys are > 0)
        var i = mix(gk) & mask
        var fresh = false
        var done = false
        while (!done) {
          val s = slots(i)
          if (s == gk) done = true
          else if (s == 0L) {
            slots(i) = gk; n += 1; fresh = true
            checkCap(n, "distinctCountByGid")
            if (n * 10L >= cap * 7L) grow() // 0.7 load factor
            done = true
          } else i = (i + 1) & mask
        }
        if (fresh) {
          val gid = (gk / packBase).toInt
          if (gid >= counts.length) {
            val bigger = new Array[Long](java.lang.Integer.highestOneBit(gid) << 1)
            System.arraycopy(counts, 0, bigger, 0, counts.length)
            counts = bigger
          }
          counts(gid) += 1L
          if (gid > maxGid) maxGid = gid
        }
      }
      val cF = counts; val mG = maxGid
      (0 to mG).iterator.filter(cF(_) > 0L).map { gid =>
        new GenericInternalRow(Array[Any](gid, cF(gid))): InternalRow
      }
    }
    Bridge.ofRows(packed.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), Some(width),
      Seq(attr("gid", IntegerType), attr("cnt", LongType)),
      "distinctCountByGid", kernel))
  }

  /** q18's per-key rollup collapsed to one pass: sum an integer value per
    * long key within hash(key) partitions (AQE-sized), keep keys whose
    * total exceeds `minTotal`. Emits `(key long, total double)` — only
    * the sliver that survives the HAVING leaves the stage. The long sum
    * is exact for integer-valued inputs under any accumulation order
    * (q18's l_quantity is integral — FixturesSpec pins the contract), so
    * the emitted double is bit-equal to the two-phase plan's and the
    * oracle's. */
  def sumIntByKeyFiltered(df: DataFrame, minTotal: Long,
      keyName: String, totalName: String): DataFrame = {
    require(df.schema.length == 2 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == IntegerType,
      s"sumIntByKeyFiltered expects (LongType, IntegerType), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17
      var mask = cap - 1
      var keys = new Array[Long](cap)
      var sums = new Array[Long](cap)
      var n = 0
      def grow(): Unit = {
        val ok = keys; val os = sums
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        keys = new Array[Long](cap); sums = new Array[Long](cap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & mask
            while (keys(i) != 0L) i = (i + 1) & mask
            keys(i) = k; sums(i) = os(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1)) throw new IllegalStateException(
          "sumIntByKeyFiltered: null key/value — fixture contract violated")
        val k0 = row.getLong(0)
        if (k0 < 0L) throw new IllegalStateException(
          s"sumIntByKeyFiltered: key $k0 — keys must be >= 0")
        val k = k0 + 1L // slot sentinel is 0; fixture keys are 0-based
        val v = row.getInt(1).toLong
        var i = mix(k) & mask
        var done = false
        while (!done) {
          val s = keys(i)
          if (s == k) { sums(i) += v; done = true }
          else if (s == 0L) {
            keys(i) = k; sums(i) = v; n += 1
            checkCap(n, "sumIntByKeyFiltered")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      val capF = cap; val keysF = keys; val sumsF = sums; val t = minTotal
      (0 until capF).iterator
        .filter(i => keysF(i) != 0L && sumsF(i) > t)
        .map { i =>
          new GenericInternalRow(
            Array[Any](keysF(i) - 1L, sumsF(i).toDouble)): InternalRow
        }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr(keyName, LongType), attr(totalName, DoubleType)),
      "sumIntByKeyFiltered", kernel))
  }

  /** Generic per-key double sum in one pass: `(key long, val double)` →
    * `(keyName long, sumName double)` within hash(key) partitions
    * (AQE-sized). For streams whose map-side partial aggregate collapses
    * ~nothing (q9's (suppkey, year) groups see ~96% of their domain in
    * EVERY map task — the r14 stage dump's 1.3 GB partial output vs
    * 120M-row input), the partial pass is a full extra hash pass bought
    * for a few percent of shuffle bytes; this trades it back. Caller
    * packs composite keys into one positive long (collision-free by
    * construction) and unpacks with integer arithmetic after. Double
    * accumulation re-associates exactly like the two-phase plan does
    * (per-partition partial order is plan-dependent in both). */
  def sumDoubleByKey(df: DataFrame, keyName: String, sumName: String): DataFrame = {
    require(df.schema.length == 2 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == DoubleType,
      s"sumDoubleByKey expects (LongType, DoubleType), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17
      var mask = cap - 1
      var keys = new Array[Long](cap)
      var sums = new Array[Double](cap)
      var n = 0
      def grow(): Unit = {
        val ok = keys; val os = sums
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        keys = new Array[Long](cap); sums = new Array[Double](cap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & mask
            while (keys(i) != 0L) i = (i + 1) & mask
            keys(i) = k; sums(i) = os(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1)) throw new IllegalStateException(
          "sumDoubleByKey: null key/value — caller contract violated")
        val k0 = row.getLong(0)
        if (k0 < 0L) throw new IllegalStateException(
          s"sumDoubleByKey: key $k0 — keys must be >= 0")
        val k = k0 + 1L // slot sentinel is 0; keys may be 0-based
        val v = row.getDouble(1)
        var i = mix(k) & mask
        var done = false
        while (!done) {
          val s = keys(i)
          if (s == k) { sums(i) += v; done = true }
          else if (s == 0L) {
            keys(i) = k; sums(i) = v; n += 1
            checkCap(n, "sumDoubleByKey")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      val capF = cap; val keysF = keys; val sumsF = sums
      (0 until capF).iterator
        .filter(i => keysF(i) != 0L)
        .map { i =>
          new GenericInternalRow(Array[Any](keysF(i) - 1L, sumsF(i))): InternalRow
        }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr(keyName, LongType), attr(sumName, DoubleType)),
      "sumDoubleByKey", kernel))
  }

  /** Distinct (k1, k2) pairs counted per k1 in one pass, clustered by k1
    * (AQE-sized exchange). The r15 clean-host TPC-DS timing exposed
    * best_cust's `groupBy(l_partkey).agg(size(collect_set(l_orderkey)))`
    * at 406.6 s @ bw 49.3 (k=1000): partkeys are SCATTERED across the
    * lineitem scan, so the ObjectHashAggregate partial collapses ~nothing
    * yet wraps every row in a per-key set object, and past the sort-based
    * fallback threshold every map task silently becomes a SORT of its
    * whole input. This kernel exchanges raw 16-byte pairs instead and
    * counts first-seen pairs per k1 with two primitive open-address maps
    * — no objects, no sort, one pass. Emits `(keyName long, cntName
    * long)` — one row per distinct k1 per task (k1-clustered, so globally
    * one row per k1). Keys must be ≥ 0 (0-based fixture keys; stored
    * shifted). */
  def distinctPairCountByKey(df: DataFrame,
      keyName: String, cntName: String): DataFrame = {
    require(df.schema.length == 2 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == LongType,
      s"distinctPairCountByKey expects (LongType, LongType), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      // pair set (k1+1, k2) — parallel arrays, 0-in-first = empty slot
      var cap = 1 << 17
      var mask = cap - 1
      var a1 = new Array[Long](cap)
      var a2 = new Array[Long](cap)
      var n = 0
      def grow(): Unit = {
        val o1 = a1; val o2 = a2
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        a1 = new Array[Long](cap); a2 = new Array[Long](cap)
        var j = 0
        while (j < o1.length) {
          if (o1(j) != 0L) {
            var i = mix(o1(j) * 0x9e3779b97f4a7c15L + o2(j)) & mask
            while (a1(i) != 0L) i = (i + 1) & mask
            a1(i) = o1(j); a2(i) = o2(j)
          }
          j += 1
        }
      }
      // k1 -> distinct-pair count (primitive map — r16, VERDICT r15 #5:
      // the boxed HashMap allocated a Long per distinct pair)
      val counts = new LongLongMap(1 << 16)
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1)) throw new IllegalStateException(
          "distinctPairCountByKey: null key — caller contract violated")
        val k0 = row.getLong(0)
        if (k0 < 0L) throw new IllegalStateException(
          s"distinctPairCountByKey: key $k0 — keys must be >= 0")
        val k1 = k0 + 1L
        val k2 = row.getLong(1)
        var i = mix(k1 * 0x9e3779b97f4a7c15L + k2) & mask
        var done = false
        while (!done) {
          if (a1(i) == k1 && a2(i) == k2) done = true
          else if (a1(i) == 0L) {
            a1(i) = k1; a2(i) = k2; n += 1
            checkCap(n, "distinctPairCountByKey")
            if (n * 10L >= cap * 7L) grow()
            counts.add(k1, 1L)
            done = true
          } else i = (i + 1) & mask
        }
      }
      counts.entryIterator.map { case (k, c) =>
        new GenericInternalRow(Array[Any](k - 1L, c)): InternalRow
      }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr(keyName, LongType), attr(cntName, LongType)),
      "distinctPairCountByKey", kernel))
  }

  /** multi_supp's per-order rollup in one pass: for rows
    * `(lk long, ls long, isR int, rev long)` clustered by lk, computes
    * per order the distinct supplier count, the any-returned flag and the
    * exact long revenue sum, and emits `(lk, rev)` ONLY for orders with
    * ≥ minDistinct suppliers and a returned line — the sliver the
    * downstream orders join consumes. Replaces
    * `groupBy(l_orderkey).agg(size(collect_set), max(when), sum)` whose
    * ObjectHashAggregate measured 253.9 s @ bw 53.0 at k=1000 (clean
    * host, r15) — the set objects + sort-based fallback, same disease as
    * [[distinctPairCountByKey]]. */
  def q95OrderStats(df: DataFrame, minDistinct: Int,
      keyName: String, revName: String): DataFrame = {
    require(df.schema.length == 4 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == LongType &&
      df.schema(2).dataType == IntegerType && df.schema(3).dataType == LongType,
      s"q95OrderStats expects (Long, Long, Int, Long), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      // pair set (lk+1, ls): distinct suppliers per order
      var cap = 1 << 17
      var mask = cap - 1
      var a1 = new Array[Long](cap)
      var a2 = new Array[Long](cap)
      var n = 0
      def grow(): Unit = {
        val o1 = a1; val o2 = a2
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        a1 = new Array[Long](cap); a2 = new Array[Long](cap)
        var j = 0
        while (j < o1.length) {
          if (o1(j) != 0L) {
            var i = mix(o1(j) * 0x9e3779b97f4a7c15L + o2(j)) & mask
            while (a1(i) != 0L) i = (i + 1) & mask
            a1(i) = o1(j); a2(i) = o2(j)
          }
          j += 1
        }
      }
      // lk -> (ns, hr, rev) — parallel primitive arrays (r16, VERDICT r15
      // #5: was a boxed HashMap holding a fresh Array[Long](3) per order)
      var sCap = 1 << 16
      var sMask = sCap - 1
      var sk = new Array[Long](sCap)
      var sNs = new Array[Long](sCap)
      var sHr = new Array[Long](sCap)
      var sRev = new Array[Long](sCap)
      var sN = 0
      def sGrow(): Unit = {
        val ok = sk; val oNs = sNs; val oHr = sHr; val oRev = sRev
        sCap <<= 2; sMask = sCap - 1
        require(sCap > 0, "q95OrderStats.sGrow: hash table capacity overflow")
        sk = new Array[Long](sCap); sNs = new Array[Long](sCap)
        sHr = new Array[Long](sCap); sRev = new Array[Long](sCap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & sMask
            while (sk(i) != 0L) i = (i + 1) & sMask
            sk(i) = k; sNs(i) = oNs(j); sHr(i) = oHr(j); sRev(i) = oRev(j)
          }
          j += 1
        }
      }
      // slot index for key k (nonzero), inserting an empty entry on first
      // touch; grows BEFORE insertion so the returned index stays valid
      def sIdx(k: Long): Int = {
        var i = mix(k) & sMask
        while (true) {
          val s = sk(i)
          if (s == k) return i
          if (s == 0L) {
            if ((sN + 1) * 10L >= sCap * 7L) { sGrow(); return sIdx(k) }
            sk(i) = k; sN += 1
            return i
          }
          i = (i + 1) & sMask
        }
        -1
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
          throw new IllegalStateException(
            "q95OrderStats: null input — caller contract violated")
        val lk0 = row.getLong(0)
        if (lk0 < 0L) throw new IllegalStateException(
          s"q95OrderStats: key $lk0 — keys must be >= 0")
        val lk = lk0 + 1L
        val ls = row.getLong(1)
        val isR = row.getInt(2)
        val rev = row.getLong(3)
        val si = sIdx(lk)
        sHr(si) |= isR.toLong
        sRev(si) += rev
        var i = mix(lk * 0x9e3779b97f4a7c15L + ls) & mask
        var done = false
        while (!done) {
          if (a1(i) == lk && a2(i) == ls) done = true
          else if (a1(i) == 0L) {
            a1(i) = lk; a2(i) = ls; n += 1
            checkCap(n, "q95OrderStats")
            if (n * 10L >= cap * 7L) grow()
            sNs(si) += 1L
            done = true
          } else i = (i + 1) & mask
        }
      }
      val md = minDistinct.toLong
      val sCapF = sCap; val skF = sk
      val sNsF = sNs; val sHrF = sHr; val sRevF = sRev
      (0 until sCapF).iterator
        .filter(i => skF(i) != 0L && sNsF(i) >= md && sHrF(i) == 1L)
        .map { i =>
          new GenericInternalRow(Array[Any](skF(i) - 1L, sRevF(i))): InternalRow
        }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr(keyName, LongType), attr(revName, LongType)),
      "q95OrderStats", kernel))
  }

  /** q21's pair-rollup + per-order window + culprit filter collapsed to
    * one pass. Input: raw joined rows `(lk long, ls long, lateF int)`
    * (order, supplier, 1 = this line shipped late), clustered by lk —
    * EnsureRequirements adds no exchange when the upstream join already
    * hash(lk)-partitions the stream, so the kernel fuses onto the join
    * stage. The two-phase shape paid: (a) partial+final HashAggregate
    * over the ~near-distinct (lk, ls) pairs (~1.3:1 collapse — mostly
    * wasted double hashing), (b) a full Tungsten sort of every pair for
    * WindowExec's partition-by-lk walk, (c) WindowExec itself
    * (row-at-a-time, no codegen). One open-address (lk, ls)→flag-bits
    * pass replaces (a); a per-lk on-time count over the deduped entries
    * replaces (b)+(c); the culprit test — pair was late AND its order has
    * an on-time DIFFERENT supplier, i.e. `n_ontime(lk) − own_ontime > 0`
    * — folds into per-supplier partial counts `(ls, cnt)`, so each task
    * emits ≤|its culprit suppliers| rows instead of every culprit pair.
    * Downstream: `groupBy(ls).sum(cnt)` = numwait, then the supplier
    * join. Per-task state is two open maps over the partition's pairs —
    * same order of footprint as the hash-aggregate + sort buffers it
    * replaces, sized by AQE's advisory partitioning. */
  def q21CulpritCounts(df: DataFrame): DataFrame = {
    require(df.schema.length == 3 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == LongType &&
      df.schema(2).dataType == IntegerType,
      s"q21CulpritCounts expects (LongType, LongType, IntegerType), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      // (lk, ls) -> flags (bit0 = some line late, bit1 = some line
      // on time); lk = 0 marks an empty slot (0-based fixture keys are
      // stored shifted +1, matching the lk0 + 1 below)
      var cap = 1 << 17
      var mask = cap - 1
      var kLk = new Array[Long](cap)
      var kLs = new Array[Long](cap)
      var fl = new Array[Byte](cap)
      var n = 0
      def grow(): Unit = {
        val oLk = kLk; val oLs = kLs; val oF = fl
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        kLk = new Array[Long](cap); kLs = new Array[Long](cap)
        fl = new Array[Byte](cap)
        var j = 0
        while (j < oLk.length) {
          if (oLk(j) != 0L) {
            var i = mix(oLk(j) * 0x9e3779b97f4a7c15L + oLs(j)) & mask
            while (kLk(i) != 0L) i = (i + 1) & mask
            kLk(i) = oLk(j); kLs(i) = oLs(j); fl(i) = oF(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
          throw new IllegalStateException(
            "q21CulpritCounts: null key/flag — join output contract violated")
        val lk0 = row.getLong(0)
        if (lk0 < 0L) throw new IllegalStateException(
          s"q21CulpritCounts: key $lk0 — keys must be >= 0")
        val lk = lk0 + 1L // slot sentinel is 0; fixture keys are 0-based
        val ls = row.getLong(1)
        val bit = if (row.getInt(2) == 1) 1 else 2 // late : on time
        var i = mix(lk * 0x9e3779b97f4a7c15L + ls) & mask
        var done = false
        while (!done) {
          if (kLk(i) == lk && kLs(i) == ls) {
            fl(i) = (fl(i) | bit).toByte; done = true
          } else if (kLk(i) == 0L) {
            kLk(i) = lk; kLs(i) = ls; fl(i) = bit.toByte; n += 1
            checkCap(n, "q21CulpritCounts")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      // per-lk on-time supplier count over the DEDUPED pairs (primitive
      // maps — r16, VERDICT r15 #5: were boxed HashMaps; lk is already
      // stored shifted +1 so nonzero, ls shifts +1 here)
      val ontime = new LongLongMap(1 << 16)
      var j = 0
      while (j < cap) {
        if (kLk(j) != 0L && (fl(j) & 2) != 0)
          ontime.add(kLk(j), 1L)
        j += 1
      }
      // culprit pairs folded to per-supplier partial counts
      val bySupp = new LongLongMap(1 << 12)
      j = 0
      while (j < cap) {
        if (kLk(j) != 0L && (fl(j) & 1) != 0) {
          val tot = ontime.get(kLk(j), 0L)
          val others = tot - (if ((fl(j) & 2) != 0) 1L else 0L)
          if (others > 0) bySupp.add(kLs(j) + 1L, 1L)
        }
        j += 1
      }
      bySupp.entryIterator.map { case (k, c) =>
        new GenericInternalRow(Array[Any](k - 1L, c)): InternalRow
      }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr("ls", LongType), attr("cnt", LongType)),
      "q21CulpritCounts", kernel))
  }

  /** priceChain's per-(part, year) unit-price rollup + consecutive-year
    * drop detection collapsed to one pass (OPTIMIZATION r16). Input: raw
    * joined rows `(pk long, yr int, p long cents, q double)` clustered by
    * hash(pk) — ALL years of a part land in one task, so the cross-year
    * comparison is a local probe instead of the shipped shape's leased
    * self-join (materialize part×years twice + SHJ build over the full
    * fact-derived frame). The (pk, yr) partial aggregate it replaces
    * collapsed ~nothing (120M joined rows over a ~0.85×-domain of
    * (part, yr) groups — the q9 disease), so the exchange bytes are the
    * same and the partial hash pass was pure waste. Packing:
    * `(pk+1) << 12 | yr` with yr ∈ [1, 4094] (loud guard) — the packed
    * key is always > 0 (0 stays the empty-slot sentinel) and the previous
    * year's slot is literally `key - 1`. Price math replicates the
    * two-phase plan's exact IEEE sequence: psum is an exact long of
    * cents, qsum a sum of integral doubles (exact under any order), and
    * the filter compares `(psum.toDouble/100.0)/qsum <
    * ((ppsum.toDouble/100.0)/pqsum) * dropRatio` — bit-identical to
    * `money2(sum)/sum` division in the Spark shape and the oracle (cents
    * and quantities arrive as 4-byte ints — guide §2.3 narrower exchange
    * types; both sums accumulate in exact longs, and a sum of integral
    * values converts to double exactly, so the division sequence is the
    * same IEEE ops as the two-phase plan's `money2(sum(long)) /
    * sum(double)`). Emits `(pk long, yr int)` drop pairs; output column 0
    * carries the clustering key unchanged, so the node is key-preserving
    * and the downstream part join reuses the exchange. */
  def priceDropPairs(df: DataFrame, dropRatio: Double): DataFrame = {
    require(df.schema.length == 4 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == IntegerType &&
      df.schema(2).dataType == IntegerType && df.schema(3).dataType == IntegerType,
      s"priceDropPairs expects (Long, Int, Int, Int), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val ratio = dropRatio
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17
      var mask = cap - 1
      var keys = new Array[Long](cap)   // (pk+1)<<12 | yr; 0 = empty
      var ps = new Array[Long](cap)     // exact cents sum
      var qs = new Array[Long](cap)     // exact integral quantity sum
      var n = 0
      def grow(): Unit = {
        val ok = keys; val op = ps; val oq = qs
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        keys = new Array[Long](cap); ps = new Array[Long](cap)
        qs = new Array[Long](cap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & mask
            while (keys(i) != 0L) i = (i + 1) & mask
            keys(i) = k; ps(i) = op(j); qs(i) = oq(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
          throw new IllegalStateException(
            "priceDropPairs: null input — caller contract violated")
        val pk0 = row.getLong(0)
        if (pk0 < 0L || pk0 >= (1L << 51) - 1L) throw new IllegalStateException(
          s"priceDropPairs: partkey $pk0 outside packable domain [0, 2^51-1)")
        val yr = row.getInt(1)
        if (yr < 1 || yr > 4094) throw new IllegalStateException(
          s"priceDropPairs: year $yr outside [1, 4094] — pack invariant violated")
        val k = (pk0 + 1L) << 12 | yr.toLong
        val p = row.getInt(2).toLong
        val q = row.getInt(3).toLong
        var i = mix(k) & mask
        var done = false
        while (!done) {
          val s = keys(i)
          if (s == k) { ps(i) += p; qs(i) += q; done = true }
          else if (s == 0L) {
            keys(i) = k; ps(i) = p; qs(i) = q; n += 1
            checkCap(n, "priceDropPairs")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      // drop pass: for each (pk, yr) entry the previous year's slot is
      // key-1; a yr=1 probe targets yr=0 which is never inserted (guard),
      // so it misses — exactly the inner self-join's semantics
      val capF = cap; val maskF = mask
      val keysF = keys; val psF = ps; val qsF = qs
      def probe(k: Long): Int = {
        var i = mix(k) & maskF
        while (true) {
          val s = keysF(i)
          if (s == k) return i
          if (s == 0L) return -1
          i = (i + 1) & maskF
        }
        -1
      }
      (0 until capF).iterator.flatMap { j =>
        val k = keysF(j)
        if (k == 0L) Iterator.empty
        else {
          val pi = probe(k - 1L)
          if (pi < 0) Iterator.empty
          else {
            val cur = (psF(j).toDouble / 100.0) / qsF(j).toDouble
            val prev = (psF(pi).toDouble / 100.0) / qsF(pi).toDouble
            if (cur < prev * ratio)
              Iterator.single(new GenericInternalRow(
                Array[Any]((k >> 12) - 1L, (k & 0xfffL).toInt)): InternalRow)
            else Iterator.empty
          }
        }
      }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr("l_partkey", LongType), attr("yr", IntegerType)),
      "priceDropPairs", kernel, keyPreserving = true))
  }

  /** Per-key exact long sum in one pass: `(key long ≥ 0, v long)` →
    * `(keyName long, sumName long)` within hash(key) partitions
    * (AQE-sized). threeChannelYoy's per-order rollup motivated it
    * (OPTIMIZATION r16): the scaled fixture's round-robin file layout
    * scatters orderkeys across every file, so the two-phase plan's
    * partial HashAggregate saw ~1 row per key per map task — it collapsed
    * ~nothing, built a multi-million-entry per-task table anyway, and
    * SPILLED 63 GB at k=1000 (sort-based fallback re-emitting partial
    * groups). This exchanges the raw slim rows instead and sums once.
    * Output column 0 carries the clustering key unchanged, so the node is
    * key-preserving: a downstream join on the same key (the orders SHJ)
    * fuses into the kernel's stage with no new exchange. */
  def sumLongByKey(df: DataFrame, keyName: String, sumName: String): DataFrame = {
    require(df.schema.length == 2 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == LongType,
      s"sumLongByKey expects (LongType, LongType), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17
      var mask = cap - 1
      var keys = new Array[Long](cap)
      var sums = new Array[Long](cap)
      var n = 0
      def grow(): Unit = {
        val ok = keys; val os = sums
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        keys = new Array[Long](cap); sums = new Array[Long](cap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & mask
            while (keys(i) != 0L) i = (i + 1) & mask
            keys(i) = k; sums(i) = os(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1)) throw new IllegalStateException(
          "sumLongByKey: null key/value — caller contract violated")
        val k0 = row.getLong(0)
        if (k0 < 0L) throw new IllegalStateException(
          s"sumLongByKey: key $k0 — keys must be >= 0")
        val k = k0 + 1L // slot sentinel is 0; fixture keys are 0-based
        val v = row.getLong(1)
        var i = mix(k) & mask
        var done = false
        while (!done) {
          val s = keys(i)
          if (s == k) { sums(i) += v; done = true }
          else if (s == 0L) {
            keys(i) = k; sums(i) = v; n += 1
            checkCap(n, "sumLongByKey")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      val capF = cap; val keysF = keys; val sumsF = sums
      (0 until capF).iterator
        .filter(i => keysF(i) != 0L)
        .map { i =>
          new GenericInternalRow(Array[Any](keysF(i) - 1L, sumsF(i))): InternalRow
        }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr(keyName, LongType), attr(sumName, LongType)),
      "sumLongByKey", kernel, keyPreserving = true))
  }

  /** threeChannelYoy's (custkey, year) channel merge + consecutive-year
    * grower pairing collapsed to one pass (OPTIMIZATION r16). Input: raw
    * union rows `(ck long, yr int, net long, osum long)` clustered by
    * hash(ck) — the shipped shape paid a (ck, yr) exchange whose partial
    * pass collapsed ~nothing (map tasks see ~1 row per (ck, yr) key),
    * then a SECOND ck exchange into `collect_list` (ObjectHashAggregate:
    * per-customer boxed struct arrays, sort-based fallback under
    * pressure) + sort_array + explode + filter. One hash(ck) exchange of
    * the same raw rows feeds this kernel instead: per-(ck, yr) exact long
    * sums in an open-address map (packed `(ck+1) << 12 | yr`, previous
    * year = key−1, same invariants as [[priceDropPairs]]), then a local
    * grower test per entry — `money4(net) > money4(pnet) * growth` and
    * `money4(pnet) > 0` with the identical IEEE op sequence — folded into
    * per-year partial accumulators. Emits `(yr int, n long, nets long,
    * osums long)` — ≤ |year domain| rows per task; downstream sums the
    * exact longs and applies money4/money2 once, so the result is
    * bit-equal to the two-phase shape and the oracle. */
  def yoyGrowerStats(df: DataFrame, growth: Double): DataFrame = {
    require(df.schema.length == 4 &&
      df.schema(0).dataType == LongType && df.schema(1).dataType == IntegerType &&
      df.schema(2).dataType == LongType && df.schema(3).dataType == LongType,
      s"yoyGrowerStats expects (Long, Int, Long, Long), got ${df.schema}")
    val plan = Bridge.analyzedPlan(df)
    val g = growth
    val kernel = (it: Iterator[InternalRow]) => {
      var cap = 1 << 17
      var mask = cap - 1
      var keys = new Array[Long](cap)   // (ck+1)<<12 | yr; 0 = empty
      var nets = new Array[Long](cap)   // exact scale-1e4 long sum
      var osums = new Array[Long](cap)  // exact scale-1e2 long sum
      var n = 0
      def grow(): Unit = {
        val ok = keys; val on = nets; val oo = osums
        cap <<= 2; mask = cap - 1
        require(cap > 0, "SinglePass.grow: hash table capacity overflow")
        keys = new Array[Long](cap); nets = new Array[Long](cap)
        osums = new Array[Long](cap)
        var j = 0
        while (j < ok.length) {
          val k = ok(j)
          if (k != 0L) {
            var i = mix(k) & mask
            while (keys(i) != 0L) i = (i + 1) & mask
            keys(i) = k; nets(i) = on(j); osums(i) = oo(j)
          }
          j += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
          throw new IllegalStateException(
            "yoyGrowerStats: null input — caller contract violated")
        val ck0 = row.getLong(0)
        if (ck0 < 0L || ck0 >= (1L << 51) - 1L) throw new IllegalStateException(
          s"yoyGrowerStats: custkey $ck0 outside packable domain [0, 2^51-1)")
        val yr = row.getInt(1)
        if (yr < 1 || yr > 4094) throw new IllegalStateException(
          s"yoyGrowerStats: year $yr outside [1, 4094] — pack invariant violated")
        val k = (ck0 + 1L) << 12 | yr.toLong
        val net = row.getLong(2)
        val o = row.getLong(3)
        var i = mix(k) & mask
        var done = false
        while (!done) {
          val s = keys(i)
          if (s == k) { nets(i) += net; osums(i) += o; done = true }
          else if (s == 0L) {
            keys(i) = k; nets(i) = net; osums(i) = o; n += 1
            checkCap(n, "yoyGrowerStats")
            if (n * 10L >= cap * 7L) grow()
            done = true
          } else i = (i + 1) & mask
        }
      }
      // grower pass: probe each entry's previous year (key-1) locally and
      // fold qualifying (ck, yr) rows into per-year partials
      val capF = cap; val maskF = mask
      val keysF = keys; val netsF = nets; val osumsF = osums
      def probe(k: Long): Int = {
        var i = mix(k) & maskF
        while (true) {
          val s = keysF(i)
          if (s == k) return i
          if (s == 0L) return -1
          i = (i + 1) & maskF
        }
        -1
      }
      val ng = new Array[Long](4096)
      val netS = new Array[Long](4096)
      val osumS = new Array[Long](4096)
      var j = 0
      while (j < capF) {
        val k = keysF(j)
        if (k != 0L) {
          val pi = probe(k - 1L)
          if (pi >= 0) {
            val netD = netsF(j).toDouble / 10000.0
            val pnetD = netsF(pi).toDouble / 10000.0
            if (netD > pnetD * g && pnetD > 0) {
              val yr = (k & 0xfffL).toInt
              ng(yr) += 1L; netS(yr) += netsF(j); osumS(yr) += osumsF(j)
            }
          }
        }
        j += 1
      }
      (0 until 4096).iterator.filter(ng(_) > 0L).map { yr =>
        new GenericInternalRow(
          Array[Any](yr, ng(yr), netS(yr), osumS(yr))): InternalRow
      }
    }
    Bridge.ofRows(df.sparkSession, SinglePassAggNode(
      plan, Seq(plan.output.head), None,
      Seq(attr("yr", IntegerType), attr("n", LongType),
        attr("nets", LongType), attr("osums", LongType)),
      "yoyGrowerStats", kernel))
  }
}
