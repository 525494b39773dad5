package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, PredicateHelper, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.expressions.{BlockBloomAggregate, BlockBloomMightContainBytes, BlockBloomMightContainExpr}
import graft.ops.SplitBlockBloom

/** Plan intelligence the curated query corpus applies by hand, promoted to
  * optimizer rules so USER-written SQL / un-hinted DataFrame code gets the
  * same 100 TB posture (the reference engine does both generically in its
  * optimizer — `src/daft-logical-plan/src/optimization/rules/
  * push_down_filter.rs`, `reorder_joins/`; in a Catalyst engine the
  * equivalent hook is `SparkSessionExtensions`, wired in
  * `graft.Engine.session`).
  *
  * Shared table-role heuristic: a relation "scales with the corpus" when
  * its subtree reads one of the configured FACT tables
  * (`spark.graft.optimizer.factTables`; the default names this fixture's
  * unbounded tables) with no cardinality-bounding operator (Limit, global
  * aggregate) between scan and join input. On a real deployment the conf
  * is the user's declaration of which tables grow with the data — the
  * same role annotation a warehouse's semantic layer carries.
  */
object FactBroadcastGuard extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.optimizer.factBroadcastGuard.enabled", "true").toBoolean

  private[plans] def factNames: Set[String] =
    conf.getConfString("spark.graft.optimizer.factTables",
        "lineitem,orders,customer,part,events,documents,embeddings")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

  private[plans] def leafTableName(leaf: LogicalPlan): Option[String] = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table.toLowerCase).orElse(lr.relation match {
        case fs: HadoopFsRelation =>
          // path-based reads: <dir>/<table>.parquet — name up to the first dot
          fs.location.rootPaths.headOption.map(_.getName.takeWhile(_ != '.').toLowerCase)
        case _ => None
      })
    case _ => None
  }

  /** Whether `plan`'s OUTPUT cardinality scales with a fact table. Bounded
    * by construction: Limit, and global (group-less) aggregates — exactly
    * one row. A GROUPED aggregate over a fact is treated as scaling (its
    * key cardinality usually grows with the data; ndv stats that could
    * prove otherwise aren't available without CBO), which errs toward
    * blocking a broadcast — the failure mode is a shuffle that could have
    * been a broadcast, never an executor-OOM broadcast of a 100 TB-scaled
    * build side. */
  private[plans] def scalesWithFact(plan: LogicalPlan, facts: Set[String]): Boolean = {
    def walk(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => false
      case a: Aggregate if a.groupingExpressions.isEmpty => false
      case l: LeafNode => leafTableName(l).exists(facts.contains)
      case other => other.children.exists(walk)
    }
    walk(plan)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val facts = factNames
    plan.transformUp {
      case j @ Join(l, r, _, _, hint) =>
        // an explicit user strategy hint (broadcast(), .hint("shuffle_*"))
        // always wins — the guard only claims the undecided sides
        def guard(side: Option[HintInfo], p: LogicalPlan): Option[HintInfo] = side match {
          case Some(h) if h.strategy.isDefined => side
          case _ if scalesWithFact(p, facts) =>
            Some(side.getOrElse(HintInfo()).copy(strategy = Some(NO_BROADCAST_HASH)))
          case _ => side
        }
        val nl = guard(hint.leftHint, l)
        val nr = guard(hint.rightHint, r)
        if (nl == hint.leftHint && nr == hint.rightHint) j
        else j.copy(hint = JoinHint(nl, nr))
    }
  }
}

/** Injects a split-block-bloom semi-prefilter on the probe side of
  * selective equi-joins — the generic form of the hand-placed
  * [[graft.ops.Prune.bloomSemiPrefilter]] calls, as a runtime filter:
  *
  * {{{
  *   Join(probe, creation, cond)
  *     ⇒ Join(Filter(graft_bloom_might_contain(
  *              scalar-subquery[ graft_block_bloom_agg(xxhash64(ck)) ],
  *              xxhash64(pk)), probe), creation, cond)
  * }}}
  *
  * Same structure as Spark's own `InjectRuntimeFilter`, which at
  * fact⋈fact scale never fires (creation side capped at ~10 MB / 1M keys)
  * and whose `util.sketch` filter passes ~5× its nominal fpp past ~30M
  * keys (r8 measurement). Fires when:
  *   - the probe side is a SCAN CHAIN (Project/Filter over a leaf — see
  *     [[isScanChain]]), big (`minProbeBytes`, default 128 MB), and at
  *     least `probeRatio`× (default 2) the creation side's estimate;
  *   - the creation side is a LIKELY-SELECTIVE Filter over a scan of at
  *     most `maxCreationBytes` (default 256 MB) — the q3 "BUILDING
  *     customers against all lineitem" shape where plain size stats
  *     can't see the reduction. The selectivity requirement is
  *     unconditional (as in Spark's InjectRuntimeFilter): a bloom over
  *     an unfiltered FK dimension contains every probe key and prunes
  *     nothing (r9 measured q14 paying +60% for exactly that). The byte
  *     cap sits where the `bytes/16` key estimate still fits the
  *     16M-key filter ceiling: past it the rule would build a knowingly
  *     overfull filter;
  *   - the creation side will NOT be broadcast (explicit hint, or under
  *     the broadcast threshold without being fact-scaled): a broadcast
  *     hash join never shuffles the probe side, so rows die at the join
  *     for the same per-row cost as the probe — the prefilter pays
  *     exactly when the probe side faces an exchange;
  *   - neither side already carries a graft bloom probe (explicit Prune
  *     calls keep precedence), nothing is streaming, and the join type
  *     preserves no probe-side nulls (Inner / LeftSemi).
  *
  * False positives only pass rows the exact join drops, and probe-side
  * rows with null keys (hash = seed) can never match an inner/semi join,
  * so dropping them early is sound either way: the rewrite is
  * result-identical to the plain join. The filter is sized from the
  * creation-side byte estimate (`expectedKeys ≈ bytes/16`, clamped to
  * [1M, 16M] keys = ≤24 MB of subquery result); an overfull filter only
  * degrades fpp, never correctness. Runs in the pre-CBO batch (Once,
  * after predicate pushdown has settled the creation-side shape). */
object BloomPrefilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.optimizer.bloomPrefilter.enabled", "true").toBoolean
  private def minProbeBytes: Long =
    conf.getConfString("spark.graft.optimizer.bloomPrefilter.minProbeBytes",
      (128L << 20).toString).toLong
  private def probeRatio: Long =
    conf.getConfString("spark.graft.optimizer.bloomPrefilter.probeRatio", "2").toLong
  private def maxCreationBytes: Long =
    conf.getConfString("spark.graft.optimizer.bloomPrefilter.maxCreationBytes",
      (256L << 20).toString).toLong

  /** Equi-key pairs (probe-side expr, creation-side expr) from the join
    * condition, conjunct by conjunct. */
  private def equiKeys(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : (Seq[Expression], Seq[Expression]) = {
    val pairs = splitConjunctivePredicates(cond).collect {
      case EqualTo(a, b)
          if a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
            b.references.nonEmpty && b.references.subsetOf(right.outputSet) => (a, b)
      case EqualTo(a, b)
          if b.references.nonEmpty && b.references.subsetOf(left.outputSet) &&
            a.references.nonEmpty && a.references.subsetOf(right.outputSet) => (b, a)
    }
    pairs.unzip
  }

  /** A side whose size estimate bottoms out in `defaultSizeInBytes`
    * (LogicalRDD and friends report Long.MaxValue) must never be chosen
    * as the probe: the "huge" number is ignorance, not bigness — r9
    * found the rule building a bloom from the BIG scan to filter a tiny
    * driver-built frame in the Iceberg partition-reattach join. */
  private def hasUnknownLeafSize(p: LogicalPlan): Boolean = {
    val dflt = BigInt(conf.defaultSizeInBytes)
    p.collectLeaves().exists(_.stats.sizeInBytes >= dflt)
  }

  private def hasBloomProbe(p: LogicalPlan): Boolean =
    p.exists {
      case Filter(cond, _) =>
        cond.exists {
          case _: BlockBloomMightContainBytes => true
          case _: BlockBloomMightContainExpr => true
          case _ => false
        }
      case _ => false
    }

  /** Project/Filter chain over a leaf with at least one likely-selective
    * predicate — the structural stand-in for "this side is a sliver",
    * since size-only stats don't shrink through filters. */
  private def selectiveFilterOverScan(p: LogicalPlan): Boolean = {
    def walk(p: LogicalPlan, sawSelective: Boolean): Boolean = p match {
      case Project(_, child) => walk(child, sawSelective)
      case Filter(cond, child) => walk(child, sawSelective || isLikelySelective(cond))
      case _: LeafNode => sawSelective
      case _ => false
    }
    walk(p, sawSelective = false)
  }

  /** Probe sides are SCAN CHAINS only (Project/Filter over a leaf). The
    * prefilter's entire value is dropping rows BEFORE their first
    * shuffle; above an aggregate or join the reduction already happened,
    * and injecting mid-plan can split a subtree shared with another
    * consumer — r9 measured q15's revenue CTE losing its runtime
    * exchange reuse to exactly such an injection (the lineitem sliver
    * was scanned and aggregated twice, 5× the quiet wall time). */
  private def isScanChain(p: LogicalPlan): Boolean = p match {
    case Project(_, child) => isScanChain(child)
    case Filter(_, child) => isScanChain(child)
    case _: LeafNode => true
    case _ => false
  }

  private def injectFilter(probe: LogicalPlan, probeKeys: Seq[Expression],
      creation: LogicalPlan, creationKeys: Seq[Expression]): LogicalPlan = {
    // size from the creation-side byte estimate: ≥16 compressed bytes/row
    // assumed, so narrow tables get an OVERSIZED (finer-fpp) filter
    val expectedKeys = math.max(1L << 20,
      math.min(16L << 20, creation.stats.sizeInBytes.toLong / 16))
    val nb = SplitBlockBloom.blocksFor(expectedKeys, 12)
    val agg = BlockBloomAggregate(new XxHash64(creationKeys.toIndexedSeq), nb)
    val alias = Alias(
      AggregateExpression(agg, Complete, isDistinct = false), "graftBloomFilter")()
    val creationCols: Seq[Attribute] =
      creationKeys.flatMap(_.references).distinct
    val aggPlan = Aggregate(Nil, Seq(alias), Project(creationCols, creation))
    val probeCond = BlockBloomMightContainBytes(
      ScalarSubquery(aggPlan), new XxHash64(probeKeys.toIndexedSeq))
    Filter(probeCond, probe)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || plan.isStreaming) return plan
    plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), hint)
          if joinType == Inner || joinType == LeftSemi =>
        val (lk, rk) = equiKeys(cond, left, right)
        if (lk.isEmpty) j
        else {
          val ls = left.stats.sizeInBytes
          val rs = right.stats.sizeInBytes
          def broadcastHinted(h: Option[HintInfo]): Boolean =
            h.exists(_.strategy.contains(BROADCAST))
          // the selective filter is required in EVERY case (same as
          // Spark's InjectRuntimeFilter): a bloom over an UNFILTERED
          // creation side of an FK join contains every probe key, so it
          // prunes nothing and the build is pure overhead — r9 measured
          // q14 paying +60% for a full-part-keyset bloom probed by
          // lineitem rows that all matched.
          // A creation side that will BROADCAST makes the probe useless
          // too: with a broadcast hash join the probe side never
          // shuffles, so non-matching rows already die at the join for
          // the same per-row cost as the bloom probe (r9 interleaved
          // A/B: q11's supplier-sliver injection was a consistent
          // 5-10% LOSS). The prefilter pays exactly when the join must
          // shuffle the probe side — i.e. the creation side is over the
          // broadcast threshold or is fact-scaled (the guard rule blocks
          // its broadcast).
          def creationOk(p: LogicalPlan, bytes: BigInt,
              h: Option[HintInfo]): Boolean = {
            val willBroadcast =
              h.exists(_.strategy.contains(BROADCAST)) ||
                (bytes <= conf.autoBroadcastJoinThreshold &&
                  !FactBroadcastGuard.scalesWithFact(p, FactBroadcastGuard.factNames))
            !hasBloomProbe(p) && selectiveFilterOverScan(p) &&
              bytes <= maxCreationBytes && !willBroadcast
          }
          def probeOk(p: LogicalPlan, bytes: BigInt, other: BigInt,
              h: Option[HintInfo]): Boolean =
            isScanChain(p) && !hasBloomProbe(p) && !hasUnknownLeafSize(p) &&
              !broadcastHinted(h) && bytes >= minProbeBytes && bytes >= other * probeRatio
          if (probeOk(left, ls, rs, hint.leftHint) &&
              creationOk(right, rs, hint.rightHint))
            j.copy(left = injectFilter(left, lk, right, rk))
          else if (joinType == Inner &&
              probeOk(right, rs, ls, hint.rightHint) &&
              creationOk(left, ls, hint.leftHint))
            j.copy(right = injectFilter(right, rk, left, lk))
          else j
        }
    }
  }
}
