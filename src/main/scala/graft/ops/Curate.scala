package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation for training-data pipelines — the mixing / scoring /
  * packing layer that sits between dedup ([[Dedup]]) and the trainer
  * (builder brief; reference exposes the building blocks — tokenization
  * `daft/functions/` and groupby — but not these composites).
  *
  * Scale design notes:
  *  - `mixDomains` takes an EXACT per-domain head-by-order quota without
  *    a per-domain global sort: rows are first binned by a coarse range
  *    bucket of the order column, per-(domain,bucket) counts (tiny)
  *    decide which buckets are taken whole, and only the single
  *    boundary bucket per domain pays a row_number — the classic
  *    distributed top-K split. A naive `row_number() OVER (PARTITION BY
  *    domain)` funnels every row of a domain through ONE task; at 100 TB
  *    with a handful of domains that is a straggler by construction.
  *  - `lmScore` trains the unigram LM with one map-side-combined
  *    count aggregation (vocab ≪ corpus: Heaps' law puts a 100 TB
  *    web corpus's vocab in the low billions of rows, shuffled once),
  *    then scores by joining tokens to vocab — an equi-join AQE will
  *    broadcast whenever the vocab fits, else a plain shuffle join.
  *    No driver-side state at any size.
  *  - `packSequences` packs greedily WITHIN deterministic doc-id shards,
  *    so packing parallelizes across shards and per-task memory is
  *    bounded by `shardSize` docs; bin ids are (shard, local bin) so no
  *    cross-shard coordination exists. Global-greedy would serialize
  *    the scan of the whole corpus through one cursor.
  */
object Curate {

  /** Lowercased whitespace tokens — matches TextAnalysis.wsTokens modulo
    * the case fold (LM counts are case-insensitive by convention). */
  private def lmTokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")

  /** Deterministic, content-stable train/val/test assignment: bucket each
    * row by the first byte of `md5(id)` and cut the 256-bucket space at
    * `floor(256*trainFrac)` / `floor(256*(trainFrac+valFrac))`.
    *
    * Hash-based rather than random-based on purpose: a document keeps its
    * split across reruns, repartitions, and cluster resizes — the property
    * that prevents train/eval leakage when a 100 TB corpus is incrementally
    * re-processed (a `rand()`-based split reshuffles membership every run;
    * a `monotonically_increasing_id`-based one changes with partitioning).
    * Pure map-side: no shuffle, no state, embarrassingly parallel. */
  def hashSplit(docs: DataFrame, idCol: String,
      trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      "fractions must leave room for a test split")
    val cut1 = f"${math.floor(256 * trainFrac).toInt}%02x"
    val cut2 = f"${math.floor(256 * (trainFrac + valFrac)).toInt}%02x"
    val bucket = substring(md5(col(idCol).cast("string")), 1, 2)
    docs.withColumn("split",
      when(bucket < cut1, "train").when(bucket < cut2, "val").otherwise("test"))
  }

  /** Domain mixing: deterministically downsample each domain to its
    * target share of a token/document budget (the Pile / Llama "data
    * mixture" step). For each domain d with weight w_d, keeps the FIRST
    * `floor(w_d * total)` rows by `orderCol` (stable, reproducible —
    * reruns and backfills pick identical rows). Domains absent from
    * `weights` are dropped.
    *
    * @param bucketWidth width of the `orderCol` range buckets; only the
    *        boundary bucket of each domain is ranked row-by-row, so this
    *        bounds the one non-scalable window at `bucketWidth` rows.
    */
  def mixDomains(
      docs: DataFrame,
      domainCol: String,
      orderCol: String,
      weights: Map[String, Double],
      total: Long,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val quotas = weights.map { case (d, w) => (d, math.floor(w * total).toLong) }
    val spark = docs.sparkSession
    val quotaDf = broadcast(
      spark.createDataFrame(quotas.toSeq).toDF(domainCol, "quota"))

    val bucketed = docs
      .join(quotaDf, Seq(domainCol))
      .withColumn("_bucket", floor(col(orderCol) / bucketWidth))

    // tiny: |domains| × |buckets| rows; cumulative count decides each
    // bucket's fate — taken whole, skipped whole, or the boundary
    val perBucket = bucketed.groupBy(domainCol, "_bucket", "quota")
      .agg(count(lit(1)).as("_n"))
      .withColumn("_cum_end",
        sum("_n").over(Window.partitionBy(domainCol).orderBy("_bucket")))
      .withColumn("_cum_before", col("_cum_end") - col("_n"))
      .filter(col("_cum_before") < col("quota"))
      .withColumn("_take_all", col("_cum_end") <= col("quota"))
      .select(domainCol, "_bucket", "_cum_before", "_take_all")

    val tagged = bucketed.join(broadcast(perBucket), Seq(domainCol, "_bucket"))
    val whole = tagged.filter(col("_take_all"))
    // one bucket per domain reaches this window → ≤ bucketWidth rows/task
    val boundary = tagged.filter(!col("_take_all"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(domainCol).orderBy(orderCol)))
      .filter(col("_rn") + col("_cum_before") <= col("quota"))
      .drop("_rn")

    whole.unionByName(boundary)
      .drop("_bucket", "_cum_before", "_take_all", "quota")
  }

  /** Domain mixing by TOKEN budget (the unit real data mixtures are
    * specified in — "300B tokens web, 30B code"): per domain, keep the
    * maximal PREFIX by `orderCol` whose cumulative `weightCol` stays
    * within the domain's budget (a document that would overflow is
    * dropped and nothing after it is pulled in — deterministic, order-
    * stable, rerun-identical). Same bucketed top-K split as
    * [[mixDomains]]: per-(domain,bucket) weight sums decide whole
    * buckets, and only the boundary bucket pays a running-sum window
    * (≤ `bucketWidth` rows in one task). Weights must be positive.
    */
  def mixDomainsByBudget(
      docs: DataFrame,
      domainCol: String,
      orderCol: String,
      weightCol: Column,
      budgets: Map[String, Long],
      bucketWidth: Long = 1L << 20): DataFrame = {
    val spark = docs.sparkSession
    val budgetDf = broadcast(
      spark.createDataFrame(budgets.toSeq).toDF(domainCol, "_budget"))
    val bucketed = docs
      .withColumn("_w", weightCol.cast("long"))
      .join(budgetDf, Seq(domainCol))
      .withColumn("_bucket", floor(col(orderCol) / bucketWidth))

    val perBucket = bucketed.groupBy(domainCol, "_bucket", "_budget")
      .agg(sum("_w").as("_bw"))
      .withColumn("_cum_end",
        sum("_bw").over(Window.partitionBy(domainCol).orderBy("_bucket")))
      .withColumn("_cum_before", col("_cum_end") - col("_bw"))
      .filter(col("_cum_before") < col("_budget"))
      .withColumn("_take_all", col("_cum_end") <= col("_budget"))
      .select(domainCol, "_bucket", "_cum_before", "_take_all")

    val tagged = bucketed.join(broadcast(perBucket), Seq(domainCol, "_bucket"))
    val whole = tagged.filter(col("_take_all"))
    val boundary = tagged.filter(!col("_take_all"))
      .withColumn("_run",
        sum("_w").over(Window.partitionBy(domainCol).orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_run") + col("_cum_before") <= col("_budget"))
      .drop("_run")

    whole.unionByName(boundary)
      .drop("_bucket", "_cum_before", "_take_all", "_budget", "_w")
  }

  /** Unigram-LM quality scoring (the KenLM-style perplexity filter of
    * CCNet / Llama data prep, reduced to its order-0 core): train token
    * unigram counts on `train`, then score every document of `docs` by
    * the mean log-probability of its tokens. Low `avg_logp` (high
    * perplexity) flags boilerplate-free but unnatural text; the caller
    * thresholds. Returns (idCol, n_tokens, avg_logp, ppl); documents
    * with zero tokens are dropped (no tokens → no probability mass).
    *
    * Smoothing: tokens unseen in `train` get add-one-smoothed mass
    * `1/(N+V)` so scoring a held-out split never hits ln(0).
    */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: Option[DataFrame] = None,
      headK: Int = 4096): DataFrame = {
    val trainDf = train.getOrElse(docs)
    // leased: the unigram aggregate feeds the head limit, the totals, and
    // the tail join — one pass over the train corpus, released by the
    // harness loop (graft.ops.Caches)
    val vocab = Caches.lease(trainDf
      .select(explode(lmTokens(col(textCol))).as("_tk"))
      .filter(col("_tk") =!= "")
      .groupBy("_tk").agg(count(lit(1)).as("_c")))
    // two scalars (corpus size, vocab size) — a 1-row broadcast, not state
    val totals = broadcast(vocab.agg(
      sum("_c").as("_n"), count(lit(1)).as("_v")))
    // Zipf guard: the token⋈vocab join key is extremely skewed ("the"
    // hits every document), so a plain shuffle join funnels most of the
    // token volume through a handful of tasks. The top-K most frequent
    // entries — bounded memory at ANY corpus size, covering ~95% of token
    // mass in natural text — broadcast and join map-side; only the
    // low-frequency TAIL (near-uniform key distribution) pays the shuffle.
    val head = broadcast(vocab
      .orderBy(col("_c").desc, col("_tk").asc).limit(headK)
      .withColumnRenamed("_c", "_c_head"))

    val tokens = docs
      .select(col(idCol), explode(lmTokens(col(textCol))).as("_tk"))
      .filter(col("_tk") =!= "")
    val headJoined = tokens.join(head, Seq("_tk"), "left")
    val headHits = headJoined.filter(col("_c_head").isNotNull)
      .select(col(idCol), col("_c_head").as("_c"))
    val tailHits = headJoined.filter(col("_c_head").isNull)
      .select(col(idCol), col("_tk"))
      .join(vocab, Seq("_tk"), "left")
      .select(col(idCol), col("_c"))
    headHits.unionByName(tailHits)
      .crossJoin(totals)
      .withColumn("_logp",
        log((coalesce(col("_c"), lit(0L)) + 1L) / (col("_n") + col("_v"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg("_logp").as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }

  /** Sequence packing: assign documents to fixed-token-budget bins (the
    * pre-training step that concatenates short documents into full
    * context windows, cf. T5/GPT packing). Deterministic greedy
    * first-fit in `idCol` order WITHIN each shard of `shardSize`
    * consecutive ids: a new bin starts when the current document no
    * longer fits; a document longer than `budget` gets a bin of its own.
    * Returns (idCol, shard, bin, n_tokens) — bin is local to its shard,
    * so (shard, bin) is the global pack id.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shardSize: Long = 4096): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col(idCol).cast("long"),
        floor(col(idCol) / shardSize).as("shard"),
        size(split(trim(col(textCol)), "\\s+")).as("n_tokens"))
      .as[(Long, Long, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (shard, rows) =>
        // a shard is ≤ shardSize docs by construction — safe to sort here
        var bin = 0
        var fill = 0
        rows.toSeq.sortBy(_._1).map { case (id, _, t) =>
          if (fill > 0 && fill + t > budget) { bin += 1; fill = 0 }
          fill += t
          (id, shard, bin, t)
        }
      }
      .toDF(idCol, "shard", "bin", "n_tokens")
  }

  /** RAG-style document chunking: fixed token windows with overlap, one
    * output row per chunk — (idCol, chunk_id, chunk, n_tokens).
    *
    * Windows start every `chunkTokens − overlapTokens` tokens; the tail
    * is always covered (the last window may be shorter). Pure columnar —
    * split/sequence/slice/posexplode stay inside whole-stage codegen, no
    * UDF and NO SHUFFLE: chunking is a map-side transform whatever the
    * corpus size, and the row multiplication (~n/step per doc) is the
    * output's intrinsic size, not an intermediate blow-up. */
  /** Quality-weighted corpus subsampling WITHOUT replacement — priority
    * sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007; the same
    * weighted-without-replacement family as Efraimidis–Spirakis A-ES,
    * which the Pile/Dolma-style "keep the best N docs weighted by
    * quality score" curation step needs): each row draws a deterministic
    * uniform u from md5(id:seed), gets priority w/u, and the k highest
    * priorities are kept — selection probability rises with weight, and
    * reruns/backfills pick bit-identical rows.
    *
    * Cross-engine exactness (the reason for the slightly baroque u): u
    * is the exact dyadic rational `(iv+1)/2^32` where iv is integer
    * arithmetic over the first 8 hex digits of md5 — md5, substring and
    * instr agree everywhere, and the single IEEE division w/u is
    * exactly rounded, so a plain SQL oracle reproduces the exact sample
    * including the order, no RNG-compatibility caveats.
    *
    * Scale shape: one map pass plus [[Global.withGlobalRank]]'s two-pass
    * range-partitioned rank — no single-task window, no driver top-k
    * heap, so k can be hundreds of millions. Rows with non-positive
    * weight are excluded (they cannot be sampled). */
  def prioritySample(docs: DataFrame, idCol: String, weightCol: String,
      k: Long, seed: Long = 42L): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val iv = (1 to 8).map { i =>
      expr(s"(instr('0123456789abcdef', substring(__h, $i, 1)) - 1) * " +
        s"${1L << (4 * (8 - i))}L")
    }.reduce(_ + _)
    val withP = docs
      .filter(col(weightCol) > 0)
      .withColumn("__h",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("__iv", iv)
      .withColumn("sample_priority",
        col(weightCol).cast("double") /
          ((col("__iv") + 1).cast("double") / 4294967296.0))
      .drop("__h", "__iv")
    Global.withGlobalRank(withP,
        Seq(col("sample_priority").desc, col(idCol).asc), "__rank")
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Integer value of the first 8 hex digits of an md5 hex string — the
    * cross-engine uniform-hash primitive shared with [[prioritySample]]:
    * md5 and hex-digit arithmetic agree between Spark and any SQL oracle,
    * so selections derived from it replay bit-identically. */
  private def hexIv32(h: Column): Column =
    conv(substring(h, 1, 8), 16, 10).cast("long")

  /** Hashed n-gram features: unigrams + adjacent bigrams of the
    * lowercased whitespace tokens. Pure columnar (split/slice/zip_with)
    * so featurization stays inside whole-stage codegen. */
  private def hashedGrams(text: Column): Column = {
    val toks = array_remove(lmTokens(text), "")
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bi)
  }

  /** Per-bucket gram counts of a corpus: ≤ `buckets` rows whatever the
    * corpus size — the dimensionality bound that makes every model frame
    * here broadcastable. */
  private def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      out: String): DataFrame =
    df.select(explode(hashedGrams(col(textCol))).as("_g"))
      .select((hexIv32(md5(col("_g"))) % buckets).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as(out))

  /** Jelinek–Mercer smoothed bucket probability: (1−λ)·c/N + λ/B. Unlike
    * add-one smoothing this scores a gram with equal relative frequency
    * in two corpora identically REGARDLESS of the corpus-size ratio — the
    * property that keeps log-likelihood ratios length-unbiased when the
    * reference corpus is small. */
  private def jmProb(c: Column, n: Column, buckets: Int,
      smoothing: Double): Column =
    lit(1 - smoothing) * coalesce(c, lit(0L)).cast("double") /
      greatest(n, lit(1L)) + lit(smoothing / buckets)

  /** Leased per-(doc, bucket) gram counts — ONE featurization pass over
    * the corpus shared by model building and scoring. */
  private def docBucketCounts(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    Caches.lease(docs
      .select(col(idCol), explode(hashedGrams(col(textCol))).as("_g"))
      .select(col(idCol), (hexIv32(md5(col("_g"))) % buckets).as("_b"))
      .groupBy(idCol, "_b").agg(count(lit(1)).as("_n")))

  /** The exact dyadic uniform u ∈ (0, 1) from md5(id<sep>salt) — every
    * operation reproducible bit-identically in a SQL oracle. */
  private def dyadicU(idc: Column, salt: String): Column =
    (hexIv32(md5(concat(idc.cast("string"), lit(salt))))
      .cast("double") + 0.5) / 4294967296.0

  /** DSIR — Data Selection with Importance Resampling (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): keep the k documents of `raw` whose hashed-n-gram
    * distribution looks most like a (small) TARGET corpus. Importance
    * weight per doc is the log-likelihood ratio of two smoothed
    * bag-of-hashed-grams models, log p_target(doc) − log p_raw(doc).
    * Smoothing is Jelinek–Mercer interpolation with the uniform bucket
    * distribution, p_b = (1−λ)·c_b/N + λ/B — NOT add-one: additive
    * smoothing is swamped by the bucket count when the target corpus is
    * small (N_target ≪ B collapses p_target toward uniform, which
    * length-biases the ratio toward SHORT off-target docs); under
    * interpolation a gram with equal relative frequency in both corpora
    * scores exactly 0 whatever the two corpus sizes.
    * Selection is Gumbel top-k on the log weights, i.e. sampling without
    * replacement proportional to the importance weight, deterministic in
    * (id, seed) so reruns pick bit-identical documents.
    *
    * Scale shape:
    *  - both gram models live in `buckets` rows (hashing is the method's
    *    dimensionality bound) → broadcast joins, never a corpus-keyed
    *    shuffle of text;
    *  - the corpus is featurized ONCE into per-(doc, bucket) counts (a
    *    leased frame bounded by tokens, collapsed by bucket reuse) that
    *    feeds both the raw model and the per-doc scores;
    *  - the final top-k is [[Global.withGlobalRank]]'s two-pass
    *    range-partitioned rank — no single-task window, no driver heap.
    *
    * The md5-prefix bucket hash is chosen for cross-engine oracle
    * exactness; at production scale swap in xxhash64 by passing a custom
    * frame — the estimator only needs ANY uniform hash.
    *
    * Returns (idCol, dsir_logw, dsir_key), the k highest keys. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Long, buckets: Int = 4096,
      seed: Long = 7L, smoothing: Double = 0.1): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    require(smoothing > 0 && smoothing < 1,
      s"smoothing must be in (0, 1), got $smoothing")

    // target model: ≤ `buckets` rows whatever the target corpus size
    val tgtCounts = bucketCounts(target, textCol, buckets, "_cp")
    // one featurization pass over the corpus, shared (via lease) by the
    // raw model and the scoring join
    val docBuckets = docBucketCounts(raw, idCol, textCol, buckets)
    val rawCounts = docBuckets.groupBy("_b").agg(sum("_n").as("_cq"))

    val totals = broadcast(
      tgtCounts.agg(coalesce(sum("_cp"), lit(0L)).as("_np"))
        .crossJoin(rawCounts.agg(coalesce(sum("_cq"), lit(0L)).as("_nq"))))

    val scored = docBuckets
      .join(broadcast(tgtCounts), Seq("_b"), "left")
      .join(broadcast(rawCounts), Seq("_b"), "left")
      .crossJoin(totals)
      .withColumn("_lr",
        log(jmProb(col("_cp"), col("_np"), buckets, smoothing)) -
        log(jmProb(col("_cq"), col("_nq"), buckets, smoothing)))
      .groupBy(idCol)
      .agg(sum(col("_n") * col("_lr")).as("dsir_logw"))

    // Gumbel top-k: key = logw + Gumbel(u), u the exact dyadic rational
    // (iv + 0.5) / 2^32 from md5(id:seed) — u ∈ (0, 1) strictly, every
    // operation exactly reproducible in a SQL oracle
    val keyed = scored
      .withColumn("_u", dyadicU(col(idCol), ":" + seed))
      .withColumn("dsir_key", col("dsir_logw") - log(-log(col("_u"))))
      .drop("_u")
    Global.withGlobalRank(keyed,
        Seq(col("dsir_key").desc, col(idCol).asc), "__rank")
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** GPT-3-style quality classification + Pareto acceptance sampling
    * (Brown et al. 2020, appendix A: a classifier scores documents
    * against a high-quality reference; a document is kept when
    * `score > 1 − pareto(α=9)` so low-scoring docs still enter the
    * corpus occasionally — a hard threshold would skew the distribution).
    * The classifier here is hashed-bigram Naive Bayes (the same model
    * family as fastText's linear classifier, closed-form trainable in
    * ONE aggregation pass per class): per-doc log-odds = Σ n_b·(ln
    * p_pos(b) − ln p_neg(b)), Jelinek–Mercer smoothed ([[jmProb]]),
    * LENGTH-NORMALIZED to the per-gram mean so long documents don't
    * saturate, squashed to (0,1) by a sigmoid. The Pareto draw is
    * deterministic in (id, seed) via the dyadic md5 uniform —
    * u^(−1/α) − 1 is exactly the Lomax draw `numpy.random.pareto`
    * produces — so reruns keep bit-identical rows.
    *
    * Scale shape: both class models are ≤ `buckets` rows (broadcast);
    * the corpus featurizes once into the leased per-(doc, bucket) frame;
    * scoring and acceptance are map-side after the broadcast joins.
    * Returns (idCol, quality_score, kept) for every scorable doc. */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
      positive: DataFrame, negative: DataFrame, buckets: Int = 4096,
      alpha: Double = 9.0, seed: Long = 11L,
      smoothing: Double = 0.1): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    require(alpha > 0, s"pareto alpha must be positive, got $alpha")
    val posCounts = bucketCounts(positive, textCol, buckets, "_cp")
    val negCounts = bucketCounts(negative, textCol, buckets, "_cn")
    val docBuckets = docBucketCounts(docs, idCol, textCol, buckets)
    val totals = broadcast(
      posCounts.agg(coalesce(sum("_cp"), lit(0L)).as("_np"))
        .crossJoin(negCounts.agg(coalesce(sum("_cn"), lit(0L)).as("_nn"))))
    docBuckets
      .join(broadcast(posCounts), Seq("_b"), "left")
      .join(broadcast(negCounts), Seq("_b"), "left")
      .crossJoin(totals)
      .withColumn("_lr",
        log(jmProb(col("_cp"), col("_np"), buckets, smoothing)) -
        log(jmProb(col("_cn"), col("_nn"), buckets, smoothing)))
      .groupBy(idCol)
      .agg((sum(col("_n") * col("_lr")) / sum(col("_n"))).as("_mean_lr"))
      .withColumn("quality_score",
        lit(1.0) / (lit(1.0) + exp(-col("_mean_lr"))))
      .withColumn("kept",
        col("quality_score") >
          lit(1.0) - (pow(dyadicU(col(idCol), "~" + seed), lit(-1.0 / alpha)) - 1))
      .select(col(idCol), col("quality_score"), col("kept"))
  }

  /** Deterministic epoch shuffle into trainer shards — the "global
    * shuffle" step every pre-training loader needs: a pseudo-random
    * permutation of the corpus that (a) changes completely between
    * epochs, (b) is stable across reruns/repartitions (pure function of
    * id and epoch — no rand(), no partition-dependent ids), and (c) is
    * emitted as `numShards` independent shards so the write and the
    * downstream read parallelize shard-per-task.
    *
    * Adds (shard, pos): shard ∈ [0, numShards), pos = 1-based position
    * within the shard in permuted order. The only non-map operation is
    * one window per shard — a shard IS the unit one loader task reads,
    * so its single-task materialization is the intended layout; size
    * shards via numShards (100 TB → O(100k) shards), never one giant
    * window. */
  def epochShuffle(docs: DataFrame, idCol: String, numShards: Int,
      epoch: Long = 0L): DataFrame = {
    require(numShards > 0, s"need at least one shard, got $numShards")
    val iv = hexIv32(md5(concat(col(idCol).cast("string"), lit("#" + epoch))))
    docs
      .withColumn("_iv", iv)
      .withColumn("shard", (col("_iv") % numShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_iv"), col(idCol))))
      .drop("_iv")
  }

  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val step = chunkTokens - overlapTokens
    val toks = split(trim(col(textCol)), "\\s+")
    // chunk count: 1 + ceil(max(0, n − chunk) / step) — the unique k
    // such that the last start k·step still adds ≥1 uncovered token
    val nChunks = (lit(1) +
      ceil(greatest(lit(0), size(toks) - chunkTokens).cast("double") / step)
        .cast("int"))
    docs
      .select(col(idCol), toks.as("__toks"), size(toks).as("__n"),
        nChunks.as("__nc"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(transform(sequence(lit(0), col("__nc") - 1), k => k * step))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk"),
        least(lit(chunkTokens), col("__n") - col("__start")).as("n_tokens"))
  }
}
