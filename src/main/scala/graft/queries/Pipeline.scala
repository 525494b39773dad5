package graft.queries

import graft.Tables
import graft.ops.{Curate, Dedup, Similarity, Skew, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline coverage (builder brief): dedup family,
  * similarity search, text analysis, sharding, checkpoint-resume. */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** documents ∪ an id-shifted copy — a corpus with known exact dups. */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir).documents
    d.union(d.withColumn("doc_id", col("doc_id") + 10000))
  }

  // ---- dedup: exact ----
  def dedup_exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docsWithDups(s, dir), Seq("text"), "doc_id")
      .select("doc_id")
      .orderBy("doc_id")

  // min(doc_id) per distinct text of the doubled corpus — NOT simply "all
  // original ids": the sf0.1 fixture has 8 duplicate-text groups among the
  // originals themselves (4992 distinct texts / 5000 rows), which the
  // dedup correctly collapses (found by the r10 sf0.1 oracle sweep)
  val dedupExactSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM documents)
      |SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination (ops/Dedup.decontaminate): drop corpus
    * documents sharing any normalized 3-gram with a small "eval set"
    * (every 97th document); map-side broadcast-set probe, no shuffle. */
  def dedup_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir).documents
    Dedup.decontaminate(
        docs.filter(col("doc_id") < 2000), "text",
        docs.filter(col("doc_id") % 97 === 0), "text", n = 3)
      .agg(count(lit(1)).as("n_clean"), sum("doc_id").as("id_sum"))
  }

  val dedupDecontaminateSql =
    """WITH corp AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      |  FROM documents WHERE doc_id < 2000),
      |ev AS (
      |  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      |  FROM documents WHERE doc_id % 97 = 0),
      |cg AS (
      |  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g FROM (
      |    SELECT doc_id, toks,
      |      unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
      |    FROM corp)),
      |eg AS (
      |  SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS g FROM (
      |    SELECT toks,
      |      unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
      |    FROM ev)),
      |dirty AS (SELECT DISTINCT doc_id FROM cg JOIN eg USING (g))
      |SELECT count(*) AS n_clean, CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM corp WHERE doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin

  // ---- dedup: corpus-level line dedup (CCNet/C4 boilerplate removal) ----
  // The synthetic documents are single-line, so the fixture builds
  // multi-line docs DETERMINISTICALLY (both engines construct the same
  // input): a banner + footer planted on every doc (df = |docs|), a
  // subscribe prompt on every third doc (df ≈ |docs|/3), and a per-doc
  // unique ref line. At minDocFreq=50 the three boilerplate lines die,
  // the original text and ref lines survive in order.
  def dedup_lines(s: SparkSession, dir: String): DataFrame = {
    val synth = t(s, dir).documents.select(col("doc_id"),
      concat_ws("\n",
        lit("ACCEPT COOKIES TO CONTINUE"),
        col("text"),
        when(col("doc_id") % 3 === 0, lit("SUBSCRIBE TO OUR NEWSLETTER"))
          .otherwise(concat(lit("ref-"), col("doc_id"))),
        lit("ALL RIGHTS RESERVED")).as("text"))
    Dedup.dedupLines(synth, "doc_id", "text", minDocFreq = 50)
      .orderBy("doc_id")
  }

  val dedupLinesSql =
    """WITH synth AS (
      |  SELECT doc_id,
      |    'ACCEPT COOKIES TO CONTINUE' || chr(10) || text || chr(10) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'SUBSCRIBE TO OUR NEWSLETTER'
      |          ELSE 'ref-' || doc_id END) || chr(10) || 'ALL RIGHTS RESERVED' AS text
      |  FROM documents
      |), e AS (
      |  SELECT doc_id, generate_subscripts(ls, 1) AS i, unnest(ls) AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM synth)
      |), f AS (
      |  SELECT line FROM (SELECT DISTINCT doc_id, line FROM e)
      |  GROUP BY line HAVING count(*) >= 50
      |)
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
      |FROM e WHERE line NOT IN (SELECT line FROM f)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- dedup: exact substring removal (Lee et al. 2022 suffix-array
  // dedup, relational form) ----
  // The fixture plants a 12-token passage on every fifth doc: its internal
  // 8-token windows occur across all planted docs (count >= 2), so the
  // whole passage is excised from each while the original text (and every
  // untouched doc) survives verbatim. Naturally-repeated 8-grams in the
  // base corpus dedup identically in both engines.
  def dedup_substring(s: SparkSession, dir: String): DataFrame = {
    val passage = " the quick brown fox jumps over the lazy dog again and again"
    val synth = t(s, dir).documents.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(passage)))
        .otherwise(col("text")).as("text"))
    Dedup.dedupSubstrings(synth, "doc_id", "text", windowTokens = 8)
      .orderBy("doc_id")
  }

  val dedupSubstringSql =
    """WITH synth AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |      THEN text || ' the quick brown fox jumps over the lazy dog again and again'
      |      ELSE text END AS text
      |  FROM documents),
      |t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM synth),
      |wins AS (
      |  SELECT doc_id, i, array_to_string(list_slice(w, i, i + 7), ' ') AS win
      |  FROM (SELECT doc_id, unnest(range(1, len(w) - 6)) AS i, w
      |        FROM t WHERE len(w) >= 8)),
      |dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) >= 2),
      |dw AS (SELECT doc_id, i FROM wins WHERE win IN (SELECT win FROM dup)),
      |aff AS (SELECT DISTINCT doc_id FROM dw),
      |cov AS (SELECT DISTINCT dw.doc_id, dw.i + ds.d AS j
      |        FROM dw CROSS JOIN (SELECT unnest(range(0, 8)) AS d) ds),
      |toks AS (SELECT doc_id, generate_subscripts(w, 1) AS j, unnest(w) AS tok
      |         FROM t WHERE doc_id IN (SELECT doc_id FROM aff)),
      |rebuilt AS (
      |  SELECT toks.doc_id, string_agg(toks.tok, ' ' ORDER BY toks.j) AS text
      |  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.j = cov.j
      |  WHERE cov.doc_id IS NULL
      |  GROUP BY toks.doc_id)
      |SELECT doc_id, text FROM synth WHERE doc_id NOT IN (SELECT doc_id FROM aff)
      |UNION ALL SELECT doc_id, text FROM rebuilt
      |ORDER BY doc_id""".stripMargin

  // ---- dedup: n-gram jaccard (exact inverted-index pipeline) ----
  def dedup_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir).documents, "doc_id", "text", n = 3, threshold = 0.2)
      .orderBy("doc_a", "doc_b")

  // ---- dedup: n-gram jaccard with a document-frequency cap ----
  // A constant boilerplate tail is planted on every document, making its
  // shingles df = |docs| — without the cap those alone would create
  // O(|docs|²) candidate pairs in the inverted-index self-join. The cap
  // drops them from candidate generation; candidates verify exactly on
  // full shingle sets (so jaccard VALUES are exact), and the oracle
  // replicates the same candidate semantics in SQL.
  def dedup_ngram_jaccard_dfcap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 400)
      .withColumn("text", concat(col("text"), lit(" zz common boilerplate tail zz")))
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.2,
        maxShingleDf = Some(50L))
      .orderBy("doc_a", "doc_b")
  }

  val dedupNgramJaccardDfcapSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split(text || ' zz common boilerplate tail zz', ' ') AS w
      |  FROM documents WHERE doc_id < 400),
      |s AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, greatest(len(w)-1, 1)),
      |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |      FROM t WHERE len(w) >= 3),
      |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
      |df AS (SELECT shingle, count(*) AS c FROM inv GROUP BY shingle),
      |rare AS (SELECT doc_id, shingle FROM inv JOIN df USING (shingle) WHERE c <= 50),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  len(list_intersect(sa.sh, sb.sh)) * 1.0 /
      |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
      |FROM cand
      |JOIN s sa ON sa.doc_id = doc_a
      |JOIN s sb ON sb.doc_id = doc_b
      |WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
      |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  val dedupNgramJaccardSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, greatest(len(w)-1, 1)),
      |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |      FROM t WHERE len(w) >= 3)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  len(list_intersect(a.sh, b.sh)) * 1.0 /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- dedup: minhash + LSH banding (verified candidates ≡ exact) ----
  def dedup_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(s, dir).documents, "doc_id", "text",
        shingleN = 3, k = 64, bandRows = 1, threshold = 0.2)
      .orderBy("doc_a", "doc_b")

  val dedupMinhashLshSql = dedupNgramJaccardSql

  // ---- dedup: simhash banding prefilter + exact verification over a
  // corpus with known dups. The prefilter prunes the pair space to
  // hamming ≤ 2 candidates (which also surfaces genuine near-dups — the
  // synthetic corpus has ~25 planted pairs at 3-gram jaccard ≥ 0.9); the
  // verification stage keeps the deterministic exact-dup subset so the
  // result is oracle-checkable. ----
  def dedup_simhash(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithDups(s, dir)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", shingleN = 3, maxHamming = 2)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    pairs.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .filter(col("text_a") === col("text_b"))
      .select(col("doc_a"), col("doc_b"), col("ham").cast("long").as("ham"))
      .orderBy("doc_a", "doc_b")
  }

  // all identical-text pairs of the doubled corpus (ham is 0 by
  // construction for identical texts) — not just (d, d+10000): the sf0.1
  // fixture's 8 duplicate-text original groups produce cross pairs too
  val dedupSimhashSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS BIGINT) AS ham
      |FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- dedup: embedding cosine near-dup (exact baseline) ----
  def dedup_embedding_cosine(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosinePairs(t(s, dir).embeddings, "vec_id", "embedding", 0.45)
      .orderBy("id_a", "id_b")

  val dedupEmbeddingCosineSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  // ---- dedup: embedding near-dup via random-hyperplane LSH blocking ----
  /** Production-shape blocked dedup: corpus ∪ direction-preserving copies
    * (2× scaled, so cosine with the original is exactly 1), hyperplane-LSH
    * banding for candidates (no all-pairs), exact cosine verify at 0.9.
    * Same-direction pairs have identical sign patterns → recall 1 by
    * construction; background pairs (max cos ≈ 0.51 in this corpus) can
    * never pass verification. */
  def dedup_embedding_lsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    val scaled = e
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding", transform(col("embedding"), x => (x * lit(2.0f)).cast("float")))
    val corpus = e.unionByName(scaled)
    Dedup.embeddingCosineLshPairs(corpus, "vec_id", "embedding", threshold = 0.9)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("id_a", "id_b")
  }

  val dedupEmbeddingLshSql =
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
      |  CAST(1.0 AS DOUBLE) AS cos_sim
      |FROM embeddings ORDER BY id_a""".stripMargin

  /** SemDeDup-style semantic dedup (ops/Dedup.semanticDedupPairs):
    * k-means clustering bounds the pairwise search; planted
    * direction-preserved copies (cosine exactly 1) must land in their
    * original's cluster, so at threshold 0.9 the output is exactly the
    * planted pairs — deterministic despite the approximate blocking. */
  def dedup_semantic(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    val scaled = e
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding", transform(col("embedding"), x => (x * lit(2.0f)).cast("float")))
    val corpus = e.unionByName(scaled)
    Dedup.semanticDedupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, nClusters = 8)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("id_a", "id_b")
  }

  val dedupSemanticSql =
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
      |  CAST(1.0 AS DOUBLE) AS cos_sim
      |FROM embeddings ORDER BY id_a""".stripMargin

  // ---- dedup: connected-components cluster assignment ----
  /** Transitive closure over candidate pairs — near-dup similarity is not
    * transitive, so keep-one-per-group needs components, not pairs. The
    * pair chain here links copy A↔B and B↔C but never A↔C: only the
    * closure puts all three in one cluster (cluster = min member id). In
    * production the input is any pair generator above (minhash/simhash/
    * embedding LSH). */
  def dedup_clusters(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir).documents.select("doc_id")
    val ab = d.select(col("doc_id").as("a"), (col("doc_id") + 10000).as("b"))
    val bc = d.select((col("doc_id") + 10000).as("a"), (col("doc_id") + 20000).as("b"))
    Dedup.clusters(ab.union(bc), "a", "b").orderBy("member")
  }

  val dedupClustersSql =
    """SELECT member, cluster FROM (
      |  SELECT doc_id AS member, doc_id AS cluster FROM documents
      |  UNION ALL SELECT doc_id + 10000, doc_id FROM documents
      |  UNION ALL SELECT doc_id + 20000, doc_id FROM documents)
      |ORDER BY member""".stripMargin

  // ---- skew: salted join (result ≡ plain join) ----
  def join_salted(s: SparkSession, dir: String): DataFrame =
    Skew.saltedJoin(t(s, dir).lineitem, t(s, dir).supplier, "l_suppkey", "s_suppkey", 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("s_nationkey")

  val joinSaltedSql =
    """SELECT s_nationkey, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---- skew: two-phase salted aggregation (result ≡ plain agg) ----
  def agg_salted(s: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(t(s, dir).lineitem, Seq("l_returnflag"), "l_quantity", 16)
      .orderBy("l_returnflag")

  val aggSaltedSql =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_l_quantity
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- dedup: FULL pipeline — signatures → candidates → components →
  // keep-one-per-cluster ----
  /** The production dedup recipe end-to-end on a 3-copy corpus: minhash
    * LSH candidates (threshold 1.0 keeps only identical shingle sets, so
    * the planted sub-1.0 near-dups don't enter), connected components
    * across the copy triangles, anti-join every non-minimal member out.
    * Survivors must be exactly the base corpus. */
  def dedup_pipeline(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir).documents
    val all = base
      .union(base.withColumn("doc_id", col("doc_id") + 10000))
      .union(base.withColumn("doc_id", col("doc_id") + 20000))
    // banding tuned to the threshold: at t=1.0 only identical shingle
    // sets qualify, and identical sets have identical signatures — ONE
    // full-signature band (bandRows = k) has recall 1 and generates only
    // the dup groups as candidates instead of every pair that collides
    // in any of 64 r=1 bands (~1.5M → ~30k candidates at sf0.1)
    val pairs = Dedup.minhashLshPairs(all, "doc_id", "text",
      shingleN = 3, k = 64, bandRows = 64, threshold = 1.0)
    val members = Dedup.clusters(pairs, "doc_a", "doc_b")
    val losers = members.filter(col("member") =!= col("cluster"))
      .select(col("member").as("doc_id"))
    all.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id").orderBy("doc_id")
  }

  // min(doc_id) per distinct text (copy ids are all ≥ 10000, so the
  // per-text minimum over the tripled corpus is the minimum original) —
  // the sf0.1 fixture's duplicate-text originals collapse too
  val dedupPipelineSql =
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"

  // ---- text: PII scrubbing (emails / IPv4 / phone-like runs) ----
  /** Synthetic PII is appended to every doc, then scrubbed; the oracle
    * applies the same public regex recipe in DuckDB (both engines run
    * RE2-compatible patterns — no lookaround). */
  def text_pii_scrub(s: SparkSession, dir: String): DataFrame = {
    val tainted = t(s, dir).documents.select(col("doc_id"),
      concat(col("text"),
        lit(" contact bob@example.com or 192.168.1.1 at +1 (555) 123-4567")).as("text"))
    tainted.select(col("doc_id"),
        graft.ops.TextAnalysis.scrubPii(col("text")).as("clean"))
      .orderBy("doc_id")
  }

  val textPiiScrubSql =
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' contact bob@example.com or 192.168.1.1 at +1 (555) 123-4567',
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      |    '\+?\d[\d() -]{7,}\d', '<PHONE>', 'g') AS clean
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- prune: broadcast bloom prefilter before a fact join ----
  /** Selective build side (top-price orders) joined against the full
    * lineitem history: the bloom prefilter drops non-joining lineitem rows
    * before the shuffle; false positives are removed by the join itself,
    * so the result is exactly the plain join. */
  def join_bloom_prefilter(s: SparkSession, dir: String): DataFrame = {
    val hot = t(s, dir).orders.filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_totalprice")
    graft.ops.Prune.bloomPrefilteredJoin(
        t(s, dir).lineitem, hot, "l_orderkey", "o_orderkey",
        expectedItems = 100000)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val joinBloomPrefilterSql =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 400000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- text quality: Gopher-style repetition filters ----
  def text_repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir).documents, "doc_id", "text")
      .orderBy("doc_id")

  val textRepetitionSql =
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |base AS (SELECT doc_id, len(w) AS n_words,
      |  round((len(w) - len(list_distinct(w))) * 1.0 / greatest(len(w), 1), 6)
      |    AS dup_word_frac, w FROM t),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
      |       FROM t WHERE len(w) >= 2),
      |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
      |top AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
      |        FROM cnt GROUP BY doc_id)
      |SELECT b.doc_id, b.n_words, b.dup_word_frac,
      |  coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
      |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ---- similarity search: exact top-k ----
  def similarity_topk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rk")
  }

  val similarityTopkSql =
    """SELECT query_id, neighbor_id, cos_sim, rk FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_sim,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
      |               c.vec_id ASC) AS rk
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10) sub
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  // ---- similarity search: IVF vs brute-force recall bound ----
  def similarity_ivf_recall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(q, c, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 10)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    // aggregate recall across queries: random synthetic embeddings have no
    // cluster structure, so per-query recall is noisy; the corpus-level
    // recall bound is the meaningful IVF quality invariant here
    exact.join(ivf, col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left")
      .agg(
        count(lit(1)).as("n_exact_pairs"),
        (count(col("n2")) >= 20).as("recall_ok")) // ≥40% of top-5s via 10/16 cells
  }

  val similarityIvfRecallSql =
    "SELECT CAST(50 AS BIGINT) AS n_exact_pairs, true AS recall_ok"

  // ---- similarity search: IVF-PQ (ADC + exact refine) recall bound ----
  // The 100 TB ANN shape: probed-cell candidates score on m=8 product-
  // quantizer codes (never the raw vectors); only refine·k finalists per
  // query fetch raw vectors for the exact re-rank. Recall is necessarily
  // ≤ plain IVF over the same cells (the PQ handoff can drop true
  // neighbors), so the bound is looser than similarity_ivf_recall's.
  def similarity_ivfpq_recall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val pq = Similarity.ivfPqTopK(q, c, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 10, m = 8, ksub = 32, refine = 8)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    exact.join(pq, col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left")
      .agg(
        count(lit(1)).as("n_exact_pairs"),
        (count(col("n2")) >= 15).as("recall_ok")) // ≥30% of top-5s via PQ codes
  }

  val similarityIvfpqRecallSql =
    "SELECT CAST(50 AS BIGINT) AS n_exact_pairs, true AS recall_ok"

  // ---- text analysis: tokens / quality / language id ----
  def text_stats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(t(s, dir).documents, "text")
      .select("doc_id", "n_tokens", "n_bpeish", "punct_ratio",
        "stopword_ratio", "mean_word_len", "quality", "lang_pred")
      .orderBy("doc_id")

  val textStatsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS toks, text FROM documents
      |), sc AS (
      |  SELECT doc_id, toks, text,
      |    len(toks) AS n_tokens,
      |    len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]')) AS n_bpeish,
      |    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
      |      / greatest(length(text), 1) AS punct_ratio,
      |    len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) * 1.0
      |      / greatest(len(toks), 1) AS stopword_ratio,
      |    list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum') * 1.0
      |      / greatest(len(toks), 1) AS mean_word_len,
      |    len(list_filter(toks, x -> list_contains(['the','a','of','and','value','data'], x))) AS s_en,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','nicht'], x))) AS s_de,
      |    len(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS s_fr,
      |    len(list_filter(toks, x -> list_contains(['el','la','y','los','que'], x))) AS s_es,
      |    len(list_filter(toks, x -> list_contains(['的','是','不','了'], x))) AS s_zh
      |  FROM t)
      |SELECT doc_id, n_tokens, n_bpeish, punct_ratio, stopword_ratio, mean_word_len,
      |  round(least(n_tokens / 20.0, 1.0) * 0.4 +
      |        (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
      |        least(stopword_ratio * 5.0, 1.0) * 0.2 +
      |        (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2, 6)
      |    AS quality,
      |  CASE WHEN s_zh > greatest(s_en, s_de, s_fr, s_es) THEN 'zh'
      |       WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
      |       WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
      |       WHEN s_de > s_en THEN 'de'
      |       ELSE 'en' END AS lang_pred
      |FROM sc ORDER BY doc_id""".stripMargin

  // ---- BM25 relevance against a fixed query-term set ----
  def text_bm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(t(s, dir).documents, "doc_id", "text",
        queryTerms = Seq("data", "value", "model"))
      .orderBy("doc_id")

  val textBm25Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM documents),
      |dd AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
      |  WHERE term IN ('data', 'value', 'model')
      |  GROUP BY doc_id, dl, term),
      |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df_t
      |        FROM tf GROUP BY term)
      |SELECT doc_id,
      |  round(sum(ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
      |    * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 2) AS bm25
      |FROM tf JOIN dft USING (term) CROSS JOIN st
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- deterministic content-stable train/val/test split ----
  def curate_split(s: SparkSession, dir: String): DataFrame =
    Curate.hashSplit(t(s, dir).documents, "doc_id",
        trainFrac = 0.9, valFrac = 0.05)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"))
      .orderBy("split")

  val curateSplitSql =
    """WITH s AS (
      |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
      |              ELSE 'test' END AS split,
      |         len(string_split(trim(text), ' ')) AS n_tok
      |  FROM documents)
      |SELECT split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  // ---- quality-weighted subsample: priority sampling, exact SQL oracle ----
  def curate_priority_sample(s: SparkSession, dir: String): DataFrame =
    Curate.prioritySample(
        t(s, dir).documents
          .select(col("doc_id"),
            (pmod(col("n_chars"), lit(97)) + 1).cast("double").as("wt")),
        "doc_id", "wt", k = 200, seed = 42L)
      .select(col("doc_id"), col("wt"), col("sample_priority"))
      .orderBy(col("sample_priority").desc, col("doc_id").asc)

  val curatePrioritySampleSql =
    """WITH w AS (
      |  SELECT doc_id, CAST(n_chars % 97 + 1 AS DOUBLE) AS wt,
      |    md5(CAST(doc_id AS VARCHAR) || ':42') AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, wt,
      |    wt / ((
      |      (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 268435456
      |    + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 16777216
      |    + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 1048576
      |    + (instr('0123456789abcdef', substring(h, 4, 1)) - 1) * 65536
      |    + (instr('0123456789abcdef', substring(h, 5, 1)) - 1) * 4096
      |    + (instr('0123456789abcdef', substring(h, 6, 1)) - 1) * 256
      |    + (instr('0123456789abcdef', substring(h, 7, 1)) - 1) * 16
      |    + (instr('0123456789abcdef', substring(h, 8, 1)) - 1)
      |    + 1) / 4294967296.0) AS sample_priority
      |  FROM w WHERE wt > 0)
      |SELECT doc_id, wt, sample_priority FROM p
      |ORDER BY sample_priority DESC, doc_id ASC LIMIT 200""".stripMargin

  /** DuckDB side of Curate.hexIv32: integer value of the first 8 hex
    * digits of `h` (a column holding an md5 hex string). */
  private def hexIvSql(h: String): String =
    (1 to 8).map { i =>
      s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString("(", " + ", ")")

  // ---- DSIR importance resampling toward an in-domain target corpus ----
  // STRICT-parity caveat (ADVICE r13): the exact-double oracle match here
  // (and in curate_quality_classifier) rides on JVM Math.log/exp/pow
  // agreeing with DuckDB's libm to the last ulp AND on per-doc summation
  // order surviving Spark partial aggregation — green on this host, but
  // environment-sensitive. The GATING level is the driver's normalized
  // hash (which absorbs last-ulp drift); the STRICT claim is a local
  // diagnostic, not a portability guarantee.
  def curate_dsir(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir).documents
    Curate.dsirSelect(docs,
        target = docs.filter(col("lang") === "en" && col("doc_id") % 4 === 0),
        idCol = "doc_id", textCol = "text", k = 150, buckets = 4096, seed = 7L)
      .orderBy(col("dsir_key").desc, col("doc_id").asc)
  }

  val curateDsirSql = {
    val gramIv = hexIvSql("h")
    s"""WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |uni AS (SELECT doc_id, lang, unnest(toks) AS g FROM tok),
      |bi AS (
      |  SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS g
      |  FROM (SELECT doc_id, lang, toks, unnest(generate_series(1, len(toks)-1)) AS i
      |        FROM tok WHERE len(toks) >= 2)),
      |gh AS (SELECT doc_id, lang, md5(g) AS h
      |       FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |gb AS (SELECT doc_id, lang, $gramIv % 4096 AS b FROM gh),
      |db AS (SELECT doc_id, b, count(*) AS n FROM gb GROUP BY doc_id, b),
      |tgt AS (SELECT b, count(*) AS cp FROM gb
      |        WHERE lang = 'en' AND doc_id % 4 = 0 GROUP BY b),
      |qc AS (SELECT b, sum(n) AS cq FROM db GROUP BY b),
      |tot AS (SELECT (SELECT coalesce(sum(cp), 0) FROM tgt) AS np,
      |               (SELECT coalesce(sum(cq), 0) FROM qc) AS nq),
      |lw AS (
      |  SELECT doc_id,
      |    sum(n * (ln(0.9 * coalesce(cp, 0) / CAST(greatest(np, 1) AS DOUBLE)
      |                 + CAST(0.1 AS DOUBLE) / 4096)
      |           - ln(0.9 * cq / CAST(greatest(nq, 1) AS DOUBLE)
      |                 + CAST(0.1 AS DOUBLE) / 4096))) AS dsir_logw
      |  FROM db LEFT JOIN tgt USING (b) JOIN qc USING (b) CROSS JOIN tot
      |  GROUP BY doc_id),
      |kh AS (SELECT doc_id, dsir_logw,
      |              md5(CAST(doc_id AS VARCHAR) || ':7') AS h FROM lw)
      |SELECT doc_id, dsir_logw,
      |  dsir_logw - ln(-ln(($gramIv + 0.5) / 4294967296.0)) AS dsir_key
      |FROM kh
      |ORDER BY dsir_key DESC, doc_id ASC LIMIT 150""".stripMargin
  }

  // ---- GPT-3-style quality classifier + Pareto acceptance sampling ----
  def curate_quality_classifier(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir).documents
    Curate.qualityClassifier(docs, "doc_id", "text",
        positive = docs.filter(col("lang") === "en" && col("doc_id") % 3 === 0),
        negative = docs.filter(col("lang") =!= "en" && col("doc_id") % 3 === 0),
        buckets = 4096, alpha = 9.0, seed = 11L)
      .orderBy("doc_id")
  }

  val curateQualityClassifierSql = {
    val ivG = hexIvSql("h")
    s"""WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |uni AS (SELECT doc_id, lang, unnest(toks) AS g FROM tok),
      |bi AS (
      |  SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS g
      |  FROM (SELECT doc_id, lang, toks, unnest(generate_series(1, len(toks)-1)) AS i
      |        FROM tok WHERE len(toks) >= 2)),
      |gh AS (SELECT doc_id, lang, md5(g) AS h
      |       FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |gb AS (SELECT doc_id, lang, $ivG % 4096 AS b FROM gh),
      |db AS (SELECT doc_id, b, count(*) AS n FROM gb GROUP BY doc_id, b),
      |pos AS (SELECT b, count(*) AS cp FROM gb
      |        WHERE lang = 'en' AND doc_id % 3 = 0 GROUP BY b),
      |neg AS (SELECT b, count(*) AS cn FROM gb
      |        WHERE lang <> 'en' AND doc_id % 3 = 0 GROUP BY b),
      |tot AS (SELECT (SELECT coalesce(sum(cp), 0) FROM pos) AS np,
      |               (SELECT coalesce(sum(cn), 0) FROM neg) AS nn),
      |ml AS (
      |  SELECT doc_id,
      |    sum(n * (ln(0.9 * coalesce(cp, 0) / CAST(greatest(np, 1) AS DOUBLE)
      |                 + CAST(0.1 AS DOUBLE) / 4096)
      |           - ln(0.9 * coalesce(cn, 0) / CAST(greatest(nn, 1) AS DOUBLE)
      |                 + CAST(0.1 AS DOUBLE) / 4096))) / sum(n) AS mean_lr
      |  FROM db LEFT JOIN pos USING (b) LEFT JOIN neg USING (b) CROSS JOIN tot
      |  GROUP BY doc_id),
      |sc AS (SELECT doc_id, 1.0 / (1.0 + exp(-mean_lr)) AS quality_score,
      |              md5(CAST(doc_id AS VARCHAR) || '~11') AS h
      |       FROM ml)
      |SELECT doc_id, quality_score,
      |  quality_score > 1.0 -
      |    (power(($ivG + 0.5) / 4294967296.0, CAST(-1 AS DOUBLE) / 9) - 1) AS kept
      |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---- deterministic epoch shuffle into trainer shards ----
  def curate_epoch_shuffle(s: SparkSession, dir: String): DataFrame =
    Curate.epochShuffle(t(s, dir).documents, "doc_id", numShards = 8, epoch = 3L)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  val curateEpochShuffleSql =
    s"""WITH h AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#3') AS h FROM documents),
      |iv AS (SELECT doc_id, ${hexIvSql("h")} AS iv FROM h)
      |SELECT doc_id, CAST(iv % 8 AS INT) AS shard,
      |  CAST(row_number() OVER (PARTITION BY iv % 8 ORDER BY iv, doc_id) AS INT) AS pos
      |FROM iv ORDER BY shard, pos""".stripMargin

  // ---- RAG chunking: 64-token windows, 16-token overlap ----
  def curate_chunk(s: SparkSession, dir: String): DataFrame =
    Curate.chunkDocuments(t(s, dir).documents.filter(col("doc_id") < 100),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk"), col("n_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id", "chunk_id")

  val curateChunkSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE doc_id < 100),
      |s AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    1 + CAST(ceil(greatest(0, len(toks) - 64) / 48.0) AS INT) AS nc
      |  FROM t),
      |e AS (SELECT doc_id, toks, n, unnest(generate_series(0, nc - 1)) AS k FROM s)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
      |  array_to_string(toks[k*48 + 1 : k*48 + 64], ' ') AS chunk,
      |  CAST(least(64, n - k*48) AS BIGINT) AS n_tokens
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin

  // ---- text fingerprinting: dup-collision + injectivity invariants ----
  def text_fingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithDups(s, dir)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    d.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("fp")).as("n_distinct_fp"),
      countDistinct(col("text")).as("n_distinct_text"),
      (countDistinct(col("fp")) === countDistinct(col("text"))).as("fp_injective"))
  }

  val textFingerprintSql =
    """SELECT count(*) * 2 AS n_docs,
      |  count(DISTINCT text) AS n_distinct_fp,
      |  count(DISTINCT text) AS n_distinct_text,
      |  true AS fp_injective
      |FROM documents""".stripMargin

  // ---- Shard (ref ops/shard.rs): deterministic 1-of-N input sharding ----
  def shard(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val world = 4
    val sharded = o.withColumn("shard", pmod(xxhash64(col("o_orderkey")), lit(world)))
    // every row lands in exactly one shard; rank r reads shard===r
    sharded.groupBy("shard").agg(count(lit(1)).as("n"))
      .agg(sum("n").as("total_rows"), count(lit(1)).as("n_shards"))
  }

  val shardSql =
    "SELECT count(*) AS total_rows, CAST(4 AS BIGINT) AS n_shards FROM orders"

  // ---- checkpoint-resume (ref ops/stage_checkpoint_keys.rs /
  // key_filtering.rs): anti-join processed keys on re-run ----
  def checkpoint_resume(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir).orders
    val processed = o.filter(col("o_orderkey") % 10 < 3).select(col("o_orderkey").as("done_key"))
    o.join(processed, col("o_orderkey") === col("done_key"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_remaining"))
      .orderBy("o_orderstatus")
  }

  val checkpointResumeSql =
    """SELECT o_orderstatus, count(*) AS n_remaining FROM orders
      |WHERE o_orderkey % 10 >= 3
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- curation: domain mixing (exact head-by-order quota per domain) ----
  def curate_mix_domains(s: SparkSession, dir: String): DataFrame =
    Curate.mixDomains(t(s, dir).documents, "lang", "doc_id",
        weights = Map("en" -> 0.5, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.1),
        total = 200, bucketWidth = 64)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val curateMixDomainsSql =
    """WITH q(lang, quota) AS (VALUES ('en', 100), ('de', 30), ('fr', 30), ('es', 20), ('zh', 20)),
      |r AS (
      |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang FROM r JOIN q USING (lang) WHERE rn <= quota
      |ORDER BY doc_id""".stripMargin

  // ---- curation: domain mixing by TOKEN budget (prefix within budget) ----
  def curate_mix_token_budget(s: SparkSession, dir: String): DataFrame =
    Curate.mixDomainsByBudget(t(s, dir).documents, "lang", "doc_id",
        weightCol = size(split(trim(col("text")), "\\s+")),
        budgets = Map("en" -> 4000L, "de" -> 1500L, "fr" -> 1200L,
          "es" -> 800L, "zh" -> 600L),
        bucketWidth = 64)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val curateMixTokenBudgetSql =
    """WITH b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('fr', 1200), ('es', 800), ('zh', 600)),
      |r AS (
      |  SELECT doc_id, lang,
      |    sum(len(string_split(trim(text), ' ')))
      |      OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS run
      |  FROM documents)
      |SELECT doc_id, lang FROM r JOIN b USING (lang) WHERE run <= budget
      |ORDER BY doc_id""".stripMargin

  // ---- curation: unigram-LM perplexity scoring (CCNet-style filter core) ----
  def curate_lm_score(s: SparkSession, dir: String): DataFrame =
    Curate.lmScore(t(s, dir).documents, "doc_id", "text")
      .orderBy("doc_id")

  val curateLmScoreSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tk
      |  FROM documents),
      |tok2 AS (SELECT * FROM tok WHERE tk <> ''),
      |vocab AS (SELECT tk, count(*) AS c FROM tok2 GROUP BY tk),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM vocab)
      |SELECT doc_id, count(*) AS n_tokens, avg(ln((c + 1) / (n + v))) AS avg_logp,
      |       exp(-avg(ln((c + 1) / (n + v)))) AS ppl
      |FROM tok2 JOIN vocab USING (tk) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- curation: greedy sequence packing into fixed token budgets ----
  def curate_pack_sequences(s: SparkSession, dir: String): DataFrame =
    Curate.packSequences(t(s, dir).documents.filter(col("doc_id") < 300),
        "doc_id", "text", budget = 256, shardSize = 64)
      .orderBy("doc_id")

  val curatePackSequencesSql =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, doc_id // 64 AS shard,
      |         CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
      |         row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS rn
      |  FROM documents WHERE doc_id < 300),
      |packed AS (
      |  SELECT shard, rn, doc_id, n_tokens, 0 AS bin, n_tokens AS fill FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
      |         CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > 256 THEN p.bin + 1 ELSE p.bin END,
      |         CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > 256 THEN d.n_tokens ELSE p.fill + d.n_tokens END
      |  FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
      |SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, n_tokens FROM packed
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "curate_mix_domains" -> (curate_mix_domains _),
    "curate_mix_token_budget" -> (curate_mix_token_budget _),
    "curate_lm_score" -> (curate_lm_score _),
    "curate_pack_sequences" -> (curate_pack_sequences _),
    "dedup_exact" -> (dedup_exact _),
    "dedup_lines" -> (dedup_lines _),
    "dedup_substring" -> (dedup_substring _),
    "dedup_decontaminate" -> (dedup_decontaminate _),
    "dedup_ngram_jaccard" -> (dedup_ngram_jaccard _),
    "dedup_ngram_jaccard_dfcap" -> (dedup_ngram_jaccard_dfcap _),
    "dedup_minhash_lsh" -> (dedup_minhash_lsh _),
    "dedup_simhash" -> (dedup_simhash _),
    "dedup_embedding_cosine" -> (dedup_embedding_cosine _),
    "dedup_embedding_lsh" -> (dedup_embedding_lsh _),
    "dedup_semantic" -> (dedup_semantic _),
    "dedup_clusters" -> (dedup_clusters _),
    "dedup_pipeline" -> (dedup_pipeline _),
    "text_pii_scrub" -> (text_pii_scrub _),
    "join_salted" -> (join_salted _),
    "agg_salted" -> (agg_salted _),
    "join_bloom_prefilter" -> (join_bloom_prefilter _),
    "text_repetition" -> (text_repetition _),
    "similarity_topk" -> (similarity_topk _),
    "similarity_ivf_recall" -> (similarity_ivf_recall _),
    "similarity_ivfpq_recall" -> (similarity_ivfpq_recall _),
    "text_stats" -> (text_stats _),
    "text_bm25" -> (text_bm25 _),
    "curate_split" -> (curate_split _),
    "curate_chunk" -> (curate_chunk _),
    "curate_priority_sample" -> (curate_priority_sample _),
    "curate_dsir" -> (curate_dsir _),
    "curate_quality_classifier" -> (curate_quality_classifier _),
    "curate_epoch_shuffle" -> (curate_epoch_shuffle _),
    "text_fingerprint" -> (text_fingerprint _),
    "shard" -> (shard _),
    "checkpoint_resume" -> (checkpoint_resume _))

  val oracle: Map[String, String] = Map(
    "curate_mix_domains" -> curateMixDomainsSql,
    "curate_mix_token_budget" -> curateMixTokenBudgetSql,
    "curate_lm_score" -> curateLmScoreSql,
    "curate_pack_sequences" -> curatePackSequencesSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_lines" -> dedupLinesSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_decontaminate" -> dedupDecontaminateSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_ngram_jaccard_dfcap" -> dedupNgramJaccardDfcapSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_embedding_lsh" -> dedupEmbeddingLshSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_pipeline" -> dedupPipelineSql,
    "text_pii_scrub" -> textPiiScrubSql,
    "join_salted" -> joinSaltedSql,
    "agg_salted" -> aggSaltedSql,
    "join_bloom_prefilter" -> joinBloomPrefilterSql,
    "text_repetition" -> textRepetitionSql,
    "similarity_topk" -> similarityTopkSql,
    "similarity_ivf_recall" -> similarityIvfRecallSql,
    "similarity_ivfpq_recall" -> similarityIvfpqRecallSql,
    "text_stats" -> textStatsSql,
    "text_bm25" -> textBm25Sql,
    "curate_split" -> curateSplitSql,
    "curate_chunk" -> curateChunkSql,
    "curate_priority_sample" -> curatePrioritySampleSql,
    "curate_dsir" -> curateDsirSql,
    "curate_quality_classifier" -> curateQualityClassifierSql,
    "curate_epoch_shuffle" -> curateEpochShuffleSql,
    "text_fingerprint" -> textFingerprintSql,
    "shard" -> shardSql,
    "checkpoint_resume" -> checkpointResumeSql)
}
