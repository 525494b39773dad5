package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curate

/** Corpus curation ops: domain mixing (exact distributed head-by-order),
  * unigram-LM scoring (CCNet-style), greedy sequence packing. */
class CurateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map { i =>
      val dom = Seq("en", "de", "fr")(i % 3)
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} filler", dom)
    }.toDF("doc_id", "text", "lang")

  test("mixDomains equals the naive per-domain window head, across buckets") {
    val docs = corpus(300)
    val weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    // bucketWidth 16 forces every domain through whole-bucket + boundary paths
    val got = Curate.mixDomains(docs, "lang", "doc_id", weights, total = 120,
        bucketWidth = 16)
      .select("doc_id").as[Long].collect().sorted

    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("doc_id")))
      .withColumn("quota",
        when(col("lang") === "en", 60).when(col("lang") === "de", 36).otherwise(24))
      .filter(col("rn") <= col("quota"))
      .select("doc_id").as[Long].collect().sorted
    assert(got.length == 120)
    assert(got.sameElements(naive))
  }

  test("mixDomains: quota above domain size takes the whole domain; missing domain dropped") {
    val docs = corpus(30)
    val got = Curate.mixDomains(docs, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.0), total = 1000, bucketWidth = 8)
    val byDom = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("en" -> 10L)) // all 10 en docs, de quota 0, fr unweighted
  }

  test("mixDomainsByBudget keeps the maximal in-budget prefix per domain") {
    val docs = Seq(
      (0L, "a", 10), (1L, "a", 10), (2L, "a", 10), // budget 25: rows 0,1 (20), row 2 overflows
      (3L, "b", 100),                               // budget 50: overflowing head → empty
      (10L, "c", 30), (11L, "c", 30)                // budget 60: exactly both
    ).toDF("doc_id", "lang", "w")
    val got = Curate.mixDomainsByBudget(docs, "lang", "doc_id", col("w"),
        Map("a" -> 25L, "b" -> 50L, "c" -> 60L), bucketWidth = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(Array(0L, 1L, 10L, 11L)))
  }

  test("mixDomainsByBudget equals the naive running-sum filter across buckets") {
    val docs = corpus(300).withColumn("w", (col("doc_id") % 7 + 1).cast("long"))
    val budgets = Map("en" -> 150L, "de" -> 90L, "fr" -> 40L)
    val got = Curate.mixDomainsByBudget(docs, "lang", "doc_id", col("w"), budgets,
        bucketWidth = 16)
      .select("doc_id").as[Long].collect().sorted
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .withColumn("run", sum("w").over(
        Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("budget",
        when(col("lang") === "en", 150L).when(col("lang") === "de", 90L).otherwise(40L))
      .filter(col("run") <= col("budget"))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(naive))
  }

  test("lmScore matches a hand-computed unigram model with add-one smoothing") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Curate.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    // counts: a=2 b=2 c=1, N=5, V=3 → p(a)=3/8, p(b)=3/8, p(c)=2/8
    val pa = 3.0 / 8; val pb = 3.0 / 8; val pc = 2.0 / 8
    val d1 = (math.log(pa) * 2 + math.log(pb)) / 3
    val d2 = (math.log(pb) + math.log(pc)) / 2
    assert(got.map(_._2).sameElements(Array(3L, 2L)))
    assert(math.abs(got(0)._3 - d1) < 1e-12 && math.abs(got(1)._3 - d2) < 1e-12)
    assert(math.abs(got(0)._4 - math.exp(-d1)) < 1e-9)
  }

  test("lmScore smooths unseen tokens instead of ln(0), and drops empty docs") {
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((10L, "a zzz"), (11L, "   ")).toDF("doc_id", "text")
    val got = Curate.lmScore(docs, "doc_id", "text", train = Some(train))
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1 && got(0)._1 == 10L)
    // N=3 V=2: p(a)=(2+1)/5, p(zzz)=(0+1)/5 — finite
    val want = (math.log(3.0 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(got(0)._3 - want) < 1e-12)
  }

  test("lmScore skew guard: a planted hot token never reaches the shuffle join") {
    // one token in ~90% of docs (the Zipf head), unique fillers as tail
    val docs = (0 until 400).map { i =>
      val hot = if (i % 10 != 0) "the " * 20 else ""
      (i.toLong, s"${hot}uniq_$i tail_${i % 7}")
    }.toDF("doc_id", "text")
    // values must be identical with the guard on (headK=8 captures "the")
    // and effectively off (headK=0 → everything through the shuffle)
    def run(k: Int) = Curate.lmScore(docs, "doc_id", "text", headK = k)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    val (guarded, unguarded) =
      try (run(8), run(0)) finally graft.ops.Caches.releaseAll()
    assert(guarded.map(r => (r._1, r._2)) == unguarded.map(r => (r._1, r._2)))
    guarded.zip(unguarded).foreach { case (g, u) =>
      assert(math.abs(g._3 - u._3) < 1e-9, s"doc ${g._1}: ${g._3} vs ${u._3}") }

    // straggler property: with the guard the hot token joins map-side, so
    // the shuffle carries only tail tokens — shuffle records must drop by
    // at least the hot-token share (~90% of volume here). Auto-broadcast
    // is disabled to emulate the at-scale plan where the vocab exceeds
    // the broadcast threshold (the guard's explicit broadcast() hint on
    // the bounded top-K head still applies — that is the point).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def shuffleRecords(k: Int): Long = {
      recs.set(0L)
      spark.sparkContext.addSparkListener(listener)
      try {
        run(k)
        Thread.sleep(800) // let the listener bus drain task-end events
        recs.get()
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        graft.ops.Caches.releaseAll()
      }
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (without, withGuard) =
      try (shuffleRecords(0), shuffleRecords(8))
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(withGuard < without / 2,
      s"hot token still shuffling: $withGuard records with guard vs $without without")
  }

  test("packSequences: greedy fill, oversize doc gets its own bin, shards independent") {
    val docs = Seq(
      (0L, "w " * 100), (1L, "w " * 100), (2L, "w " * 100), // 100+100 | 100
      (3L, "w " * 300),                                     // oversize → own bin
      (4L, "w " * 10),
      (64L, "w " * 10)                                      // next shard → bin 0
    ).map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val got = Curate.packSequences(docs, "doc_id", "text", budget = 256, shardSize = 64)
      .orderBy("doc_id")
      .as[(Long, Long, Int, Int)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).sameElements(Array(
      (0L, 0L, 0), (1L, 0L, 0), (2L, 0L, 1), (3L, 0L, 2), (4L, 0L, 3), (64L, 1L, 0))))
    assert(got(3)._4 == 300)
  }

  test("packSequences never overfills a bin except for single oversize docs") {
    val docs = corpus(300)
    val packed = Curate.packSequences(docs, "doc_id", "text", budget = 16, shardSize = 50)
    val fills = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long)].collect()
    assert(fills.forall { case (_, _, fill, n) => fill <= 16 || n == 1 })
    assert(packed.count() == 300)
  }

  test("chunkDocuments: coverage, overlap, tail, and lossless reassembly") {
    val C = 8; val O = 3; val step = C - O
    val docs = Seq(
      (0L, (1 to 30).map(i => s"t$i").mkString(" ")), // multi-chunk
      (1L, (1 to 8).map(i => s"u$i").mkString(" ")),  // exactly one chunk
      (2L, "a b c"),                                  // shorter than chunk
      (3L, (1 to 9).map(i => s"v$i").mkString(" "))   // chunk + 1 → 2 chunks
    ).toDF("doc_id", "text")
    val out = Curate.chunkDocuments(docs, "doc_id", "text", C, O)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, String, Int)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunk counts: 1 + ceil(max(0, n-C)/step)
    assert(byDoc(0L).length == 1 + math.ceil((30 - C).toDouble / step).toInt)
    assert(byDoc(1L).length == 1 && byDoc(2L).length == 1 && byDoc(3L).length == 2)
    for ((id, chunks) <- byDoc) {
      val orig = docs.filter(col("doc_id") === id)
        .select("text").as[String].head().split("\\s+").toSeq
      // window k holds tokens [k*step, k*step+C)
      chunks.foreach { case (_, k, text, nTok) =>
        val want = orig.slice(k * step, k * step + C)
        assert(text.split(" ").toSeq == want, s"doc $id chunk $k")
        assert(nTok == want.length)
      }
      // every token index covered; consecutive chunks overlap by O (full
      // windows); tail chunk reaches the last token
      val covered = chunks.flatMap { case (_, k, _, nTok) =>
        k * step until (k * step + nTok) }.toSet
      assert(covered == orig.indices.toSet, s"doc $id coverage")
    }
  }

  test("chunkDocuments with zero overlap reassembles the exact document") {
    val docs = Seq((7L, (1 to 23).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val parts = Curate.chunkDocuments(docs, "doc_id", "text", 5, 0)
      .orderBy("chunk_id").select("chunk").as[String].collect()
    assert(parts.mkString(" ") == (1 to 23).map(i => s"w$i").mkString(" "))
  }

  test("prioritySample: deterministic, exact-k, weight-monotone selection") {
    val docs = (0 until 2000).map { i =>
      // two weight classes: heavy (10.0) vs light (1.0), interleaved
      (i.toLong, if (i % 2 == 0) 10.0 else 1.0)
    }.toDF("doc_id", "w")
    val a = Curate.prioritySample(docs, "doc_id", "w", k = 400, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == 400, "must select exactly k rows")
    // bit-identical rerun
    val b = Curate.prioritySample(docs, "doc_id", "w", k = 400, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same seed must select the identical set")
    // different seed selects a different set (overwhelming probability)
    val c = Curate.prioritySample(docs, "doc_id", "w", k = 400, seed = 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(a != c, "a different seed should perturb the sample")
    // weight-monotone: 10x-weighted docs must dominate the selection
    // (E[heavy] ≈ k·10/11 ≈ 364; even a loose bound separates the classes)
    val heavy = a.count(_ % 2 == 0)
    assert(heavy > 280 && (400 - heavy) < 120,
      s"heavy-weight share implausible: $heavy of 400")
    // equals the naive local computation exactly (same u, same ordering)
    val naive = docs.collect().map { r =>
      val id = r.getLong(0); val w = r.getDouble(1)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val iv = java.lang.Long.parseLong(h, 16)
      (w / ((iv + 1).toDouble / 4294967296.0), id)
    }.sortBy { case (p, id) => (-p, id) }.take(400).map(_._2).toSet
    assert(a == naive, "distributed sample must equal the reference computation")
  }

  test("dsirSelect prefers target-like documents, deterministically") {
    // 30 in-domain docs (science-ish vocabulary) + 30 noise docs with a
    // disjoint vocabulary; the target corpus samples the in-domain style
    val raw = (0 until 60).map { i =>
      val text =
        if (i < 30) s"quantum spark engine data model tensor shard batch q${i % 5}"
        else s"zzz${i % 7} yyy${i % 5} xxx${i % 3} www vvv uuu ttt n$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val target = Seq(
      (1000L, "quantum data engine tensor model"),
      (1001L, "spark shard batch tensor data"),
      (1002L, "engine model quantum spark batch")).toDF("doc_id", "text")

    val sel = Curate.dsirSelect(raw, target, "doc_id", "text", k = 20,
      buckets = 1024, seed = 3L)
    val rows = sel.collect()
    assert(rows.length == 20, "must select exactly k documents")
    val ids = rows.map(_.getLong(0)).toSet
    val inDomain = ids.count(_ < 30)
    assert(inDomain >= 18,
      s"importance resampling must strongly prefer target-like docs, got $inDomain/20")

    // log-weights separate the classes: every in-domain doc outweighs
    // every noise doc (disjoint vocabularies, smoothing aside)
    val logw = Curate.dsirSelect(raw, target, "doc_id", "text", k = 60,
        buckets = 1024, seed = 3L)
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect().toMap
    val minIn = (0L until 30L).map(logw).min
    val maxOut = (30L until 60L).map(logw).max
    assert(minIn > maxOut,
      s"in-domain log-weights must dominate: min-in $minIn vs max-out $maxOut")

    // bit-identical rerun; different seed perturbs the boundary sample
    val again = Curate.dsirSelect(raw, target, "doc_id", "text", k = 20,
      buckets = 1024, seed = 3L).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "same seed must reproduce the identical selection")
  }

  test("dsirSelect: empty/degenerate docs drop out; k caps the output") {
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "), (4L, "alpha"))
      .toDF("doc_id", "text")
    val target = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val got = Curate.dsirSelect(raw, target, "doc_id", "text", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L), "zero-gram docs cannot be scored or sampled")
  }

  test("qualityClassifier separates classes; Pareto acceptance is monotone in score") {
    // 40 docs: half share vocabulary with the positive reference, half
    // with the negative one
    val docs = (0 until 40).map { i =>
      val text =
        if (i % 2 == 0) s"clean prose article reference section cite p${i % 5}"
        else s"buy now click spam winner free q${i % 5} z$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val pos = Seq((100L, "clean prose article section reference"),
      (101L, "article cite reference prose")).toDF("doc_id", "text")
    val neg = Seq((200L, "buy click spam free winner"),
      (201L, "spam click buy winner")).toDF("doc_id", "text")

    val out = Curate.qualityClassifier(docs, "doc_id", "text", pos, neg,
      buckets = 1024, alpha = 9.0, seed = 5L)
      .select("doc_id", "quality_score", "kept")
      .as[(Long, Double, Boolean)].collect()
    assert(out.length == 40, "every scorable doc gets a row")
    val (hi, lo) = out.partition(_._1 % 2 == 0)
    assert(hi.map(_._2).min > lo.map(_._2).max,
      "positive-like docs must outscore negative-like docs")
    assert(hi.forall(_._2 > 0.5) && lo.forall(_._2 < 0.5),
      "sigmoid scores must sit on the right sides of 0.5")
    // acceptance replays EXACTLY from (score, id): kept ⟺ score > 1 − (u^(−1/α) − 1)
    // — P(keep) = (2−score)^−9 is deliberately aggressive (GPT-3 kept a
    // minority of Common Crawl), so assert the exact rule + monotonicity,
    // not absolute keep counts
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id~5".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8)
      (java.lang.Long.parseLong(h, 16).toDouble + 0.5) / 4294967296.0
    }
    out.foreach { case (id, s0, kept) =>
      val expect = s0 > 1.0 - (math.pow(u(id), -1.0 / 9.0) - 1.0)
      assert(kept == expect, s"doc $id acceptance disagrees with the local replay")
    }
    assert(hi.count(_._3).toDouble / hi.length > lo.count(_._3).toDouble / lo.length,
      "keep-rate must be monotone in score")
    assert(lo.count(_._3) <= 6, s"low-score docs mostly dropped: ${lo.count(_._3)}/20")
    // deterministic rerun
    val again = Curate.qualityClassifier(docs, "doc_id", "text", pos, neg,
      buckets = 1024, alpha = 9.0, seed = 5L)
      .select("doc_id", "quality_score", "kept")
      .as[(Long, Double, Boolean)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("epochShuffle: exact permutation per epoch, stable, epoch-sensitive") {
    val docs = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
    val e0 = Curate.epochShuffle(docs, "doc_id", numShards = 8, epoch = 0L)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // every doc exactly once; shards within range
    assert(e0.length == 500 && e0.map(_._1).toSet.size == 500)
    assert(e0.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are contiguous 1..n within each shard
    e0.groupBy(_._2).foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1 to rows.length), s"shard $s positions not contiguous")
    }
    // rerun identical; a different epoch produces a different permutation
    val e0b = Curate.epochShuffle(docs, "doc_id", numShards = 8, epoch = 0L)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e0.sortBy(_._1).sameElements(e0b.sortBy(_._1)))
    val e1 = Curate.epochShuffle(docs, "doc_id", numShards = 8, epoch = 1L)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e0.sortBy(_._1).map(r => (r._2, r._3)).toSeq !=
      e1.sortBy(_._1).map(r => (r._2, r._3)).toSeq,
      "epoch must reshuffle the corpus")
    // the shuffle is not the identity order within a shard
    val firstShard = e0.filter(_._2 == e0.head._2).sortBy(_._3).map(_._1)
    assert(firstShard.toSeq != firstShard.sorted.toSeq,
      "within-shard order must be permuted, not id order")
  }

  test("prioritySample drops non-positive weights and honors tiny k") {
    val docs = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0), (4L, 1.0))
      .toDF("doc_id", "w")
    val got = Curate.prioritySample(docs, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L, 4L), "zero/negative weights are unsampleable")
    val one = Curate.prioritySample(docs, "doc_id", "w", k = 1)
    assert(one.count() == 1)
  }
}
