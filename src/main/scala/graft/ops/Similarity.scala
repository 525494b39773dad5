package graft.ops

import graft.functions.{Distance => GDist}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns (builder
  * brief). Baseline: exact brute-force cosine top-k — a broadcast join of
  * the (small) query set against the corpus, ranked per query; no corpus
  * shuffle, scales linearly with corpus size. Scale path: IVF — KMeans
  * coarse quantizer, search only the nprobe nearest centroid cells
  * (corpus scan cost / (nlist/nprobe)). */
object Similarity {

  /** Hard cap on the broadcast query set (VERDICT r13 #6): the contract
    * is a SMALL query frame — a 10M-row query side would OOM every
    * executor as a broadcast build. ~100k queries × ~128 floats ≈ 64 MB,
    * around Spark's own broadcast comfort ceiling. Past the cap the
    * caller should flip the roles (query the corpus in batches) or use
    * [[ivfTopK]], whose probe join shuffles instead of broadcasting. */
  val MaxBroadcastQueries = 100000L

  /** Exact top-k: every (query, corpus) pair scored, top k per query.
    * The query side is broadcast; the corpus is never shuffled — the
    * window ranks within query-id partitions of the (small) scored set.
    *
    * The cap check evaluates the query plan a second time (once for the
    * guard count, once for the broadcast) — pass a cached/leased frame,
    * or at least a DETERMINISTIC one: an unseeded `sample` could pass
    * the count yet broadcast a different row set (ADVICE r14). The guard
    * projects only the id column and counts a `limit(cap+1)` so the
    * probe job stops at the cap instead of scanning a huge frame. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String, k: Int): DataFrame = {
    val nq = queries.select(col(qId))
      .limit((MaxBroadcastQueries + 1).toInt).count()
    require(nq <= MaxBroadcastQueries,
      s"bruteForceTopK broadcasts the query set: >$MaxBroadcastQueries " +
        "queries exceed the cap — batch the queries or use ivfTopK " +
        "(shuffled probe join) for corpus-scaled query frames")
    val scored = corpus.join(
        broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv"))))
      .withColumn("cos_sim", GDist.cosineSimilarityNative(col("qv"), col(cVec)))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col(cId).asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(cId).as("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** IVF top-k: assign corpus vectors to KMeans cells once (an O(n·nlist)
    * map pass), then for each query probe only the `nprobe` nearest cells.
    * Recall < 1 by construction; pair with `bruteForceTopK` as the
    * verification stage on candidate subsets. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // L2-normalize for clustering: on the unit sphere euclidean distance is
    // monotone in cosine, so cell assignment matches the cosine metric.
    def l2norm(v: org.apache.spark.sql.Column) =
      transform(v, x => x.cast("double") / GDist.norm(v))

    // Train the coarse quantizer on a bounded sample: centroid quality needs
    // only ~O(100) points per cell, so cap the fit input at ~max(100k,
    // 100*nlist) vectors instead of scanning the full corpus per KMeans
    // iteration (at 100 TB the full-corpus fit would dominate the query).
    val fitCap = math.max(100000L, 100L * nlist)
    val corpusN = corpus.count()
    val trainBase =
      if (corpusN <= fitCap) corpus
      else corpus.sample(withReplacement = false, fitCap.toDouble / corpusN, seed)
    val train = trainBase.select(array_to_vector(l2norm(col(cVec))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(train)
    val cents: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    val spark = corpus.sparkSession
    val bcCents = spark.sparkContext.broadcast(cents)

    // per-row nearest-cells scan over the broadcast centroid table: a pure
    // map pass — no n×nlist row blowup, no shuffle, no per-id window. Ties
    // break toward the lower cell index (matching the previous
    // (dist asc, cell asc) ranking exactly).
    def nearestCells(n: Int) = udf { (v: Seq[Float]) =>
      val cs = bcCents.value
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      val dists = Array.tabulate(cs.length) { c =>
        var d = 0.0
        var j = 0
        while (j < cs(c).length) {
          val diff = (if (norm == 0) 0.0 else v(j) / norm) - cs(c)(j)
          d += diff * diff
          j += 1
        }
        (d, c)
      }
      dists.sortBy(identity).take(n).map(_._2)
    }

    val corpusCells = corpus
      .withColumn("cell", nearestCells(1)(col(cVec))(0))
      .select(col(cId), col(cVec), col("cell"))

    // queries probe their nprobe nearest cells
    val queryCells = queries
      .withColumn("cell", explode(nearestCells(nprobe)(col(qVec))))
      .select(col(qId).as("query_id"), col(qVec).as("qv"), col("cell"))

    val scored = queryCells.join(corpusCells, Seq("cell"))
      .withColumn("cos_sim", GDist.cosineSimilarityNative(col("qv"), col(cVec)))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col(cId).asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(cId).as("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** IVF-PQ top-k (IVFADC; Jégou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"): [[ivfTopK]]'s coarse
    * cells plus an m-way product quantizer, so candidate scoring reads m
    * small integer codes per vector instead of the full float vector.
    * THIS is the 100 TB ANN shape: the codes table is (4·d)/m× smaller
    * than the raw embeddings (64-dim float → 8 codes ≈ 32× with byte
    * packing), so the probed-cell scan is bandwidth-bound on codes, and
    * raw vectors are fetched (joined) only for the refine·k finalists
    * per query.
    *
    * Scoring is ADC (asymmetric distance computation): each query builds
    * one m×ksub lookup table of partial inner products against the
    * broadcast codebooks — built ONCE per query, not per candidate — and
    * every candidate scores with m table lookups. The top refine·k PQ
    * candidates re-rank EXACTLY on the raw vectors, so returned cos_sim
    * values are true cosines and ordering errors are confined to the
    * PQ→exact candidate handoff.
    *
    * All passes are map-side over broadcast models (centroids +
    * codebooks); the only shuffles are the cell equi-join and the two
    * per-query windows, whose input is candidates, not corpus. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int, nprobe: Int,
      m: Int = 8, ksub: Int = 256, refine: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    def l2norm(v: org.apache.spark.sql.Column) =
      transform(v, x => x.cast("double") / GDist.norm(v))

    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(cVec))).first().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val sub = dim / m

    // one bounded sample feeds BOTH the coarse quantizer and the m
    // sub-quantizers (same rationale as ivfTopK's fit cap)
    val fitCap = math.max(100000L, 100L * math.max(nlist, ksub))
    val corpusN = corpus.count()
    val trainBase =
      if (corpusN <= fitCap) corpus
      else corpus.sample(withReplacement = false, fitCap.toDouble / corpusN, seed)
    val train = trainBase.select(l2norm(col(cVec)).as("nv")).persist()
    val nTrain = train.count() // materialize the lease once

    val coarse = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(train.select(array_to_vector(col("nv")).as("features")))
    val cents: Array[Array[Double]] = coarse.clusterCenters.map(_.toArray)

    // per-subspace codebooks: KMeans over the subvector slices. ksub is
    // clamped so tiny corpora (tests, cold starts) still fit.
    val ksubEff = math.min(ksub, math.max(2, (nTrain / 2).toInt))
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val slice = train.select(array_to_vector(
        slice_(col("nv"), j * sub + 1, sub)).as("features"))
      new KMeans().setK(ksubEff).setSeed(seed + j).setMaxIter(10)
        .fit(slice).clusterCenters.map(_.toArray)
    }
    train.unpersist()
    val bcCents = spark.sparkContext.broadcast(cents)
    val bcBooks = spark.sparkContext.broadcast(codebooks)

    def normalized(v: Seq[Float]): Array[Double] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      Array.tabulate(v.length)(i => if (n == 0) 0.0 else v(i) / n)
    }

    def nearestCells(n: Int) = udf { (v: Seq[Float]) =>
      val cs = bcCents.value
      val nv = normalized(v)
      val dists = Array.tabulate(cs.length) { c =>
        var d = 0.0; var j = 0
        while (j < cs(c).length) { val t = nv(j) - cs(c)(j); d += t * t; j += 1 }
        (d, c)
      }
      dists.sortBy(identity).take(n).map(_._2)
    }

    // encode: nearest sub-centroid per subspace — m codes per vector
    val encodeUdf = udf { (v: Seq[Float]) =>
      val books = bcBooks.value
      val nv = normalized(v)
      Array.tabulate(books.length) { j =>
        val cb = books(j)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0; var i = 0
          while (i < cb(c).length) { val t = nv(j * cb(c).length + i) - cb(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }

    // ADC lookup table: partial inner products query-subvector × centroid
    val lutUdf = udf { (v: Seq[Float]) =>
      val books = bcBooks.value
      val nv = normalized(v)
      books.zipWithIndex.map { case (cb, j) =>
        cb.map { cent =>
          var s = 0.0; var i = 0
          while (i < cent.length) { s += nv(j * cent.length + i) * cent(i); i += 1 }
          s
        }.toSeq
      }.toSeq
    }
    val adcUdf = udf { (lut: Seq[Seq[Double]], codes: Seq[Int]) =>
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
      s
    }

    // the scan side carries ONLY (id, cell, codes) — never the raw vector
    val corpusCodes = corpus
      .withColumn("cell", nearestCells(1)(col(cVec))(0))
      .withColumn("codes", encodeUdf(col(cVec)))
      .select(col(cId).as("__cid"), col("cell"), col("codes"))

    val queryCells = queries
      .withColumn("lut", lutUdf(col(qVec)))
      .withColumn("cell", explode(nearestCells(nprobe)(col(qVec))))
      .select(col(qId).as("query_id"), col(qVec).as("qv"), col("lut"), col("cell"))

    val pqScored = queryCells.join(corpusCodes, Seq("cell"))
      .withColumn("pq_sim", adcUdf(col("lut"), col("codes")))
    val wPq = Window.partitionBy("query_id").orderBy(col("pq_sim").desc, col("__cid").asc)
    val finalists = pqScored
      .withColumn("prk", row_number().over(wPq))
      .filter(col("prk") <= refine.toLong * k)
      .select(col("query_id"), col("qv"), col("__cid"))

    // exact re-rank: fetch raw vectors for the finalists only
    val exact = finalists
      .join(corpus.select(col(cId).as("__cid"), col(cVec).as("__cv")), Seq("__cid"))
      .withColumn("cos_sim", GDist.cosineSimilarityNative(col("qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("__cid").asc)
    exact
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("__cid").as("neighbor_id"), col("cos_sim"), col("rk"))
  }

  // `slice` collides with the DataFrame method name in scope
  private def slice_(c: org.apache.spark.sql.Column, start: Int, len: Int) =
    org.apache.spark.sql.functions.slice(c, start, len)
}
