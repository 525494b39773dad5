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

  /** Exact top-k: every (query, corpus) pair scored, top k per query.
    * The query side is broadcast; the corpus is never shuffled — the
    * window ranks within query-id partitions of the (small) scored set. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String, k: Int): DataFrame = {
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
}
