package graft

import graft.implicits._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The user-facing facade: a reference user's verbs through graft.implicits. */
class ApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("facade session registers the SQL cosine function") {
    graft.expressions.CosineSimilarityExpr.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("DataFrame extension verbs compose") {
    val docs = Tables(spark, dir).documents
    val deduped = docs.union(docs.withColumn("doc_id", col("doc_id") + 10000))
      .dedupExact(Seq("text"), keepBy = "doc_id")
    assert(deduped.count() == docs.count())

    val sharded = (0 until 4).map(r => Tables(spark, dir).orders.shard(4, r, "o_orderkey"))
    assert(sharded.map(_.count()).sum == Tables(spark, dir).orders.count())

    val summary = docs.summarizeCols("doc_id", "lang")
    assert(summary.count() == 2)
  }

  test("curation and writer verbs delegate to their ops") {
    val docs = Tables(spark, dir).documents
    val mixed = docs.mixDomains("lang", "doc_id", Map("en" -> 1.0), total = 5)
    assert(mixed.count() == 5 &&
      mixed.select("lang").distinct().head().getString(0) == "en")

    val packed = docs.packSequences("doc_id", "text", budget = 128)
    assert(packed.count() == docs.count())

    val ch = new graft.sources.ClickHouse.MiniClickHouse
    try {
      docs.select("doc_id", "lang").writeClickhouse(ch.endpoint, "verbs").count()
      assert(ch.rowCount("verbs") == docs.count())
    } finally ch.close()
  }

  test("asofJoin through the implicit API") {
    val e = Tables(spark, dir).events
    val clicks = e.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puser"), col("ts").as("pts"))
    val joined = clicks.asofJoin(purchases, "ts", "pts", Seq("user_id"), Seq("puser"))
    assert(joined.count() == clicks.count())
  }

  test("persistent tables round-trip through the warehouse") {
    val sess = GraftSession(spark)
    val nation = Tables(spark, dir).nation
    sess.dropTable("apispec_persist")
    sess.createTable("apispec_persist", nation.filter(col("n_regionkey") < 2))
    val base = sess.readTable("apispec_persist").count()
    assert(base == nation.filter(col("n_regionkey") < 2).count())
    sess.writeTable("apispec_persist", nation.filter(col("n_regionkey") === 2))
    assert(sess.readTable("apispec_persist").count() ==
      nation.filter(col("n_regionkey") <= 2).count())
    // persistent = visible in the catalog as non-temporary
    val row = sess.listTables()
      .filter(col("tableName") === "apispec_persist").head()
    assert(!row.getBoolean(1), "saveAsTable must create a non-temp table")
    sess.dropTable("apispec_persist")
  }

  test("lakehouse tables attach to the catalog for SQL") {
    import spark.implicits._
    val sess = GraftSession(spark)
    val path = "/tmp/graft_api_attach_delta"
    sources.Delta.deleteTable(path)
    sources.Delta.write(
      (1 to 50).map(i => (i.toLong, (i % 5).toString)).toDF("id", "g"), path,
      partitionBy = Seq("g"))
    sess.attachDelta("attached_delta", path)
    val n = sess.sql(
      "SELECT g, count(*) AS n FROM attached_delta GROUP BY g ORDER BY g").collect()
    assert(n.length == 5 && n.forall(_.getLong(1) == 10))
    sess.dropTempTable("attached_delta")
  }

  test("dedup pipeline verbs: near-dup pairs cluster and keep one per group") {
    val docs = Tables(spark, dir).documents
    // plant exact near-dups: shifted ids, same text
    val corpus = docs.union(docs.withColumn("doc_id", col("doc_id") + 100000))
    val pairs = corpus.minhashDedup("doc_id", "text", shingleN = 3, threshold = 0.9)
    assert(pairs.count() >= docs.count(), "each planted duplicate must pair with its source")
    val clusters = pairs.dedupClusters("doc_a", "doc_b")
    assert(clusters.select("cluster").distinct().count() <= docs.count())
    // decontaminate drops every doc sharing 13-grams with the eval set
    val eval = docs.limit(5).select(col("text").as("eval_text"))
    val clean = docs.decontaminate(eval, "text", "eval_text")
    assert(clean.count() <= docs.count() - 5)
  }

  test("similarity and skew verbs through the implicit API") {
    val emb = Tables(spark, dir).embeddings
    val queries = emb.limit(3)
    val top = emb.similarTopK(queries, "vec_id", "embedding", k = 5)
    // every query returns its k neighbors, best-first
    assert(top.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))

    val orders = Tables(spark, dir).orders
    val keys = orders.select(col("o_orderkey").as("k")).limit(100)
    val joined = orders.bloomPrefilteredJoin(keys, "o_orderkey", "k", expectedItems = 100)
    assert(joined.count() == 100)
  }

  test("text column namespace: counts, language, quality, fingerprint, pii") {
    import spark.implicits._
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog and runs home today", "en"),
      ("contact me at alice@example.com or 192.168.0.1 now", "pii"))
      .toDF("text", "tag")
    val r = df.select(
      col("tag"), col("text").tokenCount.as("n"), col("text").langId.as("lang"),
      col("text").qualityScore.as("q"), col("text").fingerprint.as("fp"),
      col("text").scrubPii.as("clean")).collect()
    val en = r.find(_.getString(0) == "en").get
    assert(en.getInt(1) >= 10 && en.getDouble(3) > 0.0)
    val pii = r.find(_.getString(0) == "pii").get
    assert(!pii.getString(5).contains("alice@example.com") &&
      !pii.getString(5).contains("192.168.0.1"))
  }

  test("delta maintenance through the facade: optimize zorder, then vacuum") {
    import spark.implicits._
    val path = "/tmp/graft_api_maintain_delta"
    sources.Delta.deleteTable(path)
    val df = (1 to 4096).map(i => (i.toLong, (i * 37 % 4096).toLong)).toDF("x", "y")
    Graft.writeDeltalake(df.repartition(8), path)
    val bytes = sources.Delta.snapshot(spark, path).files.map(_.size).sum
    Graft.optimizeDeltalakeZorder(spark, path, Seq("x", "y"), targetFileBytes = bytes / 8)
    assert(Graft.readDeltalake(spark, path).count() == 4096)
    // old files are unreferenced after the rewrite; a 0-retention vacuum removes them
    val deleted = Graft.vacuumDeltalake(spark, path, retainMillis = 0L)
    assert(deleted >= 8, s"expected the pre-zorder files vacuumed, got $deleted")
    assert(Graft.readDeltalake(spark, path).count() == 4096)
  }

  test("tokenize round-trips through a corpus vocab") {
    val docs = Tables(spark, dir).documents.limit(50)
    val vocab = ops.Tokenize.buildVocab(docs, "text")
    val enc = ops.Tokenize.encode(docs, "doc_id", "text", vocab)
    val dec = ops.Tokenize.decode(enc, "doc_id", "ids", vocab)
    val bad = docs.join(dec, "doc_id").filter(col("decoded") =!= col("text")).count()
    assert(bad == 0)
  }
}
