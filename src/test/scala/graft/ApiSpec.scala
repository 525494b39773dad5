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

  test("tokenize round-trips through a corpus vocab") {
    val docs = Tables(spark, dir).documents.limit(50)
    val vocab = ops.Tokenize.buildVocab(docs, "text")
    val enc = ops.Tokenize.encode(docs, "doc_id", "text", vocab)
    val dec = ops.Tokenize.decode(enc, "doc_id", "ids", vocab)
    val bad = docs.join(dec, "doc_id").filter(col("decoded") =!= col("text")).count()
    assert(bad == 0)
  }
}
