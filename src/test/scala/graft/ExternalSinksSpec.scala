package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ClickHouse, Sinks, Turbopuffer}

/** External-service writers over public HTTP protocols, tested against
  * independent in-process stubs (the MiniBroker pattern): ClickHouse
  * HTTP-interface sink and Turbopuffer vector upsert/query. */
class ExternalSinksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("clickhouse TSV escaping round-trips hostile strings byte-exactly") {
    val ch = new ClickHouse.MiniClickHouse
    try {
      val df = Seq(
        (1L, "plain"),
        (2L, "tab\there"),
        (3L, "new\nline and \\backslash\\"),
        (4L, "cr\rև unicode ünïcode 中文"),
        (5L, null.asInstanceOf[String])
      ).toDF("id", "s").repartition(2)
      val res = Sinks.writeSink(df, new ClickHouse.Sink(ch.endpoint, "esc"))
      assert(res.agg(sum("rowsWritten")).as[Long].head() == 5)
      assert(ch.rowCount("esc") == 5)
      val back = ClickHouse.readAll(spark, ch.endpoint, "esc", schema = df.schema)
        .as[(Long, String)].collect().sortBy(_._1)
      assert(back(0)._2 == "plain")
      assert(back(1)._2 == "tab\there")
      assert(back(2)._2 == "new\nline and \\backslash\\")
      assert(back(3)._2 == "cr\rև unicode ünïcode 中文")
      assert(back(4)._2 == null)
    } finally ch.close()
  }

  test("clickhouse tsvValue keeps the sign of pre-epoch sub-second timestamps") {
    def ts(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
    assert(ClickHouse.tsvValue(ts(-500L)) == "-0.500000",   "(-1s,0) must keep '-'")
    assert(ClickHouse.tsvValue(ts(-1500L)) == "-1.500000",  "not a floorDiv rendering")
    assert(ClickHouse.tsvValue(ts(1500L)) == "1.500000")
    assert(ClickHouse.tsvValue(ts(0L)) == "0.000000")
    assert(ClickHouse.tsvValue(ts(-1000L)) == "-1.000000")
  }

  test("clickhouse TSV round-trip holds for random hostile strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val hostileChar: Gen[Char] =
      Gen.oneOf('\t', '\n', '\r', '\\', '"', 'ü', '中', ' ', 'x', '☃')
    val strGen: Gen[String] = Gen.frequency(
      (4, Gen.asciiPrintableStr),
      (2, Gen.listOfN(8, hostileChar).map(_.mkString)),
      (1, Gen.const("")))
    val batchGen: Gen[List[String]] = Gen.listOfN(50, strGen)
    val ch = new ClickHouse.MiniClickHouse
    try (0 until 4).foreach { round =>
      val strings: List[String] =
        batchGen.apply(Gen.Parameters.default, Seed(77L + round)).getOrElse(Nil)
      val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val tbl = s"prop_$round"
      Sinks.writeSink(df.repartition(3), new ClickHouse.Sink(ch.endpoint, tbl)).count()
      val back = ClickHouse.readAll(spark, ch.endpoint, tbl, schema = df.schema)
        .as[(Long, String)].collect().sortBy(_._1).map(_._2).toList
      assert(back == strings, s"round $round: TSV round-trip diverged")
    } finally ch.close()
  }

  test("clickhouse sink batches large partitions and recreates on start") {
    val ch = new ClickHouse.MiniClickHouse
    try {
      val df = spark.range(0, 2500).select(col("id"), (col("id") * 2).as("v"))
      Sinks.writeSink(df.repartition(4), new ClickHouse.Sink(ch.endpoint, "big", batchRows = 100)).count()
      assert(ch.rowCount("big") == 2500)
      // start() drops + recreates: a second write must not double up
      Sinks.writeSink(df.repartition(4), new ClickHouse.Sink(ch.endpoint, "big", batchRows = 100)).count()
      assert(ch.rowCount("big") == 2500)
    } finally ch.close()
  }

  test("turbopuffer upserts are idempotent by id and auth is enforced") {
    val tp = new Turbopuffer.MiniTurbopuffer(requiredKey = "sk-test")
    try {
      val df = Seq((7L, Seq(1.0f, 0.0f), "a"), (7L, Seq(0.0f, 1.0f), "b"))
        .toDF("id", "vector", "tag")
      Sinks.writeSink(df.coalesce(1),
        new Turbopuffer.Sink(tp.endpoint, "ns1", apiKey = "sk-test")).count()
      assert(tp.size("ns1") == 1, "same id upserts must collapse")
      val bad = intercept[Exception] {
        Sinks.writeSink(df, new Turbopuffer.Sink(tp.endpoint, "ns1", apiKey = "wrong")).count()
      }
      assert(bad.getMessage.contains("401"))
    } finally tp.close()
  }

  test("turbopuffer ANN query returns exact cosine top-k over the upserted set") {
    val tp = new Turbopuffer.MiniTurbopuffer
    try {
      // corpus on the unit circle: nearest to angle 0 is angle ±0.1, etc.
      val corpus = (0 until 8).map { i =>
        val a = i * math.Pi / 4
        (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
      }.toDF("vec_id", "embedding")
      Sinks.writeSink(corpus,
        new Turbopuffer.Sink(tp.endpoint, "circle",
          idColumn = "vec_id", vectorColumn = "embedding")).count()
      assert(tp.size("circle") == 8)
      val got = Turbopuffer.queryTopK(tp.endpoint, "circle", Seq(1.0, 0.05), k = 3)
      assert(got.map(_._1) == Seq(0L, 1L, 7L),
        s"expected angular neighbors of ~0 rad, got $got")
      assert(got.head._2 < 0.01, "nearest distance should be ~0")
    } finally tp.close()
  }
}
