package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka.MiniBroker
import graft.streaming.KafkaStream

/** Structured-Streaming Kafka source (`format("graft-kafka")`) against the
  * in-process MiniBroker: exactly-once restart from the checkpoint,
  * admission control, latest-start semantics, offset json round-trip. */
class KafkaStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_kstream_$tag"
    graft.sources.Hudi.deleteTable(p) // recursive delete helper
    Files.createDirectories(Paths.get(p))
    p
  }

  private def fill(b: MiniBroker, topic: String, from: Int, until: Int): Unit =
    (from until until).foreach(i =>
      b.append(topic, i % 2, 1000L + i, s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8)))

  private def runAvailableNow(b: MiniBroker, topic: String, out: String,
      ck: String, extra: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("graft-kafka")
      .option("kafka.bootstrap.servers", b.bootstrap)
      .option("topics", topic)
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .selectExpr("partition", "offset", "cast(value as string) AS value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query must terminate")
  }

  test("offset json round-trips with stable key order") {
    val o = KafkaStream.KOffset(Map(("t", 1) -> 5L, ("t", 0) -> 2L, ("u", 0) -> 7L))
    val j = o.json()
    assert(j == """{"t":{"0":2,"1":5},"u":{"0":7}}""")
    assert(KafkaStream.parseOffset(j) == o)
  }

  test("exactly-once across restart: second run reads only the new records") {
    val b = new MiniBroker
    try {
      b.createTopic("tt", 2)
      fill(b, "tt", 0, 5)
      val out = freshDir("eo_out"); val ck = freshDir("eo_ck")
      runAvailableNow(b, "tt", out, ck)
      val first = spark.read.parquet(out).as[(Int, Long, String)].collect().sortBy(_._3)
      assert(first.map(_._3).sameElements((0 until 5).map(i => s"v$i")))

      fill(b, "tt", 5, 8)
      runAvailableNow(b, "tt", out, ck)
      val all = spark.read.parquet(out).as[(Int, Long, String)].collect()
      assert(all.length == 8, "no replays, no losses")
      assert(all.map(_._3).sorted.sameElements((0 until 8).map(i => s"v$i").sorted))
      // per-partition offsets are dense from 0 — proves both partitions read
      val byPart = all.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(byPart(0).sameElements(byPart(0).indices.map(_.toLong)))
      assert(byPart(1).sameElements(byPart(1).indices.map(_.toLong)))
    } finally b.close()
  }

  test("maxOffsetsPerTrigger splits the backlog into multiple micro-batches") {
    val b = new MiniBroker
    try {
      b.createTopic("tc", 2)
      fill(b, "tc", 0, 12)
      val out = freshDir("cap_out"); val ck = freshDir("cap_ck")
      runAvailableNow(b, "tc", out, ck, Map("maxOffsetsPerTrigger" -> "4"))
      assert(spark.read.parquet(out).count() == 12, "cap bounds batches, not totals")
      val batches = Files.list(Paths.get(ck, "offsets")).count()
      assert(batches >= 3, s"12 rows / cap 4 needs >= 3 micro-batches, got $batches")
    } finally b.close()
  }

  test("cap below the backlogged-partition count still makes progress (no starvation)") {
    val b = new MiniBroker
    try {
      // 3 backlogged partitions, cap 2: a floor-only proration gives every
      // partition ⌊backlog·2/6⌋ = 0 → end==start forever and AvailableNow
      // never reaches its frozen target. Sub-1 shares must round up.
      b.createTopic("ts", 3)
      (0 until 3).foreach(p => (0 until 2).foreach(i =>
        b.append("ts", p, 1000L + i, s"k$p-$i".getBytes(UTF_8), s"v$p-$i".getBytes(UTF_8))))
      val out = freshDir("starve_out"); val ck = freshDir("starve_ck")
      runAvailableNow(b, "ts", out, ck, Map("maxOffsetsPerTrigger" -> "2"))
      assert(spark.read.parquet(out).count() == 6, "all partitions drained")
    } finally b.close()
  }

  test("startingOffsets=latest skips history and reads only post-start appends") {
    val b = new MiniBroker
    try {
      b.createTopic("tl", 1)
      fill(b, "tl", 0, 6) // history that must be skipped
      val out = freshDir("late_out"); val ck = freshDir("late_ck")
      val q = spark.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", b.bootstrap)
        .option("topics", "tl")
        .option("startingOffsets", "latest")
        .load()
        .selectExpr("cast(value as string) AS value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      try {
        q.processAllAvailable()
        b.append("tl", 0, 9999L, null, "fresh".getBytes(UTF_8))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(out).as[String].collect()
      assert(got.sameElements(Array("fresh")))
    } finally b.close()
  }

  test("a partition added mid-stream is read from its LOW watermark (no lost rows)") {
    val b = new MiniBroker
    try {
      b.createTopic("tg", 1)
      fill(b, "tg", 0, 4) // all land in partition 0 (i % 2 ∈ {0,1}? ids 0..3 → parts 0/1)
      val out = freshDir("grow_out"); val ck = freshDir("grow_ck")
      val q = spark.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", b.bootstrap)
        .option("topics", "tg")
        .load()
        .selectExpr("partition", "cast(value as string) AS value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      try {
        q.processAllAvailable()
        // partition 7 appears mid-stream WITH rows already in it — the
        // rows written before the source discovers it must not be lost
        b.append("tg", 7, 5000L, null, "pre-discovery".getBytes(UTF_8))
        b.append("tg", 7, 5001L, null, "post".getBytes(UTF_8))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(out)
        .selectExpr("value").as[String].collect().sorted
      assert(got.contains("pre-discovery") && got.contains("post"),
        s"new partition must start at its low watermark, got ${got.mkString(",")}")
    } finally b.close()
  }

  test("batch read parity through the same provider") {
    val b = new MiniBroker
    try {
      b.createTopic("tb", 2)
      fill(b, "tb", 0, 7)
      val df = spark.read.format("graft-kafka")
        .option("bootstrap", b.bootstrap)
        .option("topics", "tb")
        .load()
      assert(df.schema == graft.sources.kafka.Kafka.schema)
      assert(df.count() == 7)
      assert(df.rdd.getNumPartitions == 2, "one task per Kafka partition")
    } finally b.close()
  }
}
