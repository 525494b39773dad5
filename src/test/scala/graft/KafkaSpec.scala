package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafka.{Kafka, KafkaClient, MiniBroker, Wire}

/** Bounded Kafka batch source against an in-process wire-protocol broker
  * (the LlmClientSpec pattern: the protocol is exercised over a real
  * socket against an independent implementation of the published spec,
  * not a mock of our own client). Covers bound resolution — earliest/
  * latest, timestamp_ms, explicit offset maps with watermark clamping —
  * partition filtering, per-partition task parallelism, RecordBatch v2
  * decode (including multi-batch fetch loops), and binary key/value
  * round-trips. Ref surface: daft/io/_kafka.py. */
class KafkaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withBroker(f: MiniBroker => Unit): Unit = {
    val b = new MiniBroker
    try f(b) finally b.close()
  }

  private def fill(b: MiniBroker, topic: String, parts: Int, perPart: Int): Unit =
    for (p <- 0 until parts; i <- 0 until perPart)
      b.append(topic, p, 1000L * i, s"k$p-$i".getBytes, s"v$p-$i".getBytes)

  test("earliest to latest reads every message exactly once, one task per partition") {
    withBroker { b =>
      fill(b, "t", 3, 250)
      val df = Kafka.read(spark, b.bootstrap, Seq("t"))
      assert(df.rdd.getNumPartitions == 3, "one Spark task per Kafka partition")
      assert(df.count() == 750)
      val perPart = df.groupBy("partition").count().as[(Int, Long)].collect().toMap
      assert(perPart == Map(0 -> 250L, 1 -> 250L, 2 -> 250L))
      // offsets are dense per partition and messages round-trip bytes
      val r = df.filter(col("partition") === 1 && col("offset") === 42L)
        .select(decode(col("key"), "UTF-8"), decode(col("value"), "UTF-8"), col("timestamp_ms"))
        .as[(String, String, Long)].head()
      assert(r == (("k1-42", "v1-42", 42000L)))
    }
  }

  test("explicit offset maps bound the read and clamp to watermarks") {
    withBroker { b =>
      fill(b, "t", 2, 100)
      val df = Kafka.read(spark, b.bootstrap, Seq("t"),
        start = Kafka.Offsets(Map("t" -> Map(0 -> 10L, 1 -> 90L))),
        end = Kafka.Offsets(Map("t" -> Map(0 -> 20L, 1 -> 500L)))) // 500 clamps to 100
      val got = df.groupBy("partition")
        .agg(count(lit(1)), min("offset"), max("offset"))
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == Seq((0, 10L, 10L, 19L), (1, 10L, 90L, 99L)))
    }
  }

  test("offset maps must cover exactly the topics being read") {
    withBroker { b =>
      fill(b, "t", 1, 5)
      val e = intercept[IllegalArgumentException] {
        Kafka.read(spark, b.bootstrap, Seq("t"),
          start = Kafka.Offsets(Map("other" -> Map(0 -> 0L))))
      }
      assert(e.getMessage.contains("exactly the topics"))
      val e2 = intercept[IllegalArgumentException] {
        Kafka.read(spark, b.bootstrap, Seq("t"),
          start = Kafka.Offsets(Map("t" -> Map(0 -> -5L))))
      }
      assert(e2.getMessage.contains(">= 0"))
    }
  }

  test("timestamp bounds resolve broker-side; past-the-end falls back to latest") {
    withBroker { b =>
      fill(b, "t", 1, 100) // timestamps 0, 1000, ..., 99000
      val mid = Kafka.read(spark, b.bootstrap, Seq("t"),
        start = Kafka.TimestampMs(50000L))
      assert(mid.count() == 50, "first offset with ts >= 50000 is 50")
      assert(mid.agg(min("offset")).as[Long].head() == 50L)
      val none = Kafka.read(spark, b.bootstrap, Seq("t"),
        start = Kafka.TimestampMs(10_000_000L))
      assert(none.count() == 0, "timestamp past the log end resolves to the high watermark")
    }
  }

  test("partition filter limits the read to the requested partitions") {
    withBroker { b =>
      fill(b, "t", 4, 20)
      val df = Kafka.read(spark, b.bootstrap, Seq("t"), partitions = Some(Set(1, 3)))
      assert(df.select("partition").distinct().as[Int].collect().toSet == Set(1, 3))
      assert(df.count() == 40)
    }
  }

  test("multiple topics read together; empty ranges drop their tasks") {
    withBroker { b =>
      fill(b, "a", 2, 10)
      b.createTopic("empty", 2)
      val df = Kafka.read(spark, b.bootstrap, Seq("a", "empty"))
      assert(df.rdd.getNumPartitions == 2, "empty partitions plan no tasks")
      assert(df.groupBy("topic").count().as[(String, Long)].collect().toMap == Map("a" -> 20L))
    }
  }

  test("unknown topic fails fast at planning time") {
    withBroker { b =>
      fill(b, "t", 1, 1)
      val e = intercept[Exception](Kafka.read(spark, b.bootstrap, Seq("nope")).count())
      assert(e.getMessage.contains("nope"))
    }
  }

  test("client fetch loop crosses multiple record batches and round trips") {
    withBroker { b =>
      // 1234 records forces multiple 100-record batches and (with the
      // byte-budget cap in the stub) multiple fetch round trips
      fill(b, "big", 1, 1234)
      val df = Kafka.read(spark, b.bootstrap, Seq("big"))
      assert(df.count() == 1234)
      assert(df.agg(max("offset")).as[Long].head() == 1233L)
      assert(df.select(sum(decode(col("value"), "UTF-8").substr(lit(4), lit(10)).cast("long")))
        .as[Long].head() == (0 until 1234).map(_.toLong).sum)
    }
  }

  test("record batch encode/decode round trips nulls and binary payloads") {
    val recs = Seq(
      Wire.Record(7L, 1111L, null, Array[Byte](0, 1, 2, -1)),
      Wire.Record(8L, 2222L, Array[Byte](9), null),
      Wire.Record(9L, 3333L, Array.emptyByteArray, Array.emptyByteArray))
    val got = Wire.decodeRecordBatches(Wire.encodeRecordBatch(7L, recs))
    assert(got.map(_.offset) == Seq(7L, 8L, 9L))
    assert(got.map(_.timestampMs) == Seq(1111L, 2222L, 3333L))
    assert(got(0).key == null && got(0).value.toSeq == Seq[Byte](0, 1, 2, -1))
    assert(got(1).key.toSeq == Seq[Byte](9) && got(1).value == null)
    assert(got(2).key.isEmpty && got(2).value.isEmpty)
  }

  test("ApiVersions handshake and direct client calls against the broker") {
    withBroker { b =>
      fill(b, "t", 1, 3)
      val c = new KafkaClient("127.0.0.1", b.port)
      try {
        val vs = c.apiVersions()
        assert(vs.contains(1) && vs.contains(2) && vs.contains(3))
        assert(c.listOffset("t", 0, -2L) == 0L)
        assert(c.listOffset("t", 0, -1L) == 3L)
        val (hw, recs) = c.fetch("t", 0, 1L)
        assert(hw == 3L && recs.map(_.offset) == Seq(1L, 2L))
      } finally c.close()
    }
  }
}
