package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mcap

/** MCAP container source/sink: write → read round-trips for every chunk
  * compression, topic/time pushdowns, malformed-input rejection. */
class McapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int) =
    (1 to n).map { i =>
      (if (i % 2 == 0) "/sensors/lidar" else "/sensors/camera",
        i * 1000L, i * 1000L + 5, i, s"""{"seq":$i}""")
    }.toDF("topic", "log_time", "publish_time", "sequence", "data")

  for (comp <- Seq("none", "lz4", "zstd")) {
    test(s"round-trips messages through $comp-compressed chunks") {
      val dir = s"/tmp/graft_mcap_spec_$comp"
      Mcap.write(fixture(200).repartition(3), dir,
        "topic", "log_time", "publish_time", "sequence", "data", compression = comp)
      val back = Mcap.read(spark, s"$dir/*.mcap").orderBy("sequence").collect()
      assert(back.length == 200)
      back.zipWithIndex.foreach { case (r, i) =>
        val seq = i + 1
        assert(r.getString(0) == (if (seq % 2 == 0) "/sensors/lidar" else "/sensors/camera"))
        assert(r.getLong(1) == seq * 1000L)
        assert(r.getLong(2) == seq * 1000L + 5)
        assert(r.getInt(3) == seq)
        assert(r.getString(4) == s"""{"seq":$seq}""")
      }
    }
  }

  test("topic and [start, end) log-time pushdowns filter during the parse") {
    val dir = "/tmp/graft_mcap_spec_filters"
    Mcap.write(fixture(100).coalesce(1), dir,
      "topic", "log_time", "publish_time", "sequence", "data")
    val got = Mcap.read(spark, s"$dir/*.mcap",
        topics = Some(Seq("/sensors/lidar")),
        startTime = Some(20000L), endTime = Some(60000L))
      .select("sequence").as[Int].collect().sorted
    // even sequences with 20000 <= seq*1000 < 60000
    assert(got.toSeq == (20 until 60 by 2).toSeq)
  }

  test("rejects non-MCAP bytes") {
    val in = new java.io.ByteArrayInputStream("PAR1 not mcap".getBytes)
    val e = intercept[java.io.IOException](
      Mcap.parseStream(in, None, None, None).toList)
    assert(e.getMessage.contains("magic"))
  }
}
