package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The watermarked stream-stream interval join and the bounded-state
  * streaming dedup must reproduce their batch equivalents exactly on the
  * bounded fixture. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-stream interval join equals the batch interval join") {
    val streamed = streaming.Streaming
      .streamJoin(spark, TestSpark.sfDir, "ssj_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val ev = Tables(spark, TestSpark.sfDir).events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val batch = v.join(p,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("p_value"), 2).as("purchase_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("dropDuplicatesWithinWatermark restores single-copy counts") {
    val streamed = streaming.Streaming
      .dedupWithinWatermark(spark, TestSpark.sfDir, "dedupw_spec")
      .select(col("event_type"), col("n"), round(col("total_value"), 2).as("tv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Tables(spark, TestSpark.sfDir).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("tv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
