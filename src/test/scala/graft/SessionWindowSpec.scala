package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native `session_window()` path and the flatMapGroupsWithState path
  * implement the SAME gap semantics (exactly-gap-apart events share a
  * session; strictly-greater gaps split) — their per-user session/event
  * counts must be identical on the fixture. */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("session_window() and flatMapGroupsWithState sessionization agree") {
    val native = streaming.Streaming
      .sessionizeNative(spark, TestSpark.sfDir, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val fmgws = streaming.Streaming
      .sessionize(spark, TestSpark.sfDir, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(native.nonEmpty)
    assert(native == fmgws)
  }

  test("transformWithState sessionization agrees with the native path") {
    val native = streaming.Streaming
      .sessionizeNative(spark, TestSpark.sfDir, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val tws = streaming.Streaming
      .sessionizeTws(spark, TestSpark.sfDir, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(tws.nonEmpty)
    assert(native == tws)
  }
}
