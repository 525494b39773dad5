package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two decontamination execution paths — broadcast membership set vs
  * shuffled semi/anti join (chosen by `maxBroadcastGrams`) — must agree
  * exactly: same surviving documents, any eval-set size. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    Tables(spark, TestSpark.sfDir).documents.select("doc_id", "text")

  // contaminate against a slice of the corpus itself: guaranteed 13-gram
  // overlap for long-enough docs, none for the rest
  private lazy val eval = docs.filter(col("doc_id") % 7 === 0).select("text")

  test("broadcast path and join path drop the same documents") {
    val viaBroadcast = ops.Dedup
      .decontaminate(docs, "text", eval, "text", n = 13,
        maxBroadcastGrams = Long.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // threshold 0 forces the shuffled fallback on the same inputs
    val viaJoin = ops.Dedup
      .decontaminate(docs, "text", eval, "text", n = 13,
        maxBroadcastGrams = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBroadcast == viaJoin)
    assert(viaBroadcast.size < docs.count()) // something was dropped
  }

  test("join path keeps clean documents and drops contaminated ones") {
    val survivors = ops.Dedup
      .decontaminate(docs, "text", eval, "text", n = 13, maxBroadcastGrams = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // docs with >= 13 normalized tokens that fed the eval set must be gone
    val contaminatedIds = docs
      .filter(col("doc_id") % 7 === 0)
      .filter(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")) >= 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminatedIds.intersect(survivors).isEmpty)
  }
}
