package graft

import graft.ops.{Ai, Images}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ai protocol implementations (ref daft/ai/protocols.py): image
  * embedder geometry, zero-shot text classifier, dominant-channel image
  * classifier — all over real decoded pixels / real embeddings. */
class AiProtocolSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("grid image embedder: unit norm, pure-channel orthogonality") {
    val e = new Ai.GridPoolImageEmbedder(4)
    val Seq(red, blue) = e.embedBatch(Seq(
      Images.solidPng(16, 16, 200, 0, 0), Images.solidPng(16, 16, 0, 0, 200)))
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(red) - 1) < 1e-5 && math.abs(norm(blue) - 1) < 1e-5)
    val cos = red.zip(blue).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(cos) < 1e-6, s"pure red vs pure blue must be orthogonal, got $cos")
    assert(e.dimensions == 48 && red.length == 48)
  }

  test("image embedder handles undecodable bytes as zero vector") {
    val e = new Ai.GridPoolImageEmbedder(4)
    val Seq(v) = e.embedBatch(Seq(Array[Byte](1, 2, 3)))
    assert(v.forall(_ == 0f))
  }

  test("zero-shot text classifier routes marker texts to their label") {
    val df = Seq(
      (1L, "alpha alpha alpha"), (2L, "bravo bravo"), (3L, "charlie charlie charlie"))
      .toDF("id", "text")
    val out = Ai.classifyText(df, "text", "label", Seq("alpha", "bravo", "charlie"))
      .orderBy("id").select("label").as[String].collect().toSeq
    assert(out == Seq("alpha", "bravo", "charlie"))
  }

  test("image classifier: dominant channel and balanced-gray cases") {
    val df = Seq(
      (1L, Images.solidPng(8, 8, 220, 30, 30)),
      (2L, Images.solidPng(8, 8, 30, 220, 30)),
      (3L, Images.solidPng(8, 8, 30, 30, 220)),
      (4L, Images.solidPng(8, 8, 128, 128, 128)),
      (5L, Array[Byte](9, 9))).toDF("id", "png")
    val out = Ai.classifyImage(df, "png", "label")
      .orderBy("id").select("label").as[String].collect().toSeq
    assert(out == Seq("red", "green", "blue", "gray", "unknown"))
  }
}
