package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.types.{FileRef, ImageValue, SparseTensorValue, TensorValue}

/** Image/Tensor/SparseTensor/File UDTs: typed Dataset round-trip through
  * parquet + storage-type degradation for untyped readers (SURVEY §1.2;
  * same contract EmbeddingUDTSpec proves for Embedding). */
class MediaUDTSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("Image UDT round-trips through parquet") {
    val data = Seq(
      (1L, ImageValue(Array[Byte](1, 2, 3, 4, 5, 6), 1, 2, "RGB", 3)),
      (2L, ImageValue(Array[Byte](9, 8), 2, 1, "L", 1)))
    val path = "/tmp/graft_io/udt_image"
    data.toDF("id", "img").write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path).as[(Long, ImageValue)].collect().sortBy(_._1)
    assert(back.toSeq == data)
    // storage degrades to a plain struct for untyped readers
    val row = spark.read
      .schema("id LONG, img STRUCT<data: BINARY, height: INT, width: INT, mode: STRING, channels: INT>")
      .parquet(path).orderBy("id").head()
    assert(row.getStruct(1).getAs[String]("mode") == "RGB")
    assert(row.getStruct(1).getAs[Int]("height") == 1)
  }

  test("Tensor UDT round-trips through parquet") {
    val data = Seq(
      (1L, TensorValue(Array(1f, 2f, 3f, 4f, 5f, 6f), Array(2L, 3L))),
      (2L, TensorValue(Array(0.5f), Array(1L, 1L, 1L))))
    val path = "/tmp/graft_io/udt_tensor"
    data.toDF("id", "t").write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path).as[(Long, TensorValue)].collect().sortBy(_._1)
    assert(back.toSeq == data)
    assert(back.head._2.numElements == 6L)
  }

  test("SparseTensor UDT round-trips through parquet") {
    val data = Seq(
      (1L, SparseTensorValue(Array(7f, 9f), Array(0L, 5L), Array(2L, 3L))))
    val path = "/tmp/graft_io/udt_sparse"
    data.toDF("id", "st").write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path).as[(Long, SparseTensorValue)].collect()
    assert(back.toSeq == data)
  }

  test("File UDT round-trips through parquet incl. null bytes") {
    val data = Seq(
      (1L, FileRef("/data/a.png", Array[Byte](1, 2), "image/png")),
      (2L, FileRef("/data/b.mp3", null, "audio/mpeg")))
    val path = "/tmp/graft_io/udt_file"
    data.toDF("id", "f").write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path).as[(Long, FileRef)].collect().sortBy(_._1)
    assert(back.toSeq == data)
  }
}
