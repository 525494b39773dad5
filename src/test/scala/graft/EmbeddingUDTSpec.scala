package graft

import graft.types.Embedding
import org.scalatest.funsuite.AnyFunSuite

/** Embedding UDT: typed Dataset round-trip through parquet, and the storage
  * type degrades to plain array<float> for other readers (SURVEY §1.2). */
class EmbeddingUDTSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("Embedding UDT round-trips through parquet") {
    val data = Seq(
      (1L, Embedding(Array(1.0f, 2.0f, 3.0f))),
      (2L, Embedding(Array(-0.5f, 0.25f, 8.0f))))
    val df = data.toDF("id", "vec")
    val path = "/tmp/graft_io/udt_embedding"
    df.write.mode("overwrite").parquet(path)

    // typed read-back preserves values
    val back = spark.read.parquet(path).as[(Long, Embedding)].collect().sortBy(_._1)
    assert(back.toSeq == data)

    // schema degrades to the storage type for untyped readers
    val untyped = spark.read.schema("id LONG, vec ARRAY<FLOAT>").parquet(path)
    val row = untyped.orderBy("id").head()
    assert(row.getSeq[Float](1) == Seq(1.0f, 2.0f, 3.0f))
  }
}
