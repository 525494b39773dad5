package graft.types

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-size embedding vector — the reference's `Embedding(T, size)` dtype
  * (`src/daft-schema/src/dtype.rs:125`) as a Spark UDT over
  * `array<float>` (SURVEY §1.2 mapping; same pattern as Spark ML's
  * VectorUDT). Parquet round-trips through the underlying array type, so
  * files written by graft are readable by any engine as plain
  * `list<float>` — matching the reference's arrow-extension-type behavior
  * of degrading gracefully to the storage type. */
@SQLUserDefinedType(udt = classOf[EmbeddingUDT])
case class Embedding(values: Array[Float]) {
  def dim: Int = values.length
  override def equals(o: Any): Boolean = o match {
    case Embedding(v) => java.util.Arrays.equals(values, v)
    case _            => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(values)
}

class EmbeddingUDT extends UserDefinedType[Embedding] {
  override def sqlType: DataType = ArrayType(FloatType, containsNull = false)

  override def serialize(e: Embedding): ArrayData =
    new GenericArrayData(e.values.map(_.asInstanceOf[Any]))

  override def deserialize(datum: Any): Embedding = datum match {
    case a: ArrayData => Embedding(a.toFloatArray())
  }

  override def userClass: Class[Embedding] = classOf[Embedding]
  override def typeName: String = "embedding"
}
