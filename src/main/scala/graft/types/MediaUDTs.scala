package graft.types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Media logical types from the reference's dtype surface
  * (`src/daft-schema/src/dtype.rs:128-149` — Image, Tensor, SparseTensor,
  * File) as Spark UDTs, following the [[EmbeddingUDT]] pattern: each is a
  * logical type over a plain struct storage type, so parquet written by
  * graft degrades gracefully to ordinary structs for other readers —
  * mirroring the reference's arrow-extension-type behavior. */

/** Variable-shape image (ref `Image(Option<ImageMode>)`): interleaved
  * 8-bit pixels + dims + mode. */
@SQLUserDefinedType(udt = classOf[ImageUDT])
case class ImageValue(data: Array[Byte], height: Int, width: Int, mode: String, channels: Int) {
  override def equals(o: Any): Boolean = o match {
    case ImageValue(d, h, w, m, c) =>
      h == height && w == width && m == mode && c == channels &&
        java.util.Arrays.equals(data, d)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(data) * 31 + height * 7 + width
}

class ImageUDT extends UserDefinedType[ImageValue] {
  override def sqlType: DataType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("height", IntegerType),
    StructField("width", IntegerType),
    StructField("mode", StringType),
    StructField("channels", IntegerType)))

  override def serialize(v: ImageValue): InternalRow = {
    val r = new GenericInternalRow(5)
    r.update(0, v.data)
    r.setInt(1, v.height)
    r.setInt(2, v.width)
    r.update(3, UTF8String.fromString(v.mode))
    r.setInt(4, v.channels)
    r
  }

  override def deserialize(datum: Any): ImageValue = datum match {
    case r: InternalRow => ImageValue(
      r.getBinary(0), r.getInt(1), r.getInt(2), r.getUTF8String(3).toString, r.getInt(4))
  }

  override def userClass: Class[ImageValue] = classOf[ImageValue]
  override def typeName: String = "image"
}

/** Variable-shape dense tensor (ref `Tensor(Box<DataType>)`): flat float
  * data + shape. */
@SQLUserDefinedType(udt = classOf[TensorUDT])
case class TensorValue(data: Array[Float], shape: Array[Long]) {
  def numElements: Long = shape.product
  override def equals(o: Any): Boolean = o match {
    case TensorValue(d, s) =>
      java.util.Arrays.equals(shape, s) && java.util.Arrays.equals(data, d)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(data) * 31 + java.util.Arrays.hashCode(shape)
}

class TensorUDT extends UserDefinedType[TensorValue] {
  override def sqlType: DataType = StructType(Seq(
    StructField("data", ArrayType(FloatType, containsNull = false)),
    StructField("shape", ArrayType(LongType, containsNull = false))))

  override def serialize(v: TensorValue): InternalRow = {
    val r = new GenericInternalRow(2)
    r.update(0, new GenericArrayData(v.data.map(_.asInstanceOf[Any])))
    r.update(1, new GenericArrayData(v.shape.map(_.asInstanceOf[Any])))
    r
  }

  override def deserialize(datum: Any): TensorValue = datum match {
    case r: InternalRow => TensorValue(
      r.getArray(0).toFloatArray(), r.getArray(1).toLongArray())
  }

  override def userClass: Class[TensorValue] = classOf[TensorValue]
  override def typeName: String = "tensor"
}

/** Sparse tensor in COO layout (ref `SparseTensor(Box<DataType>, bool)`):
  * non-zero values + their flat indices + dense shape. */
@SQLUserDefinedType(udt = classOf[SparseTensorUDT])
case class SparseTensorValue(values: Array[Float], indices: Array[Long], shape: Array[Long]) {
  override def equals(o: Any): Boolean = o match {
    case SparseTensorValue(v, i, s) =>
      java.util.Arrays.equals(values, v) && java.util.Arrays.equals(indices, i) &&
        java.util.Arrays.equals(shape, s)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(indices)
}

class SparseTensorUDT extends UserDefinedType[SparseTensorValue] {
  override def sqlType: DataType = StructType(Seq(
    StructField("values", ArrayType(FloatType, containsNull = false)),
    StructField("indices", ArrayType(LongType, containsNull = false)),
    StructField("shape", ArrayType(LongType, containsNull = false))))

  override def serialize(v: SparseTensorValue): InternalRow = {
    val r = new GenericInternalRow(3)
    r.update(0, new GenericArrayData(v.values.map(_.asInstanceOf[Any])))
    r.update(1, new GenericArrayData(v.indices.map(_.asInstanceOf[Any])))
    r.update(2, new GenericArrayData(v.shape.map(_.asInstanceOf[Any])))
    r
  }

  override def deserialize(datum: Any): SparseTensorValue = datum match {
    case r: InternalRow => SparseTensorValue(
      r.getArray(0).toFloatArray(), r.getArray(1).toLongArray(), r.getArray(2).toLongArray())
  }

  override def userClass: Class[SparseTensorValue] = classOf[SparseTensorValue]
  override def typeName: String = "sparse_tensor"
}

/** File reference (ref `File(MediaType)`): resolved path, optional
  * materialized bytes, media type tag. */
@SQLUserDefinedType(udt = classOf[FileUDT])
case class FileRef(path: String, bytes: Array[Byte], mediaType: String) {
  override def equals(o: Any): Boolean = o match {
    case FileRef(p, b, m) =>
      p == path && m == mediaType &&
        ((b == null && bytes == null) || (b != null && bytes != null && java.util.Arrays.equals(bytes, b)))
    case _ => false
  }
  override def hashCode(): Int = if (path == null) 0 else path.hashCode
}

class FileUDT extends UserDefinedType[FileRef] {
  override def sqlType: DataType = StructType(Seq(
    StructField("path", StringType),
    StructField("bytes", BinaryType),
    StructField("media_type", StringType)))

  override def serialize(v: FileRef): InternalRow = {
    val r = new GenericInternalRow(3)
    r.update(0, if (v.path == null) null else UTF8String.fromString(v.path))
    r.update(1, v.bytes)
    r.update(2, if (v.mediaType == null) null else UTF8String.fromString(v.mediaType))
    r
  }

  override def deserialize(datum: Any): FileRef = datum match {
    case r: InternalRow => FileRef(
      if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getBinary(1),
      if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
  }

  override def userClass: Class[FileRef] = classOf[FileRef]
  override def typeName: String = "file"
}
