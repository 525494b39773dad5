package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §1.2 Image/Tensor/File types,
  * §2.6 image/url namespaces; builder brief): media as opaque binary
  * columns with typed struct metadata. The Spark-side plumbing — schemas,
  * batch shape, partition-parallel decode via mapPartitions with lazily
  * initialized per-partition decoder state (the actor-UDF execution
  * pattern, ref `distributed_actor_pool_project.rs`) — is real and tested;
  * the pixel decode itself is a clearly-marked deterministic STUB because
  * no imaging libraries ship in this environment.
  */
object Multimodal {

  /** Image column type: Daft `Image(mode)` ≈ struct, mirroring Spark ML's
    * ImageSchema layout. */
  val imageSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("height", IntegerType),
    StructField("width", IntegerType),
    StructField("mode", StringType),
    StructField("channels", IntegerType)))

  /** File column type: Daft `File(MediaType)` ≈ struct(path, bytes, media_type). */
  val fileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("bytes", BinaryType),
    StructField("media_type", StringType)))

  /** Tensor column type: struct(data, shape) ≈ Spark ML Matrix/Vector UDT
    * pattern. */
  val tensorSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(FloatType)),
    StructField("shape", ArrayType(LongType))))

  /** Fallback dims for non-image binary payloads (kept so the generic
    * binary-payload pipeline remains decodable end-to-end: real codecs
    * return None for non-image bytes, and the pipeline query's contract
    * is one metadata struct per payload). Derives dimensions from the
    * byte length, deterministically. */
  private[graft] def payloadDims(nBytes: Int): (Int, Int) =
    (64 + (nBytes % 512), 64 + ((nBytes * 7) % 512)) // (height, width)

  /** Per-partition decoder with lazily initialized heavyweight state —
    * the actor-UDF execution shape: state is built once per partition
    * (≈ once per executor core), not per row. Real codec path: PNG/JPEG/
    * BMP/GIF bytes decode to real pixels via [[Images.decode]]; other
    * payloads fall back to metadata-only dims so mixed binary columns
    * keep flowing. */
  def decodeImages(df: DataFrame, bytesCol: String, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, imageSchema))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      // lazy per-partition decoder handle — constructed once per task,
      // not per row (ImageIO readers are not thread-safe to share)
      lazy val decoder = new Object {
        // magic-byte sniff first: attempting ImageIO on every non-image
        // payload would pay stream-setup + reader-probe cost per row
        private def looksLikeImage(b: Array[Byte]): Boolean =
          Files.guessMime(b).exists(_.startsWith("image/"))
        def decode(b: Array[Byte]): Row = {
          if (b == null) null
          else (if (looksLikeImage(b)) Images.decode(b) else None) match {
            case Some(img) => Row(img.data, img.height, img.width, img.mode, img.channels)
            case None =>
              val (h, w) = payloadDims(b.length)
              Row(b, h, w, "RGB", 3)
          }
        }
      }
      rows.map { r =>
        val b = r.get(idx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decoder.decode(b))
      }
    }(enc)
  }

  /** Metadata-level resize (stub: real impl rescales pixels; the schema
    * contract — new dims, same mode/channels — is what downstream code
    * consumes). */
  def resize(image: Column, h: Int, w: Int): Column =
    when(image.isNotNull, struct(
      image.getField("data").as("data"),
      lit(h).as("height"),
      lit(w).as("width"),
      image.getField("mode").as("mode"),
      image.getField("channels").as("channels")))

  /** Image content hash (perceptual-hash slot; here a content hash). */
  def imageHash(image: Column): Column = xxhash64(image.getField("data"))

  /** image → tensor: shape [h, w, c] with stub pixel data. */
  def toTensor(image: Column): Column =
    when(image.isNotNull, struct(
      array().cast(ArrayType(FloatType)).as("data"), // stub: no pixel decode
      array(
        image.getField("height").cast("long"),
        image.getField("width").cast("long"),
        image.getField("channels").cast("long")).as("shape")))

  /** Frame-sampling plumbing for video-like payloads: one row per sampled
    * frame index (ref read_video_frames) — pure Spark explode, no codec. */
  def sampleFrames(df: DataFrame, bytesCol: String, everyNth: Int, totalFramesExpr: Column): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(totalFramesExpr - 1, lit(0)), lit(everyNth))))
}
