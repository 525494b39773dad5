package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Decoded image value: interleaved 8-bit pixel bytes (row-major,
  * channels innermost) + dimensions. Mirrors the reference Image dtype
  * (ref `src/daft-schema/src/dtype.rs:128`, `daft/functions/image.py:12-272`)
  * as a Spark struct via the case-class encoder.
  *
  * Supported modes: "L" (1 channel), "RGB" (3), "RGBA" (4).
  */
case class Img(data: Array[Byte], height: Int, width: Int, mode: String, channels: Int)

/** Real pixel operations on JDK-native codecs (`javax.imageio`: PNG, JPEG,
  * BMP, GIF, WBMP) — decode / resize / crop / convert / encode / to-tensor /
  * perceptual hash. No external jars; everything is pure-JVM and
  * codegen-adjacent (scalar UDFs over binary/struct columns, executed
  * per-partition with no shuffle).
  *
  * Ref behavior surface: `daft/functions/image.py` (decode_image, resize,
  * crop, encode_image, convert_image, image_to_tensor, image_width/height/
  * channel/mode, image_hash).
  */
object Images {

  private def modeOf(nc: Int): String = nc match {
    case 1 => "L"
    case 4 => "RGBA"
    case _ => "RGB"
  }

  /** Decode encoded image bytes → Img; None when bytes are not a
    * decodable image (matches reference on_error="null" posture). */
  def decode(bytes: Array[Byte]): Option[Img] = {
    if (bytes == null) return None
    val bi =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (bi == null) return None
    val nc = bi.getColorModel.getNumComponents match {
      case 1 => 1
      case 2 => 1 // gray+alpha: keep luma
      case 4 => 4
      case _ => 3
    }
    Some(fromBuffered(bi, nc, modeOf(nc)))
  }

  /** Extract interleaved pixel bytes from a BufferedImage. */
  private def fromBuffered(bi: BufferedImage, nc: Int, mode: String): Img = {
    val (h, w) = (bi.getHeight, bi.getWidth)
    val out = new Array[Byte]((h.toLong * w * nc).toInt)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = bi.getRGB(x, y) // sRGB-converted, alpha-preserving
        nc match {
          case 1 =>
            out(i) = ((argb >> 16) & 0xff).toByte // gray: r==g==b
            i += 1
          case 3 =>
            out(i) = ((argb >> 16) & 0xff).toByte
            out(i + 1) = ((argb >> 8) & 0xff).toByte
            out(i + 2) = (argb & 0xff).toByte
            i += 3
          case 4 =>
            out(i) = ((argb >> 16) & 0xff).toByte
            out(i + 1) = ((argb >> 8) & 0xff).toByte
            out(i + 2) = (argb & 0xff).toByte
            out(i + 3) = ((argb >>> 24) & 0xff).toByte
            i += 4
        }
        x += 1
      }
      y += 1
    }
    Img(out, h, w, mode, nc)
  }

  /** Img → BufferedImage (for resize/encode paths). */
  private[graft] def toBuffered(img: Img): BufferedImage = {
    val ty =
      if (img.channels == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB
    val bi = new BufferedImage(img.width, img.height, ty)
    var y = 0
    var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val argb = img.channels match {
          case 1 =>
            val v = img.data(i) & 0xff; i += 1
            0xff000000 | (v << 16) | (v << 8) | v
          case 3 =>
            val r = img.data(i) & 0xff; val g = img.data(i + 1) & 0xff
            val b = img.data(i + 2) & 0xff; i += 3
            0xff000000 | (r << 16) | (g << 8) | b
          case 4 =>
            val r = img.data(i) & 0xff; val g = img.data(i + 1) & 0xff
            val b = img.data(i + 2) & 0xff; val a = img.data(i + 3) & 0xff; i += 4
            (a << 24) | (r << 16) | (g << 8) | b
        }
        bi.setRGB(x, y, argb)
        x += 1
      }
      y += 1
    }
    bi
  }

  /** Real bilinear resize (ref image.py `resize(image, w, h)`). */
  def resize(img: Img, w: Int, h: Int): Img = {
    val src = toBuffered(img)
    val ty =
      if (img.channels == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB
    val dst = new BufferedImage(w, h, ty)
    val g = dst.createGraphics()
    g.setRenderingHint(
      RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    fromBuffered(dst, img.channels, img.mode)
  }

  /** Crop to (x, y, w, h) (ref image.py `crop(image, bbox)`). */
  def crop(img: Img, x: Int, y: Int, w: Int, h: Int): Img = {
    val cw = math.min(w, img.width - x)
    val ch = math.min(h, img.height - y)
    val out = new Array[Byte](cw * ch * img.channels)
    var row = 0
    while (row < ch) {
      val srcOff = ((y + row) * img.width + x) * img.channels
      System.arraycopy(img.data, srcOff, out, row * cw * img.channels, cw * img.channels)
      row += 1
    }
    Img(out, ch, cw, img.mode, img.channels)
  }

  /** Mode conversion (ref image.py `convert_image`): RGB/RGBA → L uses the
    * ITU-R 601 luma transform (truncating, pillow-compatible:
    * L = (R*299 + G*587 + B*114) / 1000); L → RGB replicates. */
  def convertMode(img: Img, target: String): Img = {
    if (img.mode == target) return img
    val n = img.height * img.width
    target match {
      case "L" =>
        val out = new Array[Byte](n)
        var p = 0
        while (p < n) {
          val o = p * img.channels
          val r = img.data(o) & 0xff
          val g = if (img.channels >= 3) img.data(o + 1) & 0xff else r
          val b = if (img.channels >= 3) img.data(o + 2) & 0xff else r
          out(p) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          p += 1
        }
        Img(out, img.height, img.width, "L", 1)
      case "RGB" =>
        val out = new Array[Byte](n * 3)
        var p = 0
        while (p < n) {
          val v = img.data(p * img.channels) // from L (or drop alpha: take rgb)
          if (img.channels == 1) {
            out(p * 3) = v; out(p * 3 + 1) = v; out(p * 3 + 2) = v
          } else { // RGBA → RGB
            out(p * 3) = img.data(p * 4)
            out(p * 3 + 1) = img.data(p * 4 + 1)
            out(p * 3 + 2) = img.data(p * 4 + 2)
          }
          p += 1
        }
        Img(out, img.height, img.width, "RGB", 3)
      case "RGBA" =>
        val out = new Array[Byte](n * 4)
        var p = 0
        while (p < n) {
          if (img.channels == 1) {
            val v = img.data(p)
            out(p * 4) = v; out(p * 4 + 1) = v; out(p * 4 + 2) = v
          } else {
            out(p * 4) = img.data(p * 3)
            out(p * 4 + 1) = img.data(p * 3 + 1)
            out(p * 4 + 2) = img.data(p * 3 + 2)
          }
          out(p * 4 + 3) = 0xff.toByte
          p += 1
        }
        Img(out, img.height, img.width, "RGBA", 4)
      case other => throw new IllegalArgumentException(s"unsupported mode: $other")
    }
  }

  private def encodeBuffered(bi: BufferedImage, format: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    // JPEG can't encode alpha from TYPE_INT_ARGB: flatten first
    val toWrite =
      if (format.equalsIgnoreCase("jpeg") || format.equalsIgnoreCase("jpg")) {
        val flat = new BufferedImage(bi.getWidth, bi.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = flat.createGraphics(); g.drawImage(bi, 0, 0, null); g.dispose(); flat
      } else bi
    if (!ImageIO.write(toWrite, format, baos))
      throw new IllegalArgumentException(s"no encoder for format: $format")
    baos.toByteArray
  }

  /** Re-encode to PNG/JPEG/BMP/GIF bytes (ref image.py `encode_image`). */
  def encode(img: Img, format: String): Array[Byte] =
    encodeBuffered(toBuffered(img), format)

  /** Pixels → normalized float tensor in [0,1], shape [h, w, c]
    * (ref image.py `image_to_tensor`). */
  def toTensor(img: Img): Tensor =
    Tensor(img.data.map(b => (b & 0xff) / 255.0f),
      Array(img.height.toLong, img.width.toLong, img.channels.toLong))

  /** Average perceptual hash (ref image.py `image_hash(algorithm="average")`):
    * gray 8×8 resize, threshold each pixel against the mean → 64-bit. */
  def averageHash(img: Img): Long = {
    val small = convertMode(resize(img, 8, 8), "L")
    val vals = small.data.map(_ & 0xff)
    val mean = vals.sum.toDouble / vals.length
    vals.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc
    }
  }

  /** Deterministic solid-color PNG generator (test/data-synthesis helper —
    * real codec output, arithmetic-predictable pixels). */
  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = 0xff000000 | ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { bi.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodeBuffered(bi, "png")
  }

  /** Sum of unsigned pixel bytes — the arithmetic-checkable fingerprint
    * used by the value oracles. */
  def pixelSum(data: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < data.length) { s += data(i) & 0xff; i += 1 }
    s
  }

  // ---- Column-level UDF surface ----

  val decodeUdf = udf((b: Array[Byte]) => decode(b))
  val pixelSumUdf = udf((i: Img) => if (i == null) None else Some(pixelSum(i.data)))
  val avgHashUdf = udf((i: Img) => if (i == null) None else Some(averageHash(i)))
  def resizeUdf(w: Int, h: Int) = udf((i: Img) => Option(i).map(resize(_, w, h)))
  def cropUdf = udf((i: Img, x: Int, y: Int, w: Int, h: Int) =>
    Option(i).map(crop(_, x, y, w, h)))
  def convertUdf(mode: String) = udf((i: Img) => Option(i).map(convertMode(_, mode)))
  def encodeUdf(format: String) = udf((i: Img) => Option(i).map(encode(_, format)))
  val toTensorUdf = udf((i: Img) => Option(i).map(toTensor))
  val solidPngUdf = udf((w: Int, h: Int, r: Int, g: Int, b: Int) => solidPng(w, h, r, g, b))

  def width(image: Column): Column = image.getField("width")
  def height(image: Column): Column = image.getField("height")
  def channel(image: Column): Column = image.getField("channels")
  def mode(image: Column): Column = image.getField("mode")
}

/** Tensor value (float data + shape), mirroring ref `dtype.rs` Tensor. */
case class Tensor(data: Array[Float], shape: Array[Long])
