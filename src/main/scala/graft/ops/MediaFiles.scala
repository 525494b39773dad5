package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed media-file functions (ref `daft/functions/{audio,video,image_file_}.py`
  * + the mime gates in `src/daft-file/src/functions.rs:107-207`):
  * header-only metadata extraction, typed-file validation, keyframe /
  * frame-by-index access.
  *
  * The reference wraps PyAV/soundfile/Pillow; offline the JVM-feasible
  * subset is WAV (audio), MJPEG-AVI (video) and PNG/JPEG/GIF (image) — the
  * same codecs `ops/{Audio,Video,Images}` already read and write, so every
  * function here is conformance-testable against fixtures this library
  * produces itself.
  *
  * Scale posture: every metadata function parses HEADERS ONLY (a WAV/AVI/
  * PNG header is < 1 KiB regardless of payload size) — on a 100 TB corpus
  * of media blobs the metadata pass never decodes samples, frames or
  * pixels. All functions are scalar UDFs over binary columns (the
  * multimodal lane — no shuffle, executed per-partition). */
object MediaFiles {

  // ---- header-only parsers -------------------------------------------

  /** AudioMetadata (ref audio.py:23-38 struct): sample_rate, channels,
    * frames, format, subtype — from the RIFF/WAVE `fmt `+`data` chunk
    * headers only. */
  case class AudioMeta(sample_rate: Long, channels: Long, frames: Double,
      format: String, subtype: String)

  def wavMetadata(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 44) return None
    def cc(off: Int) = new String(b, off, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    // walk offsets as Long: a corrupt size field near 2^32 must terminate
    // the loop (run off the end), never truncate to a non-advancing int
    var off = 12L
    var fmtTag = -1; var channels = -1; var rate = -1L
    var blockAlign = -1; var bits = -1; var dataSize = -1L
    while (off + 8 <= b.length && (fmtTag < 0 || dataSize < 0)) {
      val o = off.toInt
      val id = cc(o)
      val size = buf.getInt(o + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 24 <= b.length) {
        fmtTag = buf.getShort(o + 8) & 0xffff
        channels = buf.getShort(o + 10) & 0xffff
        rate = buf.getInt(o + 12).toLong & 0xffffffffL
        blockAlign = buf.getShort(o + 20) & 0xffff
        bits = buf.getShort(o + 22) & 0xffff
      } else if (id == "data") {
        dataSize = size
      }
      off += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (fmtTag < 0 || dataSize < 0 || blockAlign <= 0) None
    else Some(AudioMeta(rate, channels.toLong,
      (dataSize / blockAlign).toDouble, "WAV",
      if (fmtTag == 1) s"PCM_$bits" else s"TAG_$fmtTag"))
  }

  /** VideoMetadata (ref video.py:23-33 struct): width, height, fps,
    * frame_count, time_base — from the AVI `avih` MainAVIHeader only. */
  case class VideoMeta(width: Long, height: Long, fps: Double,
      frame_count: Long, time_base: Double)

  def aviMetadata(b: Array[Byte]): Option[VideoMeta] = {
    if (b == null || b.length < 12) return None
    def cc(off: Int) = new String(b, off, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    // proper RIFF chunk walk (chunks are 2-byte aligned, so a fixed-stride
    // scan can step over avih): descend into LISTs, skip other chunks
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = cc(o)
      val size = buf.getInt(o + 4).toLong & 0xffffffffL
      if (id == "avih" && off + 8 + 40 <= b.length) {
        val p = o + 8
        val usPerFrame = (buf.getInt(p).toLong & 0xffffffffL).toDouble
        val totalFrames = buf.getInt(p + 16).toLong & 0xffffffffL
        val width = buf.getInt(p + 32).toLong & 0xffffffffL
        val height = buf.getInt(p + 36).toLong & 0xffffffffL
        val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
        return Some(VideoMeta(width, height, fps, totalFrames,
          usPerFrame / 1e6))
      }
      if (id == "LIST") off += 12 // descend past the list type fourCC
      else off += 8L + size + (size & 1L) // word-aligned skip
    }
    None
  }

  /** ImageMetadata (ref typing.py:37-41): width, height, format, mode —
    * from the PNG IHDR / JPEG SOF / GIF logical-screen headers only (no
    * pixel decode). */
  case class ImageMeta(width: Long, height: Long, format: String, mode: String)

  def imageMetadata(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null || b.length < 10) return None
    def u8(i: Int) = b(i) & 0xff
    // PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    if (u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' && b.length >= 26) {
      val be = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
      val mode = u8(25) match {
        case 0 => "L"; case 2 => "RGB"; case 3 => "P"
        case 4 => "LA"; case 6 => "RGBA"; case _ => "UNKNOWN"
      }
      return Some(ImageMeta(be.getInt(16).toLong, be.getInt(20).toLong, "PNG", mode))
    }
    // GIF: "GIF8", logical screen width/height little-endian at 6/8
    if (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8') {
      val le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      return Some(ImageMeta((le.getShort(6) & 0xffff).toLong,
        (le.getShort(8) & 0xffff).toLong, "GIF", "P"))
    }
    // JPEG: walk segments to the first SOFn frame header. 0xFF fill bytes
    // between segments and standalone markers (TEM/RSTn) carry no length
    // field — spec-legal output from common encoders — so they advance by
    // one/two bytes, never through a bogus length read.
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var off = 2
      while (off + 9 < b.length && u8(off) == 0xff) {
        val marker = u8(off + 1)
        if (marker == 0xff) { off += 1 } // fill byte
        else if (marker == 0x01 || marker == 0xd8 ||
          (marker >= 0xd0 && marker <= 0xd9)) { off += 2 } // standalone
        else {
          val len = ((u8(off + 2) << 8) | u8(off + 3))
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            val h = (u8(off + 5) << 8) | u8(off + 6)
            val w = (u8(off + 7) << 8) | u8(off + 8)
            val mode = u8(off + 9) match {
              case 1 => "L"; case 3 => "RGB"; case 4 => "CMYK"; case _ => "UNKNOWN"
            }
            return Some(ImageMeta(w.toLong, h.toLong, "JPEG", mode))
          }
          if (len < 2) return None // corrupt length: stop, don't loop
          off += 2 + len
        }
      }
    }
    None
  }

  // ---- column functions ------------------------------------------------

  val audioMetadataUdf = udf((b: Array[Byte]) => wavMetadata(b))
  val videoMetadataUdf = udf((b: Array[Byte]) => aviMetadata(b))
  val imageMetadataUdf = udf((b: Array[Byte]) => imageMetadata(b))

  def audioMetadata(bytes: Column): Column = audioMetadataUdf(bytes)
  def videoMetadata(bytes: Column): Column = videoMetadataUdf(bytes)
  def imageFileMetadata(bytes: Column): Column = imageMetadataUdf(bytes)

  /** Typed-file gates (ref functions.rs:107-207): pass the bytes through
    * when the sniffed MIME has the expected major type, error otherwise —
    * the same ValueError contract as the reference. Null bytes stay null
    * (nothing to validate). */
  private def typedFile(kind: String) = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val m = sniff(b)
      if (m.exists(_.startsWith(kind + "/"))) b
      else throw new IllegalArgumentException(
        s"Expected $kind file, got mime type ${m.getOrElse("unknown")}")
    }
  }

  /** JVM-side sniffer for the typed-file gates, expanded from the SAME
    * signature table as the codegen'd column function
    * ([[graft.functions.Binary.MimeSignatures]]) — one source of truth,
    * both surfaces move together. AVI is appended for the video gate (the
    * reference's PyAV accepts it even though the content sniffer predates
    * the mapping). */
  private[graft] def sniff(b: Array[Byte]): Option[String] = {
    if (b == null || b.length == 0) return None
    def matchAt(off: Int, hx: String): Boolean = {
      val n = hx.length / 2
      off + n <= b.length && (0 until n).forall { i =>
        (b(off + i) & 0xff) == Integer.parseInt(hx.substring(i * 2, i * 2 + 2), 16)
      }
    }
    graft.functions.Binary.MimeSignatures.collectFirst {
      case (mime, checks) if checks.forall { case (off, hx) => matchAt(off, hx) } =>
        mime
    }.orElse {
      if (matchAt(0, "52494646") && matchAt(8, "41564920")) // RIFF..AVI
        Some("video/x-msvideo")
      else None
    }
  }

  def audioFile(bytes: Column): Column = typedFile("audio")(bytes)
  def videoFile(bytes: Column): Column = typedFile("video")(bytes)
  def imageFile(bytes: Column): Column = typedFile("image")(bytes)

  /** video_keyframes (ref video.py:58-93): MJPEG is intra-only, so every
    * frame is a keyframe — returns the full frame list. Bounded by the
    * clip, not the corpus (per-row work only). */
  val videoKeyframesUdf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else Video.parseFrames(new java.io.ByteArrayInputStream(b), 1)
      .map(_._2).toArray
  }
  def videoKeyframes(bytes: Column): Column = videoKeyframesUdf(bytes)

  /** get_video_frame_by_idx (ref video.py:199-233): one frame's JPEG
    * bytes, or null past the end. */
  val videoFrameByIdxUdf = udf { (b: Array[Byte], idx: Int) =>
    if (b == null) null
    else Video.parseFrames(new java.io.ByteArrayInputStream(b), 1)
      .collectFirst { case (i, f) if i == idx => f }.orNull
  }
  def getVideoFrameByIdx(bytes: Column, idx: Int): Column =
    videoFrameByIdxUdf(bytes, lit(idx))

  /** image_attribute (ref image.py:113-127) over the decoded Image
    * struct: 'width' | 'height' | 'channel' | 'mode'. */
  def imageAttribute(image: Column, name: String): Column = name match {
    case "width"   => image.getField("width")
    case "height"  => image.getField("height")
    case "channel" => image.getField("channels")
    case "mode"    => image.getField("mode")
    case other => throw new IllegalArgumentException(
      s"image_attribute: unknown property '$other' (width|height|channel|mode)")
  }
}
