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
    var off = 12
    var fmtTag = -1; var channels = -1; var rate = -1L
    var blockAlign = -1; var bits = -1; var dataSize = -1L
    while (off + 8 <= b.length && (fmtTag < 0 || dataSize < 0)) {
      val id = cc(off)
      val size = buf.getInt(off + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 24 <= b.length) {
        fmtTag = buf.getShort(off + 8) & 0xffff
        channels = buf.getShort(off + 10) & 0xffff
        rate = buf.getInt(off + 12).toLong & 0xffffffffL
        blockAlign = buf.getShort(off + 20) & 0xffff
        bits = buf.getShort(off + 22) & 0xffff
      } else if (id == "data") {
        dataSize = size
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
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
    // the avih chunk sits in the first LIST(hdrl); scan the header region
    val limit = math.min(b.length - 64, 4096)
    var off = 12
    while (off < limit) {
      if (cc(off) == "avih") {
        val p = off + 8
        val usPerFrame = (buf.getInt(p).toLong & 0xffffffffL).toDouble
        val totalFrames = buf.getInt(p + 16).toLong & 0xffffffffL
        val width = buf.getInt(p + 32).toLong & 0xffffffffL
        val height = buf.getInt(p + 36).toLong & 0xffffffffL
        val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
        return Some(VideoMeta(width, height, fps, totalFrames,
          usPerFrame / 1e6))
      }
      off += 4
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
    // JPEG: walk segments to the first SOFn frame header
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var off = 2
      while (off + 9 < b.length && u8(off) == 0xff) {
        val marker = u8(off + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) { off += 2 }
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

  /** JVM-side twin of [[graft.functions.Binary.guessMimeType]] (same
    * decision chain, same strings) for the typed-file gates. */
  private[graft] def sniff(b: Array[Byte]): Option[String] = {
    if (b == null || b.length == 0) return None
    def u8(i: Int) = if (i < b.length) b(i) & 0xff else -1
    def at(off: Int, s: String): Boolean =
      off + s.length <= b.length && s.indices.forall(i => u8(off + i) == s.charAt(i))
    val hdf5 = Array(0x89, 'H'.toInt, 'D'.toInt, 'F'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    def hdf5At(off: Int): Boolean =
      off + 8 <= b.length && hdf5.indices.forall(i => u8(off + i) == hdf5(i))
    if (u8(0) == 0x89 && at(1, "PNG") && u8(4) == 0x0d && u8(5) == 0x0a &&
      u8(6) == 0x1a && u8(7) == 0x0a) Some("image/png")
    else if (u8(0) == 0xff && u8(1) == 0xd8) Some("image/jpeg")
    else if (at(0, "GIF8")) Some("image/gif")
    else if (at(0, "RIFF") && at(8, "WEBP")) Some("image/webp")
    else if (at(0, "%PDF")) Some("application/pdf")
    else if (u8(0) == 'P' && u8(1) == 'K' && u8(2) == 3 && u8(3) == 4) Some("application/zip")
    else if (at(0, "ID3") || (u8(0) == 0xff && u8(1) == 0xfb)) Some("audio/mpeg")
    else if (at(0, "RIFF") && at(8, "WAVE")) Some("audio/wav")
    else if (at(0, "OggS")) Some("audio/ogg")
    else if (at(4, "ftyp")) Some("video/mp4")
    else if (u8(0) == 0 && u8(1) == 0 && u8(2) == 1 && u8(3) == 0xba) Some("video/mpeg")
    else if (at(0, "<!DOCTYPE") || at(0, "<html") || at(0, "<HTML")) Some("text/html")
    else if (hdf5At(0) || hdf5At(512) || hdf5At(1024) || hdf5At(2048) || hdf5At(4096))
      Some("application/vnd.hdfgroup.hdf5")
    // AVI is sniffed for the video gate (the reference's PyAV accepts it
    // even though the content sniffer predates the mapping)
    else if (at(0, "RIFF") && at(8, "AVI ")) Some("video/x-msvideo")
    else None
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
