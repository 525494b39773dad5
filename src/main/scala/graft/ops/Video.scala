package graft.ops

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Video frame extraction — the reference's `read_video_frames`
  * (`daft/io/_video.py`) made real for the one codec the JVM can decode
  * offline: MJPEG-in-AVI, where every frame is a complete JPEG inside a
  * RIFF `00dc` chunk (public formats: Microsoft RIFF/AVI container spec +
  * ISO JPEG), decoded by the same javax.imageio path as [[Images]]. WAV
  * made audio real the same way.
  *
  * Scale shape (same as the WARC/MCAP sources): Spark plans the file
  * LISTING (binaryFile + glob, partitioned by file — one task per video),
  * and each task STREAMS its file chunk-by-chunk, emitting one row per
  * sampled frame. Memory is bounded by one frame; the full video is never
  * materialized. Frame-index sampling (`everyNth`) skips the JPEG payload
  * of unsampled frames without decoding them.
  */
object Video {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("frame_idx", IntegerType),
    StructField("frame_data", BinaryType))) // complete JPEG bytes

  /** Read AVI file(s) (glob supported): one row per sampled video frame. */
  def readFrames(
      spark: SparkSession,
      path: String,
      everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1, s"everyNth=$everyNth")
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"))
    val enc = Encoders.row(schema)
    files.flatMap { fileRow =>
      val p = fileRow.getString(0)
      val local = if (p.startsWith("file:")) Paths.get(new java.net.URI(p)) else Paths.get(p)
      val in = new BufferedInputStream(Files.newInputStream(local), 1 << 16)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
      parseFrames(in, everyNth).map { case (idx, bytes) => Row(p, idx, bytes) }
    }(enc)
  }

  /** Stream video-stream chunks (`00dc`/`00db`) out of a RIFF-AVI byte
    * stream as (frameIndex, frameBytes); unsampled frames are skipped
    * without buffering. */
  private[graft] def parseFrames(raw: InputStream, everyNth: Int): Iterator[(Int, Array[Byte])] = {
    val din = new DataInputStream(raw)

    def fourCC(): String = {
      val b = new Array[Byte](4)
      din.readFully(b)
      new String(b, StandardCharsets.US_ASCII)
    }
    def u32(): Long = {
      val b = new Array[Byte](4)
      din.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
    }
    def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = din.skip(left)
        if (s <= 0) throw new java.io.IOException("truncated AVI chunk")
        left -= s
      }
    }

    val riff = fourCC()
    if (riff != "RIFF") throw new java.io.IOException(s"not a RIFF file (got '$riff')")
    u32() // riff size
    val avi = fourCC()
    if (avi != "AVI ") throw new java.io.IOException(s"not an AVI file (got '$avi')")

    new Iterator[(Int, Array[Byte])] {
      private var frameCounter = -1
      private var nextFrame: (Int, Array[Byte]) = fetch()

      // walk the chunk sequence; LIST headers are descended into (their
      // payload is itself a chunk sequence), everything else is skipped
      private def fetch(): (Int, Array[Byte]) = {
        while (true) {
          val cc =
            try fourCC()
            catch { case _: EOFException => return null }
          val size = u32()
          if (cc == "LIST" || cc == "RIFF") {
            fourCC() // list type (hdrl/movi/strl/...): descend
          } else if (cc.length == 4 && cc.startsWith("00") &&
              (cc.endsWith("dc") || cc.endsWith("db"))) {
            // stream-0 video frame chunk
            frameCounter += 1
            if (frameCounter % everyNth == 0) {
              val bytes = new Array[Byte](size.toInt)
              din.readFully(bytes)
              if ((size & 1) == 1) skipFully(1) // word alignment pad
              return (frameCounter, bytes)
            } else {
              skipFully(size + (size & 1))
            }
          } else {
            skipFully(size + (size & 1))
          }
        }
        null // unreachable
      }

      def hasNext: Boolean = nextFrame != null
      def next(): (Int, Array[Byte]) = {
        val r = nextFrame
        nextFrame = fetch()
        r
      }
    }
  }

  // ---- writer (fixture generator / sink) -----------------------------------

  /** Write a minimal valid MJPEG AVI: RIFF(hdrl(avih, strl(strh MJPG,
    * strf BITMAPINFOHEADER)), movi(00dc per JPEG frame)). Frames must be
    * complete JPEG images of the stated dimensions. */
  def writeMjpegAvi(
      frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int,
      out: OutputStream): Unit = {
    def le32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    def cc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(body.length + 4L) ++ cc(listType) ++ body

    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max

    val avih = { // MainAVIHeader: 56 bytes
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / math.max(fps, 1)) // dwMicroSecPerFrame
      b.putInt(maxFrame * fps) // dwMaxBytesPerSec
      b.putInt(0) // dwPaddingGranularity
      b.putInt(0x10) // dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10 = AVIF_ISINTERLEAVED
      b.putInt(frames.length) // dwTotalFrames
      b.putInt(0) // dwInitialFrames
      b.putInt(1) // dwStreams
      b.putInt(maxFrame) // dwSuggestedBufferSize
      b.putInt(width)
      b.putInt(height)
      b.array()
    }
    val strh = { // AVIStreamHeader: 56 bytes
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(cc("vids"))
      b.put(cc("MJPG"))
      b.putInt(0) // dwFlags
      b.putShort(0); b.putShort(0) // wPriority, wLanguage
      b.putInt(0) // dwInitialFrames
      b.putInt(1) // dwScale
      b.putInt(math.max(fps, 1)) // dwRate → fps = rate/scale
      b.putInt(0) // dwStart
      b.putInt(frames.length) // dwLength
      b.putInt(maxFrame) // dwSuggestedBufferSize
      b.putInt(-1) // dwQuality
      b.putInt(0) // dwSampleSize
      b.putShort(0); b.putShort(0)
      b.putShort(width.toShort); b.putShort(height.toShort) // rcFrame
      b.array()
    }
    val strf = { // BITMAPINFOHEADER: 40 bytes
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40) // biSize
      b.putInt(width)
      b.putInt(height)
      b.putShort(1) // biPlanes
      b.putShort(24) // biBitCount
      b.put(cc("MJPG")) // biCompression
      b.putInt(width * height * 3) // biSizeImage
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    out.write(cc("RIFF"))
    out.write(le32(body.length.toLong))
    out.write(body)
  }
}
