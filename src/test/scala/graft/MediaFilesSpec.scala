package graft

import java.io.ByteArrayOutputStream

import graft.ops.{Audio, Images, MediaFiles, Video}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed media-file functions (ref daft/functions/{audio,video,image_file_}.py):
  * header-only metadata, typed gates, keyframes — against fixtures produced
  * by this library's own writers (WAV / MJPEG-AVI / PNG codecs). */
class MediaFilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def wav(n: Int, rate: Float): Array[Byte] =
    Audio.encodeWav(Array.tabulate(n)(i => math.sin(i * 0.1).toFloat), rate)

  private def avi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    Video.writeMjpegAvi(frames, w, h, fps, bos)
    bos.toByteArray
  }
  private def jpeg(w: Int, h: Int): Array[Byte] =
    Images.encode(Images.decode(Images.solidPng(w, h, 40, 90, 200)).get, "jpg")

  test("audio_metadata: header-only WAV parse matches the writer's params") {
    val m = MediaFiles.wavMetadata(wav(16000, 8000f)).get
    assert(m.sample_rate == 8000L)
    assert(m.channels == 1L)
    assert(m.frames == 16000.0)
    assert(m.format == "WAV" && m.subtype == "PCM_16")
    assert(MediaFiles.wavMetadata("not a wav".getBytes).isEmpty)
  }

  test("video_metadata: avih fields match the writer's params") {
    val bytes = avi(Seq.fill(5)(jpeg(32, 24)), 32, 24, 10)
    val m = MediaFiles.aviMetadata(bytes).get
    assert(m.width == 32L && m.height == 24L)
    assert(m.frame_count == 5L)
    assert(math.abs(m.fps - 10.0) < 0.01)
    assert(math.abs(m.time_base - 0.1) < 1e-6)
  }

  test("image metadata: PNG, JPEG and GIF headers, no pixel decode") {
    val png = Images.solidPng(17, 9, 1, 2, 3)
    val mp = MediaFiles.imageMetadata(png).get
    assert(mp.width == 17L && mp.height == 9L && mp.format == "PNG" && mp.mode == "RGB")
    val mj = MediaFiles.imageMetadata(jpeg(21, 13)).get
    assert(mj.width == 21L && mj.height == 13L && mj.format == "JPEG" && mj.mode == "RGB")
    val gif = Images.encode(Images.decode(Images.solidPng(5, 4, 9, 9, 9)).get, "gif")
    val mg = MediaFiles.imageMetadata(gif).get
    assert(mg.width == 5L && mg.height == 4L && mg.format == "GIF")
  }

  test("typed gates pass matching media and reject mismatches loudly") {
    val w = wav(100, 8000f)
    val df = Seq(Tuple1(w)).toDF("b")
    assert(df.select(MediaFiles.audioFile($"b")).head().getAs[Array[Byte]](0).length == w.length)
    val ex = intercept[Exception] {
      df.select(MediaFiles.videoFile($"b")).head()
    }
    assert(ex.getMessage.contains("Expected video file"))
    val a = avi(Seq(jpeg(8, 8)), 8, 8, 5)
    val dfa = Seq(Tuple1(a)).toDF("b")
    assert(dfa.select(MediaFiles.videoFile($"b")).head().getAs[Array[Byte]](0).length == a.length)
  }

  test("video_keyframes and get_video_frame_by_idx over an MJPEG clip") {
    val fs = Seq(jpeg(16, 16), jpeg(16, 16), jpeg(16, 16))
    val bytes = avi(fs, 16, 16, 4)
    val df = Seq(Tuple1(bytes)).toDF("v")
    val kf = df.select(MediaFiles.videoKeyframes($"v").as("k")).head()
      .getAs[scala.collection.Seq[Array[Byte]]](0)
    assert(kf.length == 3) // MJPEG: every frame is a keyframe
    assert(kf(1).sameElements(fs(1)))
    val f2 = df.select(MediaFiles.getVideoFrameByIdx($"v", 2)).head().getAs[Array[Byte]](0)
    assert(f2.sameElements(fs(2)))
    assert(df.select(MediaFiles.getVideoFrameByIdx($"v", 99)).head().isNullAt(0))
  }

  test("image_attribute dispatches to the decoded struct fields") {
    val png = Images.solidPng(10, 6, 0, 255, 0)
    val df = Seq(Tuple1(png)).toDF("b")
      .select(Images.decodeUdf($"b").as("img"))
    val r = df.select(
      MediaFiles.imageAttribute($"img", "width"),
      MediaFiles.imageAttribute($"img", "height"),
      MediaFiles.imageAttribute($"img", "mode"),
      MediaFiles.imageAttribute($"img", "channel")).head()
    assert(r.getInt(0) == 10 && r.getInt(1) == 6)
    assert(r.getString(2) == "RGB" && r.getInt(3) == 3)
    intercept[IllegalArgumentException] {
      MediaFiles.imageAttribute($"img", "nope")
    }
  }

  test("sniff agrees with the columnar guessMimeType on every branch") {
    val cases = Seq(
      "89504E470D0A1A0A" -> "image/png", "FFD8FF" -> "image/jpeg",
      "47494638" -> "image/gif",
      "524946460000000057454250" -> "image/webp",
      "25504446" -> "application/pdf", "504B0304" -> "application/zip",
      "494433" -> "audio/mpeg", "FFFB" -> "audio/mpeg",
      "524946460000000057415645" -> "audio/wav", "4F676753" -> "audio/ogg",
      "0000001866747970" -> "video/mp4", "000001BA" -> "video/mpeg",
      "3C21444F4354595045" -> "text/html",
      "894844460D0A1A0A" -> "application/vnd.hdfgroup.hdf5")
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    for ((hx, want) <- cases)
      assert(MediaFiles.sniff(unhex(hx)).contains(want), hx)
    assert(MediaFiles.sniff(unhex("DEADBEEF")).isEmpty)
  }

  test("malformed headers terminate: huge WAV chunk size, corrupt JPEG length") {
    // WAV whose first chunk claims size 0xFFFFFFF8 — must return None,
    // not spin (the size is walked as a Long, off runs past the end)
    val evil = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill[Byte](64)(0)
    assert(MediaFiles.wavMetadata(evil).isEmpty)
    // JPEG segment with length < 2 — corrupt, stop instead of looping
    val badJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
      0, 0, 0, 0, 0, 0, 0, 0)
    assert(MediaFiles.imageMetadata(badJpeg).isEmpty)
  }

  test("avih found behind an odd-sized leading chunk (2-byte alignment)") {
    // build a normal AVI, then splice a 5-byte JUNK chunk (padded to 6)
    // between the RIFF header and the hdrl LIST — avih lands at an
    // offset that a 4-byte-stride scan would step over
    val base = avi(Seq(jpeg(12, 10)), 12, 10, 8)
    val junk = "JUNK".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // body 5 + 1 pad byte
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    val m = MediaFiles.aviMetadata(spliced).get
    assert(m.width == 12L && m.height == 10L && m.frame_count == 1L)
  }

  test("JPEG with 0xFF fill bytes between segments still parses") {
    val j = jpeg(19, 7)
    // inject two fill bytes after SOI (spec-legal padding)
    val padded = j.take(2) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ j.drop(2)
    val m = MediaFiles.imageMetadata(padded).get
    assert(m.width == 19L && m.height == 7L)
  }

  test("from_files: lazy file refs from a glob; empty on no match") {
    val dir = java.nio.file.Files.createTempDirectory("fromfiles").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.png"),
      Images.solidPng(3, 3, 1, 1, 1))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.png"),
      Images.solidPng(4, 4, 2, 2, 2))
    val df = graft.Graft.fromFiles(spark, s"$dir/*.png")
    assert(df.columns.toSeq == Seq("file"))
    assert(df.count() == 2)
    val none = graft.Graft.fromFiles(spark, s"$dir/nothing-here-*.xyz")
    assert(none.count() == 0)
  }
}
