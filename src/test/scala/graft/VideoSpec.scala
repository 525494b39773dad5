package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Images, Video}

/** MJPEG-AVI frame source: RIFF round-trip with real JPEG pixels,
  * every-Nth sampling without decoding skipped frames, malformed input. */
class VideoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def mkAvi(nFrames: Int, path: java.nio.file.Path): Seq[(Int, Int, Int)] = {
    val colors = (0 until nFrames).map(i => (10 + i * 7, 200 - i * 5, 40 + i * 3))
    val frames = colors.map { case (r, g, b) =>
      Images.encode(Images.decode(Images.solidPng(32, 24, r, g, b)).get, "jpg")
    }
    val out = java.nio.file.Files.newOutputStream(path)
    try Video.writeMjpegAvi(frames, 32, 24, fps = 10, out)
    finally out.close()
    colors
  }

  private def meanChannel(img: graft.ops.Img, ch: Int): Double = {
    var sum = 0L
    var i = ch
    while (i < img.data.length) { sum += img.data(i) & 0xff; i += img.channels }
    sum.toDouble / (img.width * img.height)
  }

  test("round-trips frames with real pixel content") {
    val p = java.nio.file.Paths.get("/tmp/graft_video_spec.avi")
    val colors = mkAvi(12, p)
    val rows = Video.readFrames(spark, p.toString).orderBy("frame_idx").collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val idx = r.getInt(1)
      val img = Images.decode(r.getAs[Array[Byte]](2)).get
      assert(img.width == 32 && img.height == 24)
      val (er, eg, eb) = colors(idx)
      assert(math.abs(meanChannel(img, 0) - er) <= 6, s"frame $idx red")
      assert(math.abs(meanChannel(img, 1) - eg) <= 6, s"frame $idx green")
      assert(math.abs(meanChannel(img, 2) - eb) <= 6, s"frame $idx blue")
    }
  }

  test("everyNth sampling returns only sampled indices") {
    val p = java.nio.file.Paths.get("/tmp/graft_video_spec_nth.avi")
    mkAvi(20, p)
    val idxs = Video.readFrames(spark, p.toString, everyNth = 3)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idxs.toSeq == (0 until 20 by 3).toSeq)
  }

  test("rejects non-AVI bytes") {
    val in = new java.io.ByteArrayInputStream("not a riff file".getBytes)
    val e = intercept[java.io.IOException](Video.parseFrames(in, 1).toList)
    assert(e.getMessage.contains("RIFF"))
  }
}
