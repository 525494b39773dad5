package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Images, Img, UrlIO}
import org.apache.spark.sql.functions._

/** Real-codec image ops (javax.imageio) + URL download/upload over file://
  * and a local in-process HTTP server (SURVEY §2.6 image/url namespaces;
  * ref daft/functions/image.py, url.py). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Img =
    Images.decode(Images.solidPng(w, h, r, g, b)).get

  test("PNG encode/decode round-trips real pixels") {
    val img = solid(10, 6, 20, 40, 60)
    assert((img.width, img.height, img.channels, img.mode) == ((10, 6, 3, "RGB")))
    assert(img.data.length == 10 * 6 * 3)
    assert(Images.pixelSum(img.data) == 10L * 6 * (20 + 40 + 60))
    // re-encode (lossless) → decode → identical pixels
    val again = Images.decode(Images.encode(img, "png")).get
    assert(again.data.sameElements(img.data))
  }

  test("JPEG encode produces decodable bytes with approximate pixels") {
    val img = solid(16, 16, 100, 150, 200)
    val jpeg = Images.decode(Images.encode(img, "jpeg")).get
    assert((jpeg.width, jpeg.height) == ((16, 16)))
    // lossy: mean per-channel error stays small on a solid image
    val meanErr = jpeg.data.zip(img.data)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / img.data.length
    assert(meanErr < 10.0, s"jpeg mean error $meanErr")
  }

  test("resize is a real rescale (solid stays solid; gradient averages)") {
    val img = solid(20, 12, 7, 8, 9)
    val rs = Images.resize(img, 5, 3)
    assert((rs.width, rs.height) == ((5, 3)))
    assert(Images.pixelSum(rs.data) == 5L * 3 * (7 + 8 + 9))
    // non-solid: left half black, right half white, downscale to 1x1 → mid gray
    val half = Img(
      Array.tabulate(2 * 1 * 3)(i => if (i < 3) 0.toByte else 255.toByte), 1, 2, "RGB", 3)
    val one = Images.resize(half, 1, 1)
    val v = one.data(0) & 0xff
    assert(v > 64 && v < 192, s"expected mid-gray, got $v")
  }

  test("crop slices the pixel grid") {
    // 4x4 with distinct quadrant colors; crop top-left 2x2
    val data = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val v: Byte = (if (y < 2 && x < 2) 10 else 200).toByte
      val o = (y * 4 + x) * 3
      data(o) = v; data(o + 1) = v; data(o + 2) = v
    }
    val img = Img(data, 4, 4, "RGB", 3)
    val c = Images.crop(img, 0, 0, 2, 2)
    assert((c.width, c.height) == ((2, 2)))
    assert(c.data.forall(_ == 10.toByte))
  }

  test("convert_image matches the documented luma transform") {
    val img = solid(3, 3, 50, 100, 150)
    val gray = Images.convertMode(img, "L")
    val expected = (50 * 299 + 100 * 587 + 150 * 114) / 1000
    assert(gray.channels == 1 && gray.data.forall(b => (b & 0xff) == expected))
    val back = Images.convertMode(gray, "RGB")
    assert(back.channels == 3 && back.data.forall(b => (b & 0xff) == expected))
  }

  test("average hash: identical images collide, different images differ") {
    val a = solid(32, 32, 10, 10, 10)
    val b = solid(32, 32, 10, 10, 10)
    assert(Images.averageHash(a) == Images.averageHash(b))
    // gradient image yields a structured (not all-equal) hash
    val grad = Img(
      Array.tabulate(32 * 32 * 3)(i => ((i / 96) % 256).toByte), 32, 32, "RGB", 3)
    assert(Images.averageHash(grad) != Images.averageHash(a))
  }

  test("WAV encode/decode round-trips dyadic samples exactly") {
    import graft.ops.Audio
    val samples = Array.tabulate(1600)(i => if (i % 2 == 0) 0.25f else -0.5f)
    val wav = Audio.encodeWav(samples, 8000f)
    val clip = Audio.decode(wav).get
    assert(clip.channels == 1 && clip.sampleRate == 8000f)
    assert(clip.numFrames == 1600)
    assert(clip.samples(0) == 0.25f)
    // -0.5 is NOT exactly representable on the negative side of 16-bit PCM
    // (round(-16383.5) -> -16383), so assert to PCM quantization instead
    assert(math.abs(clip.samples(1) + 0.5f) <= 1f / 32768)
    val down = Audio.downsample(clip, 2)
    assert(down.numFrames == 800 && down.sampleRate == 4000f)
    assert(down.samples.forall(_ == 0.25f)) // every 2nd frame, all +0.25
    assert(Audio.decode("not audio".getBytes) == None)
  }

  test("url download reads file:// URIs written by upload") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("payload"),
        concat(lit("f_"), col("id")).as("fname"))
    val up = UrlIO.upload(df, "payload", "/tmp/graft_urlio_spec", "url", Some("fname"))
    val down = UrlIO.download(up, "url", "bytes", maxConnections = 4, onError = "null")
    val got = down.select(col("id"), decode(col("bytes"), "UTF-8").as("s2"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, null)))
  }

  test("url download fetches over HTTP with bounded concurrency") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = s"payload:${ex.getRequestURI.getPath}".getBytes("UTF-8")
        if (ex.getRequestURI.getPath.endsWith("missing")) {
          ex.sendResponseHeaders(404, -1)
        } else {
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val urls = (1 to 40).map(i => (i.toLong, s"http://127.0.0.1:$port/item/$i")) :+
        (99L, s"http://127.0.0.1:$port/missing")
      val df = urls.toDF("id", "url")
      val down = UrlIO.download(df, "url", "bytes", maxConnections = 8, onError = "null")
        .select(col("id"), decode(col("bytes"), "UTF-8").as("body"))
        .orderBy("id").collect()
      assert(down.length == 41)
      assert(down.take(40).forall(r => r.getString(1) == s"payload:/item/${r.getLong(0)}"))
      assert(down.last.getString(1) == null) // 404 → null under on_error="null"
    } finally server.stop(0)
  }

  test("download pool is reclaimed when the iterator is abandoned mid-partition") {
    val before = UrlIO.livePools.get()
    val df = Seq.tabulate(64)(i => (i.toLong, s"f_$i")).toDF("id", "fname")
      .select(col("id"), encode(col("fname"), "UTF-8").as("payload"), col("fname"))
      .coalesce(1)
    val up = UrlIO.upload(df, "payload", "/tmp/graft_urlio_limit_spec", "url", Some("fname"))
    // limit(1) stops pulling after the first row: the 64-row partition's
    // iterator is never exhausted, so only a task-completion listener can
    // release the pool.
    val one = UrlIO.download(up, "url", "bytes", maxConnections = 4)
      .limit(1).collect()
    assert(one.length == 1)
    // listener runs at task end; poll briefly for the async cleanup
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (UrlIO.livePools.get() > before && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(UrlIO.livePools.get() <= before,
      s"leaked pools: ${UrlIO.livePools.get()} > $before")
  }
}
