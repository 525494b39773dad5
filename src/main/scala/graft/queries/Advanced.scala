package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing, actor-style stateful UDFs, and Structured
  * Streaming coverage. */
object Advanced {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Multimodal pipeline: text → binary payload → per-partition lazy
    * decoder (STUB pixels, real plumbing) → resize → tensor metadata. */
  def multimodal_pipeline(s: SparkSession, dir: String): DataFrame = {
    val withBytes = t(s, dir).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val decoded = Multimodal.decodeImages(withBytes, "payload", "img")
    decoded
      .withColumn("img_small", Multimodal.resize(col("img"), 64, 64))
      .withColumn("tensor", Multimodal.toTensor(col("img_small")))
      .select(
        col("doc_id"),
        col("img.height").as("h"),
        col("img.width").as("w"),
        col("img.mode").as("mode"),
        col("img.channels").as("channels"),
        col("img_small.height").as("h2"),
        col("img_small.width").as("w2"),
        aggregate(col("tensor.shape"), lit(1L), (acc, x) => acc * x).as("tensor_elems"))
      .orderBy("doc_id")
  }

  val multimodalPipelineSql =
    """SELECT doc_id,
      |  64 + (octet_length(encode(text)) % 512) AS h,
      |  64 + ((octet_length(encode(text)) * 7) % 512) AS w,
      |  'RGB' AS mode, 3 AS channels,
      |  64 AS h2, 64 AS w2,
      |  CAST(64 * 64 * 3 AS BIGINT) AS tensor_elems
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Real-codec image pipeline (ref daft/functions/image.py decode_image/
    * resize/crop/convert_image/image_to_tensor): synthesize real PNGs with
    * arithmetic-predictable pixels (solid color, dims derived from doc_id),
    * then decode → crop → resize → gray-convert → tensor with actual
    * javax.imageio pixel operations. Every output column is checkable in
    * SQL from doc_id alone — real dimensions and real pixel sums of really
    * encoded images, not stub dims. */
  def multimodal_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Images
    val pngForId = udf { (id: Long) =>
      Images.solidPng(
        8 + (id % 16).toInt, 8 + (id % 8).toInt,
        (id % 256).toInt, (id * 3 % 256).toInt, (id * 7 % 256).toInt)
    }
    t(s, dir).documents
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), pngForId(col("doc_id")).as("png"))
      .withColumn("img", Images.decodeUdf(col("png")))
      .withColumn("cropped", Images.cropUdf(
        col("img"), lit(0), lit(0),
        floor(col("img.width") / 2).cast("int"),
        floor(col("img.height") / 2).cast("int")))
      .withColumn("resized", Images.resizeUdf(16, 16)(col("img")))
      .withColumn("gray", Images.convertUdf("L")(col("img")))
      .withColumn("tensor", Images.toTensorUdf(col("resized")))
      .select(
        col("doc_id"),
        col("img.width").as("w"),
        col("img.height").as("h"),
        col("img.channels").as("channels"),
        col("img.mode").as("mode"),
        Images.pixelSumUdf(col("img")).as("pix_sum"),
        col("cropped.width").as("wc"),
        col("cropped.height").as("hc"),
        Images.pixelSumUdf(col("cropped")).as("pix_sum_crop"),
        Images.pixelSumUdf(col("resized")).as("pix_sum_resized"),
        Images.pixelSumUdf(col("gray")).as("lum_sum"),
        aggregate(col("tensor.shape"), lit(1L), (acc, x) => acc * x).as("tensor_elems"))
      .orderBy("doc_id")
  }

  val multimodalDecodeSql =
    """WITH px AS (
      |  SELECT doc_id,
      |    8 + doc_id % 16 AS w, 8 + doc_id % 8 AS h,
      |    doc_id % 256 AS r, (doc_id * 3) % 256 AS g, (doc_id * 7) % 256 AS b
      |  FROM documents WHERE doc_id < 300)
      |SELECT doc_id,
      |  CAST(w AS INT) AS w, CAST(h AS INT) AS h,
      |  3 AS channels, 'RGB' AS mode,
      |  CAST(w * h * (r + g + b) AS BIGINT) AS pix_sum,
      |  CAST(w // 2 AS INT) AS wc, CAST(h // 2 AS INT) AS hc,
      |  CAST((w // 2) * (h // 2) * (r + g + b) AS BIGINT) AS pix_sum_crop,
      |  CAST(16 * 16 * (r + g + b) AS BIGINT) AS pix_sum_resized,
      |  CAST(w * h * ((r * 299 + g * 587 + b * 114) // 1000) AS BIGINT) AS lum_sum,
      |  CAST(16 * 16 * 3 AS BIGINT) AS tensor_elems
      |FROM px ORDER BY doc_id""".stripMargin

  /** Real-codec audio pipeline (ref daft/functions/audio.py; JDK
    * javax.sound WAV): synthesize square-wave WAVs (amplitude ±0.25 —
    * exactly representable through 16-bit PCM, so RMS is exactly 0.25 and
    * every output is arithmetic-checkable), then decode and measure. */
  def multimodal_audio(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Audio
    val wavForId = udf { (id: Long) =>
      val n = 8000 + (id % 1000).toInt
      val samples = Array.tabulate(n)(i => if ((i / 8) % 2 == 0) 0.25f else -0.25f)
      Audio.encodeWav(samples, 16000f)
    }
    t(s, dir).documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), wavForId(col("doc_id")).as("wav"))
      .select(
        col("doc_id"),
        Audio.decodeUdf(col("wav")).as("clip"),
        Audio.durationUdf(col("wav")).as("dur"),
        Audio.rmsUdf(col("wav")).as("rms"))
      .select(
        col("doc_id"),
        col("clip.channels").as("channels"),
        col("clip.sampleRate").cast("double").as("sr"),
        size(col("clip.samples")).as("n_frames"),
        col("dur"), col("rms"))
      .orderBy("doc_id")
  }

  val multimodalAudioSql =
    """SELECT doc_id, 1 AS channels, CAST(16000 AS DOUBLE) AS sr,
      |  CAST(8000 + doc_id % 1000 AS INT) AS n_frames,
      |  (8000 + doc_id % 1000) / 16000.0 AS dur,
      |  CAST(0.25 AS DOUBLE) AS rms
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** File column ops (ref daft/functions/file_.py): stage each document as
    * a real file, wrap the path as a File value, then stat/read/sniff —
    * path, size, existence, magic-byte MIME of text and PNG payloads. */
  def fn_file(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Files => GFiles, Images, UrlIO}
    val base = s"/tmp/graft_file_${math.abs(dir.hashCode)}"
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("fname"))
    val staged = UrlIO.upload(docs, "payload", base, "url", nameCol = Some("fname"))
      .withColumn("f", GFiles.file(col("url")))
    staged.select(
        col("doc_id"),
        (GFiles.filePath(col("f")) === col("url")).as("path_ok"),
        GFiles.fileSizeUdf(col("f")).as("fsize"),
        GFiles.fileExistsUdf(col("f")).as("fexists"),
        GFiles.guessMimeUdf(col("payload")).as("mime_txt"),
        GFiles.guessMimeUdf(
          Images.solidPngUdf(lit(4), lit(4), lit(1), lit(2), lit(3))).as("mime_png"))
      .orderBy("doc_id")
  }

  val fnFileSql =
    """SELECT doc_id, true AS path_ok,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS fsize,
      |  true AS fexists, 'text/plain' AS mime_txt, 'image/png' AS mime_png
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** embed_text (ref daft/ai protocols + functions/ai.py) with the
    * deterministic hashing-trick provider: embeddings are unit-norm, and
    * byte-identical duplicate documents (the id-shifted copy corpus) embed
    * to cosine exactly 1 — both checkable without a model. */
  def ai_embed_text(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Ai
    val d = t(s, dir).documents.select("doc_id", "text")
    val dup = d.union(d.withColumn("doc_id", col("doc_id") + 10000))
    val embedded = Ai.embedText(dup, "text", "emb", new Ai.HashingEmbedder(64))
    val orig = embedded.filter(col("doc_id") < 10000)
      .select(col("doc_id"), col("emb").as("e1"))
    val copy = embedded.filter(col("doc_id") >= 10000)
      .select((col("doc_id") - 10000).as("doc_id"), col("emb").as("e2"))
    orig.join(copy, "doc_id")
      .select(
        col("doc_id"),
        size(col("e1")).as("dim"),
        // round(4): float32 accumulation over 64 dims carries ~1e-6 error
        round(graft.functions.Distance.cosineSimilarityNative(col("e1"), col("e2")), 4)
          .as("dup_cos"),
        round(sqrt(aggregate(col("e1"), lit(0.0d), (a, x) => a + x * x)), 4).as("norm"))
      .orderBy("doc_id")
  }

  val aiEmbedTextSql =
    """SELECT doc_id, 64 AS dim, CAST(1.0 AS DOUBLE) AS dup_cos,
      |  CAST(1.0 AS DOUBLE) AS norm
      |FROM documents ORDER BY doc_id""".stripMargin

  /** embed_text over the OPENAI-COMPATIBLE HTTP PROTOCOL (ref
    * `daft/ai/openai/`, provider.py:104): an in-process `/v1/embeddings`
    * server hosts the hashing embedder as its "model", and the distributed
    * job embeds through [[graft.ops.Ai.HttpTextEmbedder]] — real JSON wire
    * shape, index re-ordering, micro-batched POSTs. `identical` proves the
    * HTTP round trip returns bit-identical float32 vectors to the local
    * provider (Jackson writes shortest-roundtrip decimals). Eagerly
    * materialized (localCheckpoint) so the fixture server's lifetime is
    * confined to this call — the endpoint is necessarily in-process in an
    * offline environment; a real deployment just changes the URL. */
  def ai_embed_http(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Ai
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val local = new Ai.HashingEmbedder(64)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", new com.sun.net.httpserver.HttpHandler {
      def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val root = mapper.readTree(ex.getRequestBody.readAllBytes())
        val in = root.get("input")
        val texts = (0 until in.size()).map(i => in.get(i).asText())
        val resp = mapper.createObjectNode()
        val data = resp.putArray("data")
        // deliberately reversed: the client must re-order by `index`
        local.embedBatch(texts).zipWithIndex.reverse.foreach { case (v, i) =>
          val d = data.addObject()
          d.put("index", i)
          val e = d.putArray("embedding")
          v.foreach(e.add)
        }
        val bytes = mapper.writeValueAsString(resp).getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val endpoint =
        s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings"
      val docs = t(s, dir).documents.filter(col("doc_id") < 200)
        .select("doc_id", "text")
      val viaHttp = Ai.embedText(docs, "text", "e_http",
        new Ai.HttpTextEmbedder(endpoint, 64), batchSize = 32)
      val both = Ai.embedText(viaHttp, "text", "e_local", local)
      both.select(
          col("doc_id"),
          size(col("e_http")).as("dim"),
          (col("e_http") === col("e_local")).as("identical"),
          round(sqrt(aggregate(col("e_http"), lit(0.0d), (a, x) => a + x * x)), 4)
            .as("norm"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally server.stop(0)
  }

  val aiEmbedHttpSql =
    """SELECT doc_id, 64 AS dim, true AS identical, CAST(1.0 AS DOUBLE) AS norm
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** embed_image (ref ai ImageEmbedder protocol): grid-pooled color
    * embeddings over real decoded pixels. Pure-channel solid images embed
    * to unit vectors confined to one channel's coordinates, so norms are
    * 1 and cross-color cosines are 0 (spec-checked); the oracle pins
    * class counts + the norm invariant. */
  def ai_embed_image(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Ai, Images}
    val pngForId = udf { (id: Long) =>
      val c = (id % 3).toInt
      Images.solidPng(16, 16,
        if (c == 0) 200 else 0, if (c == 1) 200 else 0, if (c == 2) 200 else 0)
    }
    val base = t(s, dir).documents.filter(col("doc_id") < 120)
      .select(col("doc_id"), pngForId(col("doc_id")).as("png"))
    Ai.embedImage(base, "png", "emb")
      .select(
        (col("doc_id") % 3).cast("int").as("cls"),
        size(col("emb")).as("dim"),
        sqrt(aggregate(col("emb"), lit(0.0d), (a, x) => a + x * x)).as("norm"))
      .groupBy("cls")
      .agg(
        count(lit(1)).as("n"),
        min("dim").as("dim"),
        (min("norm") > 0.9999 && max("norm") < 1.0001).as("norm_ok"))
      .orderBy("cls")
  }

  val aiEmbedImageSql =
    """SELECT CAST(doc_id % 3 AS INT) AS cls, count(*) AS n, 48 AS dim,
      |  true AS norm_ok
      |FROM documents WHERE doc_id < 120 GROUP BY cls ORDER BY cls""".stripMargin

  /** classify_text (ref ai TextClassifier): zero-shot embedding-prototype
    * classification. Texts constructed from a known label vocabulary must
    * classify back to their label. */
  def ai_classify_text(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Ai
    val labels = Seq("alpha", "bravo", "charlie")
    val lbl = element_at(
      array(labels.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
    val base = t(s, dir).documents.filter(col("doc_id") < 150)
      .select(col("doc_id"), lbl.as("expected"),
        concat_ws(" ", array_repeat(lbl, 4)).as("text"))
    Ai.classifyText(base, "text", "predicted", labels)
      .groupBy("expected")
      .agg(
        count(lit(1)).as("n"),
        (count(when(col("predicted") === col("expected"), 1)) === count(lit(1)))
          .as("all_correct"))
      .orderBy("expected")
  }

  val aiClassifyTextSql =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'bravo'
      |    ELSE 'charlie' END AS expected,
      |  count(*) AS n, true AS all_correct
      |FROM documents WHERE doc_id < 150 GROUP BY expected ORDER BY expected""".stripMargin

  /** classify_image (ref ai ImageClassifier): dominant-channel classifier
    * over real decoded pixels — solid fixtures must classify to their
    * constructed color, including the balanced-channel gray case. */
  def ai_classify_image(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Ai, Images}
    val pngForId = udf { (id: Long) =>
      (id % 4).toInt match {
        case 0 => Images.solidPng(12, 12, 220, 30, 30)
        case 1 => Images.solidPng(12, 12, 30, 220, 30)
        case 2 => Images.solidPng(12, 12, 30, 30, 220)
        case _ => Images.solidPng(12, 12, 128, 128, 128)
      }
    }
    val base = t(s, dir).documents.filter(col("doc_id") < 160)
      .select(col("doc_id"), pngForId(col("doc_id")).as("png"))
    Ai.classifyImage(base, "png", "predicted")
      .groupBy("predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("predicted")
  }

  val aiClassifyImageSql =
    """SELECT CASE doc_id % 4 WHEN 0 THEN 'red' WHEN 1 THEN 'green'
      |    WHEN 2 THEN 'blue' ELSE 'gray' END AS predicted,
      |  count(*) AS n
      |FROM documents WHERE doc_id < 160 GROUP BY predicted ORDER BY predicted""".stripMargin

  /** Video frame-sampling plumbing (ref read_video_frames): one row per
    * sampled frame index — pure explode, fully distributed. */
  def multimodal_frames(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val vids = t(s, dir).documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        (lit(10) + col("doc_id") % 20).cast("int").as("total_frames"))
    Multimodal.sampleFrames(vids, "payload", everyNth = 4, col("total_frames"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max("frame_idx").as("last_frame"))
      .orderBy("doc_id")
  }

  val multimodalFramesSql =
    """SELECT doc_id,
      |  CAST((10 + doc_id % 20 - 1) // 4 + 1 AS BIGINT) AS n_sampled,
      |  CAST(((10 + doc_id % 20 - 1) // 4) * 4 AS INT) AS last_frame
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** REAL video frame decode (ref read_video_frames): an MJPEG-AVI with
    * one solid-color JPEG frame per nation (color a function of the key)
    * is parsed chunk-by-chunk and every frame's actual pixels are decoded
    * and checked against the expected color (JPEG-lossy tolerance ±6). */
  def multimodal_video_frames(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Images, Video}
    val avi = new java.io.File(s"/tmp/graft_io/video_${math.abs(dir.hashCode)}.avi")
    if (!avi.isFile) {
      // fixture: 25 frames at 64×48; dim-bounded driver-side generation
      val frames = (0 until 25).map { i =>
        val img = Images.decode(Images.solidPng(64, 48,
          20 + i * 8, 30 + (i * 5) % 180, 40 + (i * 11) % 150)).get
        Images.encode(img, "jpg")
      }
      avi.getParentFile.mkdirs()
      val out = java.nio.file.Files.newOutputStream(avi.toPath)
      try Video.writeMjpegAvi(frames, 64, 48, fps = 5, out)
      finally out.close()
    }
    val meanCh = udf { (bytes: Array[Byte], ch: Int) =>
      Images.decode(bytes).map { img =>
        val n = img.width * img.height
        var sum = 0L
        var i = ch
        while (i < img.data.length) { sum += img.data(i) & 0xff; i += img.channels }
        sum.toDouble / n
      }
    }
    val frames = Video.readFrames(s, avi.getPath)
    t(s, dir).nation
      .join(frames, col("n_nationkey") === col("frame_idx"))
      .select(
        col("frame_idx"), col("n_name"),
        (abs(meanCh(col("frame_data"), lit(0)) - (lit(20) + col("frame_idx") * 8)) <= 6).as("r_ok"),
        (abs(meanCh(col("frame_data"), lit(1)) - (lit(30) + (col("frame_idx") * 5) % 180)) <= 6).as("g_ok"),
        (abs(meanCh(col("frame_data"), lit(2)) - (lit(40) + (col("frame_idx") * 11) % 150)) <= 6).as("b_ok"))
      .orderBy("frame_idx")
  }

  val multimodalVideoFramesSql =
    """SELECT CAST(n_nationkey AS INT) AS frame_idx, n_name,
      |  true AS r_ok, true AS g_ok, true AS b_ok
      |FROM nation ORDER BY frame_idx""".stripMargin

  /** Actor-style stateful UDF (ref §2.7 @daft.cls actor pools): a
    * per-partition lazily-initialized "model" applied row-wise via
    * mapPartitions — state constructed once per partition, not per row. */
  def udf_stateful(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir).events.select("event_id", "event_type", "value")
    val schema = StructType(events.schema.fields :+ StructField("score", DoubleType))
    val enc = Encoders.row(schema)
    val scored = events.mapPartitions { rows =>
      // stands in for loading a model/tokenizer once per executor core
      lazy val model: Map[String, Double] = Map(
        "click" -> 1.0, "view" -> 0.5, "purchase" -> 5.0,
        "signup" -> 3.0, "error" -> -1.0)
      rows.map { r =>
        val w = model.getOrElse(r.getString(1), 0.0)
        Row.fromSeq(r.toSeq :+ (r.getDouble(2) * w))
      }
    }(enc)
    scored.select("event_id", "score").orderBy("event_id")
  }

  val udfStatefulSql =
    """SELECT event_id,
      |  value * (CASE event_type WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
      |           WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
      |           WHEN 'error' THEN -1.0 ELSE 0.0 END) AS score
      |FROM events ORDER BY event_id""".stripMargin

  /** Row-wise generator UDF → rows (ref §2.7 generator funcs → UDTF):
    * repeat each order key priority-many times via explode over a
    * computed sequence. */
  def udf_generator(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .filter(col("o_orderkey") < 200)
      .withColumn("n_copies", substring(col("o_orderpriority"), 1, 1).cast("int"))
      .select(col("o_orderkey"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
      .orderBy("o_orderkey", "copy_idx")

  val udfGeneratorSql =
    """SELECT o_orderkey, unnest(range(1, CAST(substring(o_orderpriority,1,1) AS INT) + 1)) AS copy_idx
      |FROM orders WHERE o_orderkey < 200
      |ORDER BY o_orderkey, copy_idx""".stripMargin

  /** run_process (ref daft/functions/process.py): per-row external command
    * with column-derived argv; printf %s echoes the document text back
    * through a real subprocess, making stdout value-checkable. */
  def udf_process(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Process
    t(s, dir).documents
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        Process.runProcess(Seq(lit("printf"), lit("%s"), col("text"))).as("stdout_text"))
      .orderBy("doc_id")
  }

  val udfProcessSql =
    "SELECT doc_id, text AS stdout_text FROM documents WHERE doc_id < 100 ORDER BY doc_id"

  /** Structured Streaming: watermarked tumbling-window counts (superset of
    * the reference, which has no streaming engine — SURVEY §2.9). */
  def streaming_window(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .windowedCounts(s, dir, s"graft_win_${math.abs(dir.hashCode)}")
      .orderBy("day", "hr", "event_type")

  val streamingWindowSql =
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |  hour(CAST(ts AS TIMESTAMP)) AS hr,
      |  event_type, count(*) AS n, sum(value) AS total_value
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY day, hr, event_type""".stripMargin

  /** Structured Streaming over the graft-kafka SOURCE: the firehose goes
    * through a real broker (offset-addressed partitions) and the
    * watermarked window agg runs on Kafka-carried event time — the
    * round-5 composition of wire-protocol ingest + event-time windows. */
  def streaming_kafka_window(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .kafkaWindowed(s, dir, s"graft_kwin_${math.abs(dir.hashCode)}")
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("day", "hr", "event_type")

  val streamingKafkaWindowSql =
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |  hour(CAST(ts AS TIMESTAMP)) AS hr,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id < 3000
      |GROUP BY 1, 2, 3 ORDER BY day, hr, event_type""".stripMargin

  /** The end-to-end composition the two previous queries prove in halves:
    * Kafka wire source → watermarked tumbling window → exactly-once Delta
    * sink in ONE streaming query, restarted mid-stream from its
    * checkpoint (offsets + window state recovered; a replayed batch is
    * skipped via the Delta txn action). The oracle recomputes the same
    * hourly windows relationally — a lost or duplicated window row breaks
    * the equality. */
  def streaming_kafka_to_delta(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.kafkaToDelta(s, dir)
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("day", "hr", "event_type")

  val streamingKafkaToDeltaSql =
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |  hour(CAST(ts AS TIMESTAMP)) AS hr,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id < 3000
      |GROUP BY 1, 2, 3 ORDER BY day, hr, event_type""".stripMargin

  /** Structured Streaming: stateful exact dedup — every event arrives
    * twice, dropDuplicates inside the stream restores single-copy counts. */
  def streaming_dedup(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .dedupStream(s, dir, s"graft_dedup_${math.abs(dir.hashCode)}")
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("event_type")

  val streamingDedupSql =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Structured Streaming: exactly-once ingestion into a Delta table
    * (txn-stamped micro-batch commits), read back via log replay. */
  def streaming_delta_sink(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.deltaIngest(s, dir)
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("event_type")

  val streamingDeltaSinkSql =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Structured Streaming: stream-static broadcast enrichment join. */
  def streaming_enrich(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .enrichJoin(s, dir, s"graft_enrich_${math.abs(dir.hashCode)}")
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("category")

  val streamingEnrichSql =
    """SELECT CASE event_type
      |    WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
      |    WHEN 'purchase' THEN 'revenue' WHEN 'signup' THEN 'growth'
      |    ELSE 'ops' END AS category,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY category ORDER BY category""".stripMargin

  /** Structured Streaming: gap-based sessionization via Spark's native
    * `session_window()` (watermark-evicted state — the idiomatic engine
    * path at stream scale; 30-minute silence closes a session). */
  def streaming_sessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.sessionizeNative(s, dir, gapMinutes = 30)
      .orderBy("user_id")

  /** Same sessionization through flatMapGroupsWithState — the custom-state
    * API demo (KeyValueGroupedDataset, O(1) per-user state), checked
    * against the same oracle as the native path. */
  def streaming_sessions_state(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.sessionize(s, dir, gapMinutes = 30)
      .orderBy("user_id")

  /** Same sessionization a THIRD way — Spark 4's `transformWithState`
    * (StatefulProcessor + typed RocksDB-backed ValueState, the successor
    * API to flatMapGroupsWithState), checked against the same oracle. */
  def streaming_sessions_tws(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.sessionizeTws(s, dir, gapMinutes = 30)
      .orderBy("user_id")

  /** Structured Streaming: stream-STREAM interval join — views joined to
    * purchases of the same user within a 1-hour attribution window; both
    * sides watermarked so the join state is evicted, not hoarded. */
  def streaming_join(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .streamJoin(s, dir, s"graft_ssj_${math.abs(dir.hashCode)}")
      .orderBy("user_id")

  val streamingJoinSql =
    """SELECT v.user_id AS user_id, count(*) AS n_pairs,
      |  round(sum(p.value), 2) AS purchase_value
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Streaming dedup with watermark-BOUNDED state
    * (`dropDuplicatesWithinWatermark`) — the firehose-safe variant of
    * [[streaming_dedup]]; same single-copy-counts oracle. */
  def streaming_dedup_watermark(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .dedupWithinWatermark(s, dir, s"graft_dedupw_${math.abs(dir.hashCode)}")
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("event_type")

  /** Streaming NEAR-dup suppression: MinHash-LSH band state behind
    * `dropDuplicatesWithinWatermark` over a two-batch document stream
    * (originals, then exact copies with shifted ids). Batch 2's copies
    * all drop (their bands are claimed); batch 1 also drops one member
    * of each PLANTED near-dup group inside the base corpus (~25 pairs at
    * jaccard ≥ 0.9, incl. one triangle) — WHICH member survives depends
    * on in-batch arrival, so the compared output canonicalizes every
    * kept doc to its similarity-component MINIMUM (connected components
    * over exact ≥0.5-jaccard pairs). The canonical kept set is
    * arrival-invariant; the oracle replays the same canonicalization as
    * a recursive CTE. */
  def streaming_neardup(s: SparkSession, dir: String): DataFrame = {
    val kept = graft.streaming.Streaming
      .nearDupDedupStream(s, dir, s"graft_neardup_${math.abs(dir.hashCode)}")
    val docs = t(s, dir).documents
    val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val canon = graft.ops.Dedup.clusters(pairs, "doc_a", "doc_b")
    kept.join(canon, kept("doc_id") === canon("member"), "left")
      .select(coalesce(col("cluster"), col("doc_id")).cast("long").as("doc_id"))
      .distinct()
      .orderBy("doc_id")
  }

  // `cand` is an inverted-index candidate join (pairs sharing >=1 shingle):
  // jaccard >= 0.5 implies a nonempty intersection, so the result set is
  // IDENTICAL to the unconditioned pair join — but the old O(n^2)
  // all-pairs × list_intersect shape needed hours of DuckDB time at sf0.1
  // (18M pairs), while candidates stay ~linear.
  val streamingNeardupSql =
    """WITH RECURSIVE t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w)-1, 1)),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t WHERE len(w) >= 3),
      |inv AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT doc_a, doc_b
      |  FROM cand JOIN s sa ON sa.doc_id = cand.doc_a
      |            JOIN s sb ON sb.doc_id = cand.doc_b
      |  WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
      |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (SELECT a, b FROM edges
      |                UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |canon AS (SELECT a AS doc_id, least(a, min(b)) AS c FROM reach GROUP BY a)
      |SELECT DISTINCT coalesce(c.c, d.doc_id) AS doc_id
      |FROM documents d LEFT JOIN canon c USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  val streamingSessionsSql =
    """WITH g AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
      |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events)
      |SELECT user_id,
      |  CAST(1 + sum(CASE WHEN prev IS NOT NULL AND tus - prev > 30*60*1000000 THEN 1 ELSE 0 END) AS INT)
      |    AS n_sessions,
      |  CAST(count(*) AS INT) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Tokenize encode/decode round-trip over a corpus-built vocabulary
    * (ref str.py tokenize_encode/decode). */
  def tokenize_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Tokenize
    val docs = t(s, dir).documents
    val vocab = Tokenize.buildVocab(docs, "text")
    val enc = Tokenize.encode(docs, "doc_id", "text", vocab)
    val dec = Tokenize.decode(enc, "doc_id", "ids", vocab)
    docs.select(col("doc_id"), col("text"))
      .join(enc, "doc_id")
      .join(dec, "doc_id")
      .select(
        col("doc_id"),
        size(col("ids")).as("n_ids"),
        (col("decoded") === col("text")).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  val tokenizeRoundtripSql =
    """SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_ids,
      |  true AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** tiktoken-style pretrained-vocab BPE tokenize (ref str.py:1086):
    * train a byte-level BPE vocab on a corpus sample, persist it in the
    * .tiktoken file format, reload it, and encode/decode every document
    * through the rank-based merge loop. Full byte coverage (ranks 0-255)
    * makes the round trip lossless — a checkable contract — and
    * compression (n_ids ≤ n_bytes) proves merges actually apply. */
  def tokenize_pretrained(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Bpe
    val docs = t(s, dir).documents
    val sample = docs.orderBy("doc_id").limit(50)
      .select("text").collect().map(_.getString(0)).toSeq
    val vocabPath = s"/tmp/graft_bpe/vocab_${math.abs(dir.hashCode)}.tiktoken"
    Bpe.saveTiktoken(Bpe.train(sample, nMerges = 512), vocabPath)
    val ranks = Bpe.loadTiktoken(vocabPath)
    val enc = Bpe.encodeCol(docs.select("doc_id", "text"), "text", "ids", ranks)
    val dec = Bpe.decodeCol(enc, "ids", "decoded", ranks)
    dec.select(
        col("doc_id"),
        (col("decoded") === col("text")).as("roundtrip_ok"),
        (size(col("ids")) <= octet_length(col("text"))).as("compressed"),
        (size(col("ids")) > 0).as("nonempty"))
      .orderBy("doc_id")
  }

  val tokenizePretrainedSql =
    """SELECT doc_id, true AS roundtrip_ok, true AS compressed, true AS nonempty
      |FROM documents ORDER BY doc_id""".stripMargin

  /** VLLMProject analog: prefix-routed micro-batched generation with a
    * deterministic stub client (ref ops/vllm.rs). */
  def llm_generate(s: SparkSession, dir: String): DataFrame = {
    val prompts = t(s, dir).documents
      .select(col("doc_id"), concat(lit("summarize: "), col("text")).as("prompt"))
    graft.ops.LlmInference.generate(prompts, "prompt", "response", maxBatchSize = 16)
      .select(col("doc_id"), col("response"))
      .orderBy("doc_id")
  }

  val llmGenerateSql =
    """SELECT doc_id,
      |  array_to_string(string_split_regex(trim('summarize: ' || text), '\s+')[1:5], ' ')
      |    || ' [' || len(string_split_regex(trim('summarize: ' || text), '\s+')) || ' tokens]'
      |    AS response
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Media-file metadata family (ref daft/functions/{audio,video,
    * image_file_}.py, round-11 API sweep): per-row WAV / MJPEG-AVI / PNG
    * fixtures are synthesized from doc_id-derived parameters, the
    * header-only metadata functions read them back, and the oracle
    * predicts every field from the same parameters — so the parsers (not
    * the writers) are what's under test. */
  def fn_media_metadata(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Audio, Images, MediaFiles, Video}
    val wavUdf = udf { (id: Long) =>
      val n = (100 + id % 50).toInt
      Audio.encodeWav(Array.tabulate(n)(i => math.sin(i * 0.1).toFloat),
        (8000 + (id % 4) * 2000).toFloat)
    }
    val pngUdf = udf { (id: Long) =>
      Images.solidPng((1 + id % 16).toInt, (1 + id % 9).toInt, 10, 20, 30)
    }
    // row-independent constant: encode the 8x8 frame ONCE, not per row
    val jpg = Images.encode(
      Images.decode(Images.solidPng(8, 8, 5, 5, 5)).get, "jpg")
    val aviUdf = udf { (id: Long) =>
      val bos = new java.io.ByteArrayOutputStream()
      Video.writeMjpegAvi(Seq.fill((1 + id % 3).toInt)(jpg), 8, 8,
        (5 + id % 10).toInt, bos)
      bos.toByteArray
    }
    t(s, dir).documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        MediaFiles.audioMetadata(wavUdf(col("doc_id"))).as("am"),
        MediaFiles.imageFileMetadata(pngUdf(col("doc_id"))).as("im"),
        MediaFiles.videoMetadata(aviUdf(col("doc_id"))).as("vm"))
      .select(col("doc_id"),
        col("am.sample_rate").as("a_rate"),
        col("am.frames").cast("long").as("a_frames"),
        col("am.subtype").as("a_subtype"),
        col("im.width").as("i_w"), col("im.height").as("i_h"),
        col("im.format").as("i_fmt"), col("im.mode").as("i_mode"),
        col("vm.frame_count").as("v_frames"),
        col("vm.width").as("v_w"),
        round(col("vm.time_base") * 1e6).cast("long").as("v_us_per_frame"))
      .orderBy("doc_id")
  }

  val fnMediaMetadataSql =
    """SELECT doc_id,
      |  8000 + (doc_id % 4) * 2000 AS a_rate,
      |  100 + doc_id % 50 AS a_frames,
      |  'PCM_16' AS a_subtype,
      |  1 + doc_id % 16 AS i_w, 1 + doc_id % 9 AS i_h,
      |  'PNG' AS i_fmt, 'RGB' AS i_mode,
      |  1 + doc_id % 3 AS v_frames,
      |  CAST(8 AS BIGINT) AS v_w,
      |  CAST(floor(1000000 / (5 + doc_id % 10)) AS BIGINT) AS v_us_per_frame
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "fn_media_metadata" -> (fn_media_metadata _),
    "llm_generate" -> (llm_generate _),
    "tokenize_roundtrip" -> (tokenize_roundtrip _),
    "tokenize_pretrained" -> (tokenize_pretrained _),
    "multimodal_pipeline" -> (multimodal_pipeline _),
    "multimodal_decode" -> (multimodal_decode _),
    "multimodal_audio" -> (multimodal_audio _),
    "multimodal_frames" -> (multimodal_frames _),
    "multimodal_video_frames" -> (multimodal_video_frames _),
    "fn_file" -> (fn_file _),
    "ai_embed_text" -> (ai_embed_text _),
    "ai_embed_http" -> (ai_embed_http _),
    "ai_embed_image" -> (ai_embed_image _),
    "ai_classify_text" -> (ai_classify_text _),
    "ai_classify_image" -> (ai_classify_image _),
    "udf_stateful" -> (udf_stateful _),
    "udf_generator" -> (udf_generator _),
    "udf_process" -> (udf_process _),
    "streaming_window" -> (streaming_window _),
    "streaming_kafka_window" -> (streaming_kafka_window _),
    "streaming_sessions" -> (streaming_sessions _),
    "streaming_sessions_state" -> (streaming_sessions_state _),
    "streaming_sessions_tws" -> (streaming_sessions_tws _),
    "streaming_join" -> (streaming_join _),
    "streaming_dedup" -> (streaming_dedup _),
    "streaming_dedup_watermark" -> (streaming_dedup_watermark _),
    "streaming_neardup" -> (streaming_neardup _),
    "streaming_enrich" -> (streaming_enrich _),
    "streaming_delta_sink" -> (streaming_delta_sink _),
    "streaming_kafka_to_delta" -> (streaming_kafka_to_delta _))

  val oracle: Map[String, String] = Map(
    "fn_media_metadata" -> fnMediaMetadataSql,
    "llm_generate" -> llmGenerateSql,
    "tokenize_roundtrip" -> tokenizeRoundtripSql,
    "tokenize_pretrained" -> tokenizePretrainedSql,
    "multimodal_pipeline" -> multimodalPipelineSql,
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_audio" -> multimodalAudioSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_video_frames" -> multimodalVideoFramesSql,
    "fn_file" -> fnFileSql,
    "ai_embed_text" -> aiEmbedTextSql,
    "ai_embed_http" -> aiEmbedHttpSql,
    "ai_embed_image" -> aiEmbedImageSql,
    "ai_classify_text" -> aiClassifyTextSql,
    "ai_classify_image" -> aiClassifyImageSql,
    "udf_stateful" -> udfStatefulSql,
    "udf_generator" -> udfGeneratorSql,
    "udf_process" -> udfProcessSql,
    "streaming_window" -> streamingWindowSql,
    "streaming_kafka_window" -> streamingKafkaWindowSql,
    "streaming_sessions" -> streamingSessionsSql,
    "streaming_sessions_state" -> streamingSessionsSql,
    "streaming_sessions_tws" -> streamingSessionsSql,
    "streaming_join" -> streamingJoinSql,
    "streaming_dedup" -> streamingDedupSql,
    "streaming_dedup_watermark" -> streamingDedupSql,
    "streaming_neardup" -> streamingNeardupSql,
    "streaming_enrich" -> streamingEnrichSql,
    "streaming_delta_sink" -> streamingDeltaSinkSql,
    "streaming_kafka_to_delta" -> streamingKafkaToDeltaSql)
}
