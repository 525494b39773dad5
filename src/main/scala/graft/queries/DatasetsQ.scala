package graft.queries

import graft.Tables
import graft.datasets.Datasets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle rows for the `daft.datasets` convenience loaders (VERDICT r12
  * #5): each query BUILDS a deterministic on-disk dataset layout from the
  * driver fixtures (the same bounded-fixture pattern as `queries/Io.scala`),
  * loads it back through [[graft.datasets.Datasets]], and projects columns
  * the DuckDB oracle can reproduce from the source tables. */
object DatasetsQ {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  private def gzipLines(path: java.nio.file.Path, lines: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def listWarcs(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val d = dir.toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".warc")).map(_.toPath).sortBy(_.toString).toSeq
  }

  /** common_crawl: fake CC layout — crawl manifest (`wet.paths.gz` of
    * relative paths) over two segments of WARC files written from the
    * documents table; the loader selects ONE segment with `num_files`
    * capped at that segment's (single) file. Oracle = the same documents
    * slice. */
  def datasets_common_crawl(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_datasets_cc_${math.abs(dir.hashCode)}"
    val crawl = "CC-MAIN-TEST"
    val segA = "1111111111111.11"
    val segB = "2222222222222.22"
    val done = new java.io.File(s"$root/_DONE")
    if (!done.exists) {
      val docs = t(s, dir).documents
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          concat(lit("https://corpus.invalid/doc/"), col("doc_id")).as("uri"))
      def segDir(seg: String) = s"$root/crawl-data/$crawl/segments/$seg/wet"
      // segment A in ONE file so num_files=1 is deterministic
      graft.sources.Warc.write(
        docs.filter(col("doc_id") < 200).coalesce(1), segDir(segA),
        "payload", "uri", "doc_id")
      graft.sources.Warc.write(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 400).repartition(2),
        segDir(segB), "payload", "uri", "doc_id")
      val rootP = java.nio.file.Paths.get(root)
      val rel = Seq(segA, segB).flatMap(seg =>
        listWarcs(java.nio.file.Paths.get(segDir(seg))).map(rootP.relativize(_).toString))
      gzipLines(java.nio.file.Paths.get(s"$root/crawl-data/$crawl/wet.paths.gz"), rel)
      done.createNewFile()
    }
    Datasets.commonCrawl(s, root, crawl,
        segment = Some(segA), content = "text", numFiles = Some(1))
      .select(
        element_at(split(col("WARC-Target-URI"), "/"), -1).cast("long").as("doc_id"),
        decode(col("warc_content"), "UTF-8").as("text"))
      .orderBy("doc_id")
  }

  val datasetsCommonCrawlSql =
    "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id"

  /** robot episodes: lerobot/droid-style layout — `meta/episodes.parquet`
    * + one MCAP container per episode (events rows as messages, topic
    * `obs/<event_id % 2>`) — loaded back with a topic pushdown and the
    * broadcast metadata join. Oracle = the same events slice. */
  def datasets_robot_episodes(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_datasets_robot_${math.abs(dir.hashCode)}"
    val done = new java.io.File(s"$root/_DONE")
    if (!done.exists) {
      val evs = t(s, dir).events.filter(col("event_id") < 800)
        .select(col("event_id"),
          concat(lit("obs/"), (col("event_id") % 2).cast("string")).as("topic"),
          (col("event_id") * 1000000L).as("log_time"),
          (col("event_id") * 1000000L).as("publish_time"),
          col("event_id").cast("int").as("sequence"),
          col("event_type").as("data"),
          (col("event_id") / 200).cast("long").as("episode_id"))
      val epDir = new java.io.File(s"$root/episodes")
      epDir.mkdirs()
      (0L until 4L).foreach { ep =>
        val tmp = s"$root/__tmp_ep$ep"
        graft.sources.Mcap.write(
          evs.filter(col("episode_id") === ep).coalesce(1).sortWithinPartitions("event_id"),
          tmp, "topic", "log_time", "publish_time", "sequence", "data")
        val part = Option(new java.io.File(tmp).listFiles())
          .getOrElse(Array.empty).filter(_.getName.endsWith(".mcap")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$root/episodes/episode_$ep.mcap"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      s.createDataset((0L until 4L).map(ep => (ep, s"task_${ep % 2}")).toSeq)(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.STRING))
        .toDF("episode_id", "task")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/meta/episodes.parquet")
      done.createNewFile()
    }
    Datasets.robotEpisodes(s, root, topics = Some(Seq("obs/0")))
      .select(col("episode_id"), col("sequence").cast("long").as("sequence"),
        col("data"), col("task"))
      .orderBy("sequence")
  }

  val datasetsRobotEpisodesSql =
    """SELECT event_id // 200 AS episode_id,
      |  event_id AS sequence, event_type AS data,
      |  'task_' || CAST((event_id // 200) % 2 AS VARCHAR) AS task
      |FROM events
      |WHERE event_id < 800 AND event_id % 2 = 0
      |ORDER BY sequence""".stripMargin

  /** LeRobot v3 (ref `daft/datasets/lerobot.py`): builds the FULL v3 layout
    * from the events table — `meta/info.json`, sharded `meta/episodes`
    * parquet (with `meta/ *`, `stats/ *` and `videos/{k}/ *` families to
    * exercise the exclusion contract), `data/chunk-NNN/file-NNN.parquet`
    * frame shards, `meta/tasks.parquet`, and two MJPEG shards under
    * `videos/observation.image/` packing 3 episodes each — then reads it
    * back with `lerobotRead(loadVideoFrames)` and verifies the DECODED,
    * timestamp-aligned frame's actual pixels per row (global frame number
    * = episode_index×50 + frame_index = the original event_id, so a wrong
    * shard, a wrong from_timestamp offset, or off-by-one alignment flips
    * `frame_ok`). Oracle = the same events slice with frame_ok TRUE. */
  def datasets_lerobot(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Images, Video}
    val fps = 10
    val epLen = 50 // frames per episode; 3 episodes per shard
    val root = s"/tmp/graft_datasets_lerobot_${math.abs(dir.hashCode)}"
    val done = new java.io.File(s"$root/_DONE")
    if (!done.exists) {
      val evs = t(s, dir).events.filter(col("event_id") < 6L * epLen)
        .select(
          (col("event_id") / epLen).cast("long").as("episode_index"),
          (col("event_id") % epLen).cast("long").as("frame_index"),
          ((col("event_id") % epLen) / lit(fps.toDouble)).as("timestamp"),
          col("event_type").as("action"))
      (0 to 1).foreach { f =>
        evs.filter(col("episode_index") >= 3L * f && col("episode_index") < 3L * (f + 1))
          .withColumn("data/chunk_index", lit(0))
          .withColumn("data/file_index", lit(f))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$root/data/chunk-000/file-00$f.parquet")
      }
      s.range(0, 6).toDF("episode_index")
        .select(col("episode_index"),
          lit(epLen).as("length"),
          concat(lit("task_"), (col("episode_index") % 2).cast("string")).as("tasks"),
          lit(0).as("meta/episodes/chunk_index"),
          lit(0).as("meta/episodes/file_index"),
          lit(1.5).as("stats/action/mean"),
          lit(0).as("videos/observation.image/chunk_index"),
          (col("episode_index") / 3).cast("int").as("videos/observation.image/file_index"),
          ((col("episode_index") % 3) * lit(epLen.toDouble / fps))
            .as("videos/observation.image/from_timestamp"),
          ((col("episode_index") % 3 + 1) * lit(epLen.toDouble / fps))
            .as("videos/observation.image/to_timestamp"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/meta/episodes/chunk-000/file-000.parquet")
      s.range(0, 2).toDF("task_index")
        .select(col("task_index"),
          concat(lit("task_"), col("task_index").cast("string")).as("task"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/meta/tasks.parquet")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/meta/info.json"),
        ("""{"codebase_version":"v3.0",""" +
          """"data_path":"data/chunk-{chunk_index:03d}/file-{file_index:03d}.parquet",""" +
          """"video_path":"videos/{video_key}/chunk-{chunk_index:03d}/file-{file_index:03d}.mp4",""" +
          s""""fps":$fps,""" +
          """"features":{"action":{"dtype":"string"},"timestamp":{"dtype":"float64"},""" +
          """"observation.image":{"dtype":"video"}}}""").getBytes("UTF-8"))
      (0 to 1).foreach { f =>
        val frames = (0 until 3 * epLen).map { i =>
          val g = f * 3 * epLen + i
          Images.encode(Images.decode(Images.solidPng(16, 16,
            20 + (g * 3) % 160, 30 + (g * 7) % 150, 40 + (g * 11) % 160)).get, "jpg")
        }
        val p = java.nio.file.Paths.get(
          s"$root/videos/observation.image/chunk-000/file-00$f.mp4")
        java.nio.file.Files.createDirectories(p.getParent)
        val out = java.nio.file.Files.newOutputStream(p)
        try Video.writeMjpegAvi(frames, 16, 16, fps, out) finally out.close()
      }
      done.createNewFile()
    }
    val meanCh = udf { (bytes: Array[Byte], ch: Int) =>
      Images.decode(bytes).map { img =>
        var sum = 0L
        var i = ch
        while (i < img.data.length) { sum += img.data(i) & 0xff; i += img.channels }
        sum.toDouble / (img.width * img.height)
      }
    }
    val eid = (col("episode_index") * epLen + col("frame_index")).cast("int")
    val frame = col("`observation.image`")
    Datasets.lerobotRead(s, root, loadVideoFrames = Seq("observation.image"))
      .select(col("episode_index"), col("frame_index"), col("tasks"),
        col("timestamp").as("ts"),
        (abs(meanCh(frame, lit(0)) - (lit(20) + (eid * 3) % 160)) <= 6 &&
          abs(meanCh(frame, lit(1)) - (lit(30) + (eid * 7) % 150)) <= 6 &&
          abs(meanCh(frame, lit(2)) - (lit(40) + (eid * 11) % 160)) <= 6).as("frame_ok"))
      .orderBy("episode_index", "frame_index")
  }

  val datasetsLerobotSql =
    """SELECT event_id // 50 AS episode_index, event_id % 50 AS frame_index,
      |  'task_' || CAST((event_id // 50) % 2 AS VARCHAR) AS tasks,
      |  CAST(event_id % 50 AS DOUBLE) / 10 AS ts, true AS frame_ok
      |FROM events WHERE event_id < 300
      |ORDER BY episode_index, frame_index""".stripMargin

  val queries: Map[String, Q] = Map(
    "datasets_common_crawl" -> (datasets_common_crawl _),
    "datasets_robot_episodes" -> (datasets_robot_episodes _),
    "datasets_lerobot" -> (datasets_lerobot _))

  val oracle: Map[String, String] = Map(
    "datasets_common_crawl" -> datasetsCommonCrawlSql,
    "datasets_robot_episodes" -> datasetsRobotEpisodesSql,
    "datasets_lerobot" -> datasetsLerobotSql)
}
