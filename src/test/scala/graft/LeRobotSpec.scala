package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datasets.Datasets
import graft.ops.{Images, Video}

/** LeRobot v3 loader (ref `daft/datasets/lerobot.py`): info.json version
  * gate, episode-metadata column-family exclusion flags, shard path
  * construction, frame expansion join, timestamp-aligned video decode, and
  * the tasks parquet/jsonl fallback. */
class LeRobotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val fps = 10
  private val epLen = 20 // frames per episode; 2 episodes per shard

  /** Minimal v3 layout: 4 episodes over 2 video shards; frame rows carry
    * (episode_index, frame_index, timestamp); frame pixels encode the
    * GLOBAL frame number so alignment mistakes are visible. */
  private lazy val root: String = {
    val r = "/tmp/graft_lerobot_spec"
    val done = new java.io.File(s"$r/_DONE")
    if (!done.exists) {
      val rows = for (ep <- 0 until 4; fr <- 0 until epLen)
        yield (ep.toLong, fr.toLong, fr.toDouble / fps, s"act_${ep}_$fr")
      rows.toDF("episode_index", "frame_index", "timestamp", "action")
        .withColumn("data/chunk_index", lit(0))
        .withColumn("data/file_index", lit(0))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$r/data/chunk-000/file-000.parquet")
      (0L until 4L).map(ep => (ep, epLen.toLong, s"task_${ep % 2}",
          7, 7, 2.25, 0, (ep / 2).toInt,
          (ep % 2) * (epLen.toDouble / fps), (ep % 2 + 1) * (epLen.toDouble / fps)))
        .toDF("episode_index", "length", "tasks",
          "meta/episodes/chunk_index", "meta/episodes/file_index",
          "stats/action/mean", "videos/cam/chunk_index", "videos/cam/file_index",
          "videos/cam/from_timestamp", "videos/cam/to_timestamp")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$r/meta/episodes/chunk-000/file-000.parquet")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$r/meta/info.json"),
        (s"""{"codebase_version":"v3.0","data_path":"d","video_path":"v","fps":$fps,""" +
          """"features":{"action":{"dtype":"string"},"cam":{"dtype":"video"}}}""")
          .getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$r/meta/tasks.jsonl"),
        """{"task_index":0,"task":"task_0"}
          |{"task_index":1,"task":"task_1"}""".stripMargin.getBytes("UTF-8"))
      (0 to 1).foreach { f =>
        val frames = (0 until 2 * epLen).map { i =>
          val g = f * 2 * epLen + i
          Images.encode(Images.decode(
            Images.solidPng(16, 16, (g * 5) % 200, 0, 0)).get, "jpg")
        }
        val p = java.nio.file.Paths.get(s"$r/videos/cam/chunk-000/file-00$f.mp4")
        java.nio.file.Files.createDirectories(p.getParent)
        val out = java.nio.file.Files.newOutputStream(p)
        try Video.writeMjpegAvi(frames, 16, 16, fps, out) finally out.close()
      }
      done.createNewFile()
    }
    r
  }

  test("info.json parses and gates on v3.0") {
    val info = Datasets.lerobotInfo(root)
    assert(info.fps == 10.0 && info.videoKeys == Seq("cam"))
    val bad = "/tmp/graft_lerobot_spec_bad"
    new java.io.File(s"$bad/meta").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$bad/meta/info.json"),
      """{"codebase_version":"v2.1","features":{}}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Datasets.lerobotInfo(bad))
    assert(e.getMessage.contains("v3.0"))
  }

  test("read_episodes hides meta/stats/video-locator families by default") {
    val eps = Datasets.lerobotEpisodes(spark, root)
    assert(eps.count() == 4)
    assert(eps.columns.toSet ==
      Set("episode_index", "length", "tasks", "videos/cam/video"))
    val paths = eps.select(col("`videos/cam/video`")).as[String].collect().toSet
    assert(paths == Set(s"$root/videos/cam/chunk-000/file-000.mp4",
      s"$root/videos/cam/chunk-000/file-001.mp4"))
    val full = Datasets.lerobotEpisodes(spark, root, includeMeta = true,
      includeStats = true, includeVideoMetadata = true)
    assert(full.columns.contains("stats/action/mean") &&
      full.columns.contains("meta/episodes/chunk_index") &&
      full.columns.contains("videos/cam/from_timestamp"))
  }

  test("frame expansion joins episode metadata onto every frame") {
    val eps = Datasets.lerobotEpisodes(spark, root)
      .filter(col("episode_index") < 2)
    val frames = Datasets.lerobotEpisodeFrames(spark, root, eps)
    assert(frames.count() == 2 * epLen)
    assert(!frames.columns.contains("data/chunk_index"))
    assert(frames.columns.contains("tasks") && frames.columns.contains("action"))
  }

  test("read decodes the timestamp-aligned frame from the right shard") {
    val df = Datasets.lerobotRead(spark, root, loadVideoFrames = Seq("cam"))
    assert(df.count() == 4 * epLen)
    // locator families hidden again; decoded column present
    assert(!df.columns.exists(_.startsWith("videos/")))
    val checked = df.select(col("episode_index"), col("frame_index"), col("cam"))
      .collect()
    checked.foreach { r =>
      val g = (r.getLong(0) * epLen + r.getLong(1)).toInt
      val img = Images.decode(r.getAs[Array[Byte]](2)).get
      var sum = 0L
      var i = 0
      while (i < img.data.length) { sum += img.data(i) & 0xff; i += img.channels }
      val meanR = sum.toDouble / (img.width * img.height)
      assert(math.abs(meanR - (g * 5) % 200) <= 6,
        s"episode ${r.getLong(0)} frame ${r.getLong(1)}: mean $meanR vs ${(g * 5) % 200}")
    }
  }

  test("unknown video key is rejected") {
    val e = intercept[IllegalArgumentException](
      Datasets.lerobotRead(spark, root, loadVideoFrames = Seq("nope")))
    assert(e.getMessage.contains("video feature"))
  }

  test("tasks fall back to jsonl when parquet is absent") {
    val tasks = Datasets.lerobotTasks(spark, root)
      .orderBy("task_index").select("task").as[String].collect()
    assert(tasks.toSeq == Seq("task_0", "task_1"))
  }
}
