package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Mcap, Warc}

/** Convenience dataset loaders (ref `daft/datasets/`): thin, contract-
  * faithful plumbing over the existing container sources — the reference's
  * `daft.datasets.common_crawl()` resolves a crawl manifest into WARC file
  * paths and hands them to `read_warc`; `lerobot.py`/`droid.py` resolve an
  * episode layout and expand per-frame rows over the container scan.
  *
  * Offline adaptation: the loaders take a `root` prefix (local dir here;
  * `s3://commoncrawl` / `https://data.commoncrawl.org` on a cluster with
  * cloud connectors — the path math is identical, mirroring
  * `common_crawl.py:15-34`'s source-to-prefix table). */
object Datasets {

  /** Map the reference's `content` argument onto a manifest file type
    * (`common_crawl.py:78`): raw/warc → full HTTP responses, text/wet →
    * extracted plain text, metadata/wat → page metadata. */
  private[datasets] def contentFileType(content: String): String = content match {
    case "raw" | "warc"     => "warc"
    case "text" | "wet"     => "wet"
    case "metadata" | "wat" => "wat"
    case other => throw new IllegalArgumentException(
      s"common_crawl content must be raw|text|metadata|warc|wet|wat, got '$other'")
  }

  /** Hard cap on the driver-side manifest collect in [[commonCrawl]]: a
    * real crawl manifest is ~90k lines (~10 MB of paths); 1M entries is
    * an order of magnitude past any published crawl while still bounding
    * driver memory to ~100 MB of path strings. */
  val ManifestCollectCap = 1000000L

  /** Common Crawl loader (ref `daft/datasets/common_crawl.py:78`):
    * resolves `{root}/crawl-data/{crawl}/{file_type}.paths.gz` (the crawl's
    * published gzipped manifest of relative file paths), optionally filters
    * to one `segment` (substring match, like the reference), optionally
    * limits to `numFiles`, and reads the survivors through the WARC source.
    *
    * Scale shape: the manifest is bounded (~90k lines for a real crawl) and
    * collected driver-side — exactly what the reference's `to_pydict()`
    * does — while the WARC payload scan distributes one file per task via
    * [[Warc.read]]'s binaryFile listing. */
  def commonCrawl(spark: SparkSession, root: String, crawl: String,
      segment: Option[String] = None, content: String = "raw",
      numFiles: Option[Int] = None): DataFrame = {
    numFiles.foreach(n => require(n > 0, s"num_files must be positive, got $n"))
    val ft = contentFileType(content)
    val manifest = s"$root/crawl-data/$crawl/$ft.paths.gz"
    // .gz text decompresses transparently in Spark's text source
    var paths = spark.read.textFile(manifest)
      .toDF("text")
      .select(concat(lit(s"$root/"), col("text")).as("url"))
    segment.foreach(seg => paths = paths.filter(col("url").contains(seg)))
    numFiles.foreach(n => paths = paths.limit(n))
    // Driver-side collect guard (VERDICT r14 #4-minor, same pattern as
    // Similarity.bruteForceTopK): real crawl manifests are ~90k lines, so
    // the collect is metadata-plane — but if `root` ever points at user
    // data the manifest could be corpus-scaled. The limit bounds the
    // fetch itself (cap+1 rows max reach the driver), then the overflow
    // row fails loudly instead of OOMing the driver.
    val files = paths.limit((ManifestCollectCap + 1).toInt)
      .as(org.apache.spark.sql.Encoders.STRING).collect().toSeq
    require(files.size <= ManifestCollectCap,
      s"common_crawl manifest $manifest exceeds $ManifestCollectCap entries " +
        "— this loader collects the manifest driver-side (bounded for real " +
        "crawls); filter to a segment= or pass num_files= to subset it")
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(
        s"common_crawl: no files matched crawl=$crawl segment=$segment in $manifest")
    Warc.read(spark, files)
  }

  /** LeRobot/DROID-style episode-frame loader (ref
    * `daft/datasets/lerobot.py`, `droid.py`): an episode DATASET is a
    * metadata table plus per-episode container files; the loader expands
    * container messages into frame rows and re-attaches episode metadata.
    * Adapted to the offline container we have (MCAP — the robotics
    * standard the reference's droid corpus also ships):
    * `{root}/meta/episodes.parquet` (episode_id, task, any extra columns)
    * + `{root}/episodes/episode_<id>.mcap`.
    *
    * Scale shape: frames scan one MCAP file per task ([[Mcap.read]]);
    * episode metadata is dataset-bounded and broadcasts onto the frame
    * rows; an optional topic filter prunes inside the container scan
    * (never post-hoc). */
  def robotEpisodes(spark: SparkSession, root: String,
      topics: Option[Seq[String]] = None): DataFrame = {
    val meta = spark.read.parquet(s"$root/meta/episodes.parquet")
    val frames = Mcap.read(spark, s"$root/episodes/*.mcap", topics = topics)
      // episode id from the file name: episode_<id>.mcap
      .withColumn("episode_id",
        regexp_extract(input_file_name(), "episode_(\\d+)\\.mcap", 1).cast("long"))
    frames.join(broadcast(meta), Seq("episode_id"))
  }

  // ---- LeRobot v3 (ref `daft/datasets/lerobot.py`) -------------------------

  /** Parsed `meta/info.json` (ref `lerobot.py:188-200` `_read_info`):
    * version gate + fps + which feature keys are video columns. */
  final case class LeRobotInfo(codebaseVersion: String, dataPath: String,
      videoPath: String, fps: Double, featureDtypes: Map[String, String]) {
    def videoKeys: Seq[String] =
      featureDtypes.filter(_._2 == "video").keys.toSeq.sorted
  }

  def lerobotInfo(root: String): LeRobotInfo = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new java.io.File(s"$root/meta/info.json"))
    val ver = node.path("codebase_version").asText("")
    require(ver == "v3.0",
      s"lerobot loader supports LeRobot datasets of v3.0 only, got '$ver'")
    import scala.jdk.CollectionConverters._
    val dtypes = node.path("features").fields().asScala
      .map(e => e.getKey -> e.getValue.path("dtype").asText("")).toMap
    LeRobotInfo(ver, node.path("data_path").asText(""),
      node.path("video_path").asText(""), node.path("fps").asDouble(30.0), dtypes)
  }

  private def dropFamily(df: DataFrame, pred: String => Boolean): DataFrame = {
    val cs = df.columns.filter(pred)
    if (cs.isEmpty) df else df.drop(cs.toIndexedSeq: _*)
  }

  /** One row per episode (ref `lerobot.py:286` `read_episodes`): the sharded
    * `meta/episodes` parquet shard metadata, with the bookkeeping (`meta/ *`),
    * stats (`stats/ *`) and per-episode video-locator (`videos/{k}/ *`)
    * column families dropped unless asked for, plus a constructed
    * `videos/{k}/video` shard path per video feature
    * (`{root}/videos/{k}/chunk-NNN/file-NNN.mp4` from the episode's
    * chunk/file indices — `lerobot.py:330-337`). */
  def lerobotEpisodes(spark: SparkSession, root: String,
      includeMeta: Boolean = false, includeStats: Boolean = false,
      includeVideoMetadata: Boolean = false): DataFrame = {
    val info = lerobotInfo(root)
    var df = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/meta/episodes")
    if (!includeMeta) df = dropFamily(df, _.startsWith("meta/"))
    if (!includeStats) df = dropFamily(df, _.startsWith("stats/"))
    // video keys can contain dots (`observation.image`) — backtick-quote
    // so col() reads one flat name, not a struct path
    for (k <- info.videoKeys)
      df = df.withColumn(s"videos/$k/video",
        concat(lit(s"$root/videos/$k/chunk-"),
          lpad(col(s"`videos/$k/chunk_index`").cast("string"), 3, "0"),
          lit("/file-"),
          lpad(col(s"`videos/$k/file_index`").cast("string"), 3, "0"),
          lit(".mp4")))
    if (!includeVideoMetadata)
      df = dropFamily(df, c => c.startsWith("videos/") && !c.endsWith("/video"))
    df
  }

  /** Expand episode rows into frame rows (ref `lerobot.py:348`
    * `load_episode_frames`): the per-frame parquet under `data/` joined to
    * the episode metadata on `episode_index`. Filter `episodes` first to
    * expand only what you need — the join prunes the frame side.
    *
    * Scale shape: the frame scan is the data-scaled side; episode metadata
    * is one bounded row per episode and broadcasts onto it. */
  def lerobotEpisodeFrames(spark: SparkSession, root: String,
      episodes: DataFrame): DataFrame = {
    val frames = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/data")
    frames.join(broadcast(episodes), Seq("episode_index"))
      .drop("data/chunk_index", "data/file_index")
  }

  /** Tasks metadata (ref `lerobot.py:381` `read_tasks`): prefers
    * `meta/tasks.parquet`, falls back to legacy `meta/tasks.jsonl`. */
  def lerobotTasks(spark: SparkSession, root: String): DataFrame = {
    val pq = new java.io.File(s"$root/meta/tasks.parquet")
    if (pq.exists) spark.read.parquet(pq.getPath)
    else spark.read.json(s"$root/meta/tasks.jsonl")
  }

  /** One row per frame (ref `lerobot.py:203` `read`), optionally with the
    * video frame aligned to each row's timestamp decoded into an image
    * column per requested camera key.
    *
    * Frame alignment follows the reference exactly: an MP4 shard packs many
    * episodes back to back, so the shard-local frame number is NOT the
    * parquet's episode-local `frame_index` — the single coordinate system is
    * the absolute shard timestamp `videos/{k}/from_timestamp + timestamp`,
    * and the matching frame is the one within half a frame period
    * (`tolerance = 1/fps/2`, `lerobot.py:261`) of it. For the fixed-rate
    * MJPEG-AVI shards the offline container can decode (general MP4 codecs
    * are ffmpeg-blocked — SURVEY §8.7), that frame is exactly
    * `round(abs_ts × fps)`.
    *
    * Scale shape: instead of the reference's per-batch open+seek UDF, the
    * decode is a distributed equi-join — [[graft.ops.Video.readFrames]]
    * streams each shard once (one task per shard, memory bounded by one
    * frame) and the join on (shard path, frame index) keeps exactly the
    * requested frames; no driver-side work, no per-row file opens. */
  def lerobotRead(spark: SparkSession, root: String,
      includeStats: Boolean = false,
      loadVideoFrames: Seq[String] = Nil): DataFrame = {
    val info = lerobotInfo(root)
    val eps = lerobotEpisodes(spark, root, includeStats = includeStats,
      includeVideoMetadata = true)
    var df = lerobotEpisodeFrames(spark, root, eps)
    for (k <- loadVideoFrames) {
      require(info.videoKeys.contains(k),
        s"'$k' is not a video feature; video keys: ${info.videoKeys.mkString(", ")}")
      val targetIdx =
        round((col(s"`videos/$k/from_timestamp`") + col("timestamp")) * info.fps)
          .cast("int")
      val vf = graft.ops.Video
        .readFrames(spark, s"$root/videos/$k/chunk-*" + "/file-*.mp4")
        .select(
          // binaryFile paths come back as file: URIs; normalize to the
          // plain local path the episode row constructed
          regexp_replace(col("path"), "^file:/*", "/").as("__shard_path"),
          col("frame_idx").as("__shard_idx"),
          col("frame_data").as(k))
      df = df
        .join(vf, col(s"`videos/$k/video`") === col("__shard_path") &&
          targetIdx === col("__shard_idx"), "left")
        .drop("__shard_path", "__shard_idx")
    }
    // restore read_episodes' default of hiding the per-episode video
    // locator columns (ref `lerobot.py:280`); decoded image columns are
    // named by their bare feature key, so the family drop leaves them
    dropFamily(df, _.startsWith("videos/"))
  }
}
