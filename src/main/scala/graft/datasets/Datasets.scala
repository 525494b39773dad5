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
    val files = paths.as(org.apache.spark.sql.Encoders.STRING).collect().toSeq
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
}
