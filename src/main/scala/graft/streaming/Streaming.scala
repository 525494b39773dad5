package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
import org.apache.spark.sql.types._

/** Structured Streaming layer — a superset of the reference (SURVEY §2.9:
  * Daft has no watermark/trigger engine; its "streaming" is pipelined batch).
  * Here: watermarked tumbling-window aggregation and gap-based
  * sessionization via flatMapGroupsWithState, driven from the bounded
  * events table so results are oracle-checkable. */
object Streaming {

  /** Stage the single events.parquet file into a directory so it can serve
    * as a file-stream source. */
  private def stageDir(sfDir: String): String = {
    val out = Paths.get(s"/tmp/graft_stream/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Files.createDirectories(out)
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      out.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    out.toString
  }

  // raw file schema (ts is TIMESTAMP(NANOS) => read as long ns with
  // nanosAsLong, converted to a µs timestamp below)
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windows per event_type with a watermark; complete
    * output mode over the bounded source yields the full history. */
  def windowedCounts(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val dir = stageDir(sfDir)
    val events = spark.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").cast("date").as("day"),
        hour(col("window.start")).as("hr"),
        col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** End-to-end composition of the round-5 pieces: events flow through a
    * Kafka broker (MiniBroker, offsets assigned per partition), the
    * `graft-kafka` micro-batch SOURCE reads them, and a watermarked
    * tumbling-window aggregation runs on the event-time carried in the
    * Kafka `timestamp_ms` field — the canonical "stream the firehose,
    * window by event time" production shape, one task per Kafka
    * partition end to end. */
  def kafkaWindowed(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val broker = new graft.sources.kafka.MiniBroker
    try {
      val evs = graft.Tables(spark, sfDir).events
        .filter(col("event_id") < 3000)
        .select(
          col("event_id"),
          (unix_micros(col("ts")) / 1000L).cast("long").as("ms"),
          concat_ws(",", col("event_type"), col("value")).as("payload"))
        .collect() // bounded fixture: the broker under test needs the rows
      evs.foreach { r =>
        broker.append("events", (r.getLong(0) % 4).toInt, r.getLong(1),
          null, r.getString(2).getBytes("UTF-8"))
      }
      val parsed = spark.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("topics", "events")
        .load()
        .select(
          timestamp_millis(col("timestamp_ms")).as("ts"),
          split(decode(col("value"), "UTF-8"), ",").as("kv"))
        .select(col("ts"), col("kv")(0).as("event_type"),
          col("kv")(1).cast("double").as("value"))
      val agg = parsed
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(
          col("window.start").cast("date").as("day"),
          hour(col("window.start")).as("hr"),
          col("event_type"), col("n"), col("total_value"))
      val q = agg.writeStream
        .outputMode(OutputMode.Complete)
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
      spark.table(queryName)
    } finally broker.close()
  }

  /** The full production pipeline in ONE streaming query: Kafka wire
    * source → watermarked tumbling window → exactly-once Delta sink —
    * with a RESTART mid-stream. Phase 1 drains half the fixture and
    * stops; phase 2 reopens the SAME checkpoint (Kafka offsets + window
    * state recovered) with the rest plus a far-future sentinel that
    * pushes the watermark past every real window so append mode flushes
    * them; phase 3 reopens once more with no new data (a replayed/empty
    * batch must be a no-op thanks to the txn action). Loss would drop a
    * window row; offset or batch replay would double one — either breaks
    * the oracle equality on the Delta read-back. */
  def kafkaToDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val broker = new graft.sources.kafka.MiniBroker
    try {
      val tag = math.abs(sfDir.hashCode)
      val table = s"/tmp/graft_k2d_$tag"
      val ckpt = s"/tmp/graft_k2d_ckpt_$tag"
      graft.sources.Delta.deleteTable(table)
      graft.sources.PartitionedFiles.deleteRecursively(Paths.get(ckpt))
      val evs = graft.Tables(spark, sfDir).events
        .filter(col("event_id") < 3000)
        .select(
          col("event_id"),
          (unix_micros(col("ts")) / 1000L).cast("long").as("ms"),
          concat_ws(",", col("event_type"), col("value")).as("payload"))
        .collect() // bounded fixture: the broker under test needs the rows
      val maxMs = evs.map(_.getLong(1)).max
      val sentinelMs = maxMs + 2 * 24 * 3600 * 1000L
      def feed(rows: Seq[org.apache.spark.sql.Row]): Unit = rows.foreach { r =>
        broker.append("events", (r.getLong(0) % 4).toInt, r.getLong(1),
          null, r.getString(2).getBytes("UTF-8"))
      }
      def runOnce(): Unit = {
        val parsed = spark.readStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrap)
          .option("topics", "events")
          .load()
          .select(
            timestamp_millis(col("timestamp_ms")).as("ts"),
            split(decode(col("value"), "UTF-8"), ",").as("kv"))
          .select(col("ts"), col("kv")(0).as("event_type"),
            col("kv")(1).cast("double").as("value"))
        val agg = parsed
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
          .select(col("window.start").as("w_start"),
            col("event_type"), col("n"), col("total_value"))
        val q = DeltaSink.start(agg, table, ckpt, appId = "graft-kafka-to-delta")
        q.awaitTermination(300000)
      }
      val (first, second) = evs.toSeq.splitAt(evs.length / 2)
      feed(first)
      runOnce() // phase 1: partial drain, stop mid-stream
      feed(second)
      broker.append("events", 0, sentinelMs, null, "view,0.0".getBytes("UTF-8"))
      runOnce() // phase 2: restart from the checkpoint, drain the rest
      runOnce() // phase 3: nothing new — replay must be a no-op
      graft.sources.Delta.read(spark, table)
        .filter(col("w_start") < timestamp_millis(lit(maxMs + 24 * 3600 * 1000L)))
        .select(
          col("w_start").cast("date").as("day"),
          hour(col("w_start")).as("hr"),
          col("event_type"), col("n"), col("total_value"))
    } finally broker.close()
  }

  /** Stream-static enrichment join: the streaming fact side joins a
    * static dimension — broadcast, stateless (no stream-stream state, no
    * watermark needed), the standard shape for decorating an event
    * firehose with reference data at any scale. */
  def enrichJoin(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val dir = stageDir(sfDir)
    import spark.implicits._
    val events = spark.readStream.schema(rawSchema).parquet(dir)
    val dim = Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("signup", "growth"), ("error", "ops"))
      .toDF("event_type", "category")
    val agg = events.join(broadcast(dim), Seq("event_type"))
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming exact dedup: the staged source is duplicated (every event
    * arrives twice), then `dropDuplicates` on the key inside the stream —
    * state-backed streaming dedup, the streaming counterpart of
    * `Dedup.exact`. Aggregated counts must equal the single-copy batch
    * counts for the oracle to match. */
  def dedupStream(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val base = stageDir(sfDir)
    val dir = Paths.get(s"/tmp/graft_stream_dup/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Files.createDirectories(dir)
    for (n <- Seq("copy_a.parquet", "copy_b.parquet"))
      Files.copy(Paths.get(s"$base/events.parquet"), dir.resolve(n),
        StandardCopyOption.REPLACE_EXISTING)
    val events = spark.readStream.schema(rawSchema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val deduped = events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
    val q = deduped.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming ingestion into a Delta table ([[DeltaSink]]): the events
    * stream drains through exactly-once txn-stamped micro-batch commits,
    * then the table is read back through the log-replay reader — the
    * write-side analog of the reference's streaming `write_deltalake`. */
  def deltaIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stageDir(sfDir)
    val tag = math.abs(sfDir.hashCode)
    val table = s"/tmp/graft_stream_delta_$tag"
    val ckpt = s"/tmp/graft_stream_delta_ckpt_$tag"
    graft.sources.Delta.deleteTable(table)
    graft.sources.PartitionedFiles.deleteRecursively(Paths.get(ckpt))
    val events = spark.readStream.schema(rawSchema).parquet(dir)
      .select("event_id", "event_type", "value")
    val q = DeltaSink.start(events, table, ckpt, appId = "graft-events-ingest")
    q.awaitTermination(300000)
    graft.sources.Delta.read(spark, table)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
  }

  case class Ev(user_id: Long, tsMicros: Long)

  /** O(1) per-user sessionization state: last seen timestamp + counters. */
  case class SessState(lastTs: Long, sessions: Int, events: Int)

  /** Gap-based sessionization with flatMapGroupsWithState (ref §2.9 —
    * KeyValueGroupedDataset custom state): sessions close after a 30-minute
    * silence; emits (user_id, n_sessions, n_events). */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val dir = stageDir(sfDir)
    val gapMicros = gapMinutes * 60L * 1000000L

    val events = spark.readStream.schema(rawSchema).parquet(dir)
      .select(col("user_id"), expr("ts div 1000").as("tsMicros"))
      .as[Ev]

    // count closed+open sessions per user. State is O(1) per user —
    // (lastTs, sessions, events) — not the full timestamp history, which
    // would grow unbounded at stream scale; each batch's rows are sorted
    // locally and folded against the carried lastTs (late rows older than
    // the carried lastTs would need the watermark contract, as anywhere).
    val counts = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, (Long, Int, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = rows.map(_.tsMicros).toArray.sorted
          val st0 = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0))
          val st = sorted.foldLeft(st0) { (st, ts) =>
            val newSession = st.events == 0 || ts - st.lastTs > gapMicros
            SessState(ts, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator((uid, st.sessions, st.events))
      }
      .toDF("user_id", "n_sessions", "n_events")

    val name = s"graft_sessions_${System.nanoTime()}"
    val q = counts.writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
