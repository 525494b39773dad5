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

  /** The events file's ACTUAL schema, probed from the parquet footer (a
    * metadata-only read — file streams require an explicit schema). The ts
    * encoding has drifted across fixture generations (ns-as-long → µs
    * TIMESTAMP_NTZ); probing instead of hard-coding keeps every stream in
    * sync with what `graft.Tables.eventTimeTs` dispatches on. */
  private def rawSchema(spark: SparkSession, sfDir: String): StructType =
    spark.read.parquet(s"$sfDir/events.parquet").schema

  /** Tumbling 1-hour windows per event_type with a watermark; complete
    * output mode over the bounded source yields the full history. */
  def windowedCounts(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val dir = stageDir(sfDir)
    val schema = rawSchema(spark, sfDir)
    val events = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", graft.Tables.eventTimeTs(schema, "ts"))
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
      val ev0 = graft.Tables(spark, sfDir).events
        .filter(col("event_id") < 3000)
      val evs = ev0
        .withColumn("__us", graft.Tables.eventTimeMicros(ev0, "ts"))
        .select(
          col("event_id"),
          expr("__us div 1000").as("ms"), // exact integer µs→ms
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
      val ev0 = graft.Tables(spark, sfDir).events
        .filter(col("event_id") < 3000)
      val evs = ev0
        .withColumn("__us", graft.Tables.eventTimeMicros(ev0, "ts"))
        .select(
          col("event_id"),
          expr("__us div 1000").as("ms"), // exact integer µs→ms
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
    val events = spark.readStream.schema(rawSchema(spark, sfDir)).parquet(dir)
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
    val schema = rawSchema(spark, sfDir)
    val events = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", graft.Tables.eventTimeTs(schema, "ts"))
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

  /** Stream-STREAM interval join: the view firehose joins the purchase
    * firehose on user within a one-hour attribution window. Both sides are
    * watermarked and the join predicate carries an event-time range, so
    * Spark can bound the join state — each side's buffered rows are
    * evicted once the other side's watermark passes the range (without the
    * time bound the state grows forever; this is THE difference between a
    * toy and a 100 TB stream-stream join). Inner-join matches emit as soon
    * as both rows are present (append mode); the memory-sink capture is
    * then aggregated per user in batch for the oracle compare. */
  def streamJoin(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val dir = stageDir(sfDir)
    val schema = rawSchema(spark, sfDir)
    def side(tpe: String, a: String) =
      spark.readStream.schema(schema).parquet(dir)
        .withColumn("ts", graft.Tables.eventTimeTs(schema, "ts"))
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${a}_user"), col("ts").as(s"${a}_ts"),
          col("value").as(s"${a}_value"))
        .withWatermark(s"${a}_ts", "1 hour")
    val views = side("view", "v")
    val buys = side("purchase", "p")
    val pairs = views.join(buys,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
    val q = pairs.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("p_value"), 2).as("purchase_value"))
  }

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * keeps a key in the dedup map only until the watermark passes its
    * event time, instead of forever ([[dedupStream]]'s `dropDuplicates`
    * state never shrinks — fine for a keyed snapshot, fatal for an
    * unbounded firehose). The duplicated source arrives in a single
    * micro-batch here (both copies inside every key's watermark window,
    * trivially), so the output equals single-copy counts; at stream scale
    * the same query runs in O(events-per-watermark-window) state. */
  def dedupWithinWatermark(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val base = stageDir(sfDir)
    val dir = Paths.get(s"/tmp/graft_stream_dupw/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Files.createDirectories(dir)
    for (n <- Seq("copy_a.parquet", "copy_b.parquet"))
      Files.copy(Paths.get(s"$base/events.parquet"), dir.resolve(n),
        StandardCopyOption.REPLACE_EXISTING)
    val schema = rawSchema(spark, sfDir)
    val events = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", graft.Tables.eventTimeTs(schema, "ts"))
    val deduped = events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
  }

  /** Streaming NEAR-duplicate suppression — MinHash-LSH over a document
    * stream with watermarked band state (the streaming counterpart of
    * `ops/Dedup.minhashLsh`; the reference has batch dedup only, this is
    * the shape a continuously-ingesting training-data pipeline needs):
    * each arriving doc's 128-hash signature is split into 8 bands of 16,
    * every band key runs through `dropDuplicatesWithinWatermark`, and a
    * doc survives iff ALL its bands were first claims — any band shared
    * with an earlier doc (exact dup or ≥~0.9-jaccard near-dup) marks it
    * a duplicate. Band state is evicted by the watermark, so state is
    * bounded by the dedup horizon, not history.
    *
    * Determinism for the oracle: the copies file is staged with a LATER
    * modification time and the source reads one file per trigger, so
    * originals claim every band in batch 1 and the exact copies arrive
    * strictly after — the kept set is exactly the originals. (In-batch-1
    * cross-doc band collisions would be a deterministic function of the
    * corpus + seed; `StreamingNearDupSpec` pins that the base corpus is
    * collision-free and exercises genuine NEAR-dup drops.) */
  def nearDupDedupStream(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val dir = Paths.get(s"/tmp/graft_stream_neardup/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    Files.createDirectories(dir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_neardup_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val dst = dir.resolve(name)
      Files.copy(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    val t0 = 1700000000000L
    // event times ADVANCE across batches (60 s apart, well inside the 1 h
    // horizon, so no band state evicts between originals and copies)
    val a = docs.withColumn("ts", timestamp_seconds(lit(t0 / 1000)))
    val b = docs.withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("ts", timestamp_seconds(lit(t0 / 1000 + 60)))
    stageOne(a, "a_originals.parquet", t0)
    stageOne(b, "b_copies.parquet", t0 + 60000)
    nearDupKeptDocs(spark, dir.toString, a.schema, queryName)
  }

  /** One (doc_id, band_key, event time) row of the near-dup stream. `ts`
    * stays a Timestamp: the row is produced by `.as[BandRow]` (a pure
    * projection), because a `.map` would sever the watermark lineage the
    * EventTimeTimeout needs. */
  case class BandRow(doc_id: Long, band_key: String, ts: java.sql.Timestamp)
  /** Band state: the claiming doc. Evicted by event-time timeout. */
  case class BandClaim(doc_id: Long)
  /** An emitted first-claim. */
  case class Claim(doc_id: Long, band_key: String)

  /** The LSH band-dedup stream over an already-staged directory of
    * (doc_id, text, ts) parquet files — one file per micro-batch, oldest
    * modification time first; returns the kept doc_ids (a doc survives
    * iff ALL its bands were first claims). Split out so specs can stage
    * hand-made corpora and assert the near-dup semantics directly.
    *
    * Band state is a `flatMapGroupsWithState` keyed by band_key, not
    * `dropDuplicatesWithinWatermark`, for two properties that operator
    * cannot give:
    *  - a DETERMINISTIC in-batch winner (min doc_id among the batch's
    *    claimants). With first-arrival-wins, two mutual near-dups in one
    *    micro-batch could split band wins across shuffle partitions and
    *    knock each other out, leaving a similarity component with ZERO
    *    survivors — the canonicalized oracle expects the component
    *    minimum to appear. Min-winner also guarantees the component's
    *    global minimum claims all its bands, independent of partitioning.
    *  - EXPLICIT eviction semantics: each claim times out one horizon
    *    after its event time; a near-duplicate arriving after its
    *    original's bands aged out is KEPT (the documented cost of
    *    bounded state at firehose scale, pinned by StreamingNearDupSpec).
    * State per live band key is one long — bounded by the horizon, not
    * history. */
  def nearDupKeptDocs(spark: SparkSession, stagedDir: String,
      schema: StructType, queryName: String,
      horizon: String = "1 hour"): DataFrame = {
    import spark.implicits._
    val horizonMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
      require(iv.months == 0, s"near-dup horizon must be day-time: $horizon")
      iv.days * 86400000L + iv.microseconds / 1000
    }
    // 3-gram SHINGLES, not unigram tokens: the synthetic corpus draws
    // from a small vocabulary, so unigram token SETS overlap heavily
    // across unrelated docs (measured: 355 of 500 originals lost a band
    // to a neighbor) while shingle sets are near-disjoint. Fused
    // kernels: shingle-hash once per doc, then signature + band buckets
    // in one call (see Misc.minhashBands on lambda re-evaluation).
    import graft.expressions.{DedupKernelExprs => GKern}
    def shingles(c: org.apache.spark.sql.Column) = GKern.hashedShingles(c, 3)
    def bands(c: org.apache.spark.sql.Column) = GKern.minhashBands(c, 128, 16, 7L)
    val claims = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // oldest file first → batch order
      .parquet(stagedDir)
      .select(col("doc_id"), col("ts"),
        posexplode(bands(shingles(col("text")))).as(Seq("band", "bucket")))
      .select(col("doc_id"),
        concat_ws(":", col("band"), col("bucket")).as("band_key"),
        col("ts"))
      .withWatermark("ts", horizon)
      .as[BandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[BandRow], state: GroupState[BandClaim]) =>
          if (state.hasTimedOut) { // claim aged out: band becomes claimable again
            state.remove(); Iterator.empty
          } else {
            val rs = rows.toArray
            if (rs.isEmpty) Iterator.empty
            else if (state.exists) Iterator.empty // claimed within horizon: suppress
            else {
              val winner = rs.minBy(_.doc_id)
              state.update(BandClaim(winner.doc_id))
              // evict one horizon past the claim's event time (must stay
              // ahead of the current watermark; max over the batch's rows)
              state.setTimeoutTimestamp(rs.map(_.ts.getTime).max + horizonMs)
              Iterator.single(Claim(winner.doc_id, key))
            }
          }
      }
    val q = claims.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    // a doc survives iff all 8 of its bands were first claims
    spark.table(queryName)
      .groupBy("doc_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") === 8)
      .select("doc_id")
      .orderBy("doc_id")
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
    val events = spark.readStream.schema(rawSchema(spark, sfDir)).parquet(dir)
      .select("event_id", "event_type", "value")
    val q = DeltaSink.start(events, table, ckpt, appId = "graft-events-ingest")
    q.awaitTermination(300000)
    graft.sources.Delta.read(spark, table)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
  }

  /** Gap-based sessionization via Spark's NATIVE `session_window()` — the
    * primary path (the [[sessionize]] flatMapGroupsWithState variant below
    * stays as the custom-state demo). At stream scale this is the right
    * engine feature: session state is merged and EVICTED by the watermark
    * (bounded memory), instead of living forever in a NoTimeout FMGWS map.
    *
    * Bounded-input mechanics: append mode only emits a session once the
    * watermark passes its end, so the last session of every user would
    * stay unflushed at end-of-stream. A far-future sentinel row, staged as
    * a SECOND file and sequenced after the fixture via
    * `maxFilesPerTrigger=1` + a later modification time, pushes the
    * watermark past every real session; the trailing no-data micro-batch
    * then flushes them all. The sentinel's own session is filtered out of
    * the result (`user_id = -1`).
    *
    * Session-merge semantics match the FMGWS fold and the oracle: two
    * events exactly `gap` apart share a session (Spark merges windows
    * touching at the boundary; the oracle opens a new session only when
    * `diff > gap`). */
  def sessionizeNative(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = Paths.get(s"/tmp/graft_stream_sess/$tag")
    graft.sources.PartitionedFiles.deleteRecursively(dir)
    Files.createDirectories(dir)
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    // sentinel: one row 100 days after the fixture max, schema-identical
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val bump: org.apache.spark.sql.Column = batch.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // ns-as-long fixture
        col("ts") + lit(100L * 86400L * 1000000000L)
      case _ => col("ts") + expr("INTERVAL 100 DAYS") // TIMESTAMP / NTZ
    }
    val sentinelTmp = s"/tmp/graft_stream_sess/${tag}_sentinel"
    batch.orderBy(col("ts").desc).limit(1)
      .withColumn("ts", bump)
      .withColumn("user_id", lit(-1L))
      .coalesce(1).write.mode("overwrite").parquet(sentinelTmp)
    val part = Files.list(Paths.get(sentinelTmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("sentinel part file missing"))
    val sentinelDst = dir.resolve("zz_sentinel.parquet")
    Files.copy(part, sentinelDst, StandardCopyOption.REPLACE_EXISTING)
    // file source picks files oldest-first: sequence the sentinel last
    Files.setLastModifiedTime(sentinelDst,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(dir.resolve("events.parquet")).toMillis + 60000))

    val schema = rawSchema(spark, sfDir)
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", graft.Tables.eventTimeTs(schema, "ts"))
    val sessions = events
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n"))
    val name = s"graft_sessions_native_${System.nanoTime()}"
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).cast("int").as("n_sessions"),
        sum("n").cast("int").as("n_events"))
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

    val schema = rawSchema(spark, sfDir)
    val events = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), graft.Tables.eventTimeMicros(schema, "ts").as("tsMicros"))
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

  /** Per-user sessionization state for [[sessionizeTws]] — same O(1) shape
    * as [[SessState]] but owned by the transformWithState processor. */
  case class TwsSessState(lastTs: Long, sessions: Int, events: Int)

  /** The same gap-session fold as [[sessionize]], expressed through Spark
    * 4's `transformWithState` (StatefulProcessor + typed ValueState) — the
    * successor API to flatMapGroupsWithState: state is schema'd and
    * individually addressable (ValueState/ListState/MapState per key),
    * TTL-capable, and backed by the RocksDB state store provider, which
    * spills keyed state to local disk instead of holding every key on the
    * JVM heap — at stream scale that is the difference between state
    * bounded by disk and an OOM. Checked against the same sessions oracle
    * as both other paths. */
  class SessProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, Int, Int)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[TwsSessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TwsSessState]("sess",
        org.apache.spark.sql.Encoders.product[TwsSessState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[(Long, Int, Int)] = {
      val sorted = rows.map(_.tsMicros).toArray.sorted
      val st0 = if (st.exists()) st.get() else TwsSessState(Long.MinValue, 0, 0)
      val res = sorted.foldLeft(st0) { (s, ts) =>
        val newSession = s.events == 0 || ts - s.lastTs > gapMicros
        TwsSessState(ts, s.sessions + (if (newSession) 1 else 0), s.events + 1)
      }
      st.update(res)
      Iterator.single((uid, res.sessions, res.events))
    }
  }

  def sessionizeTws(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val dir = stageDir(sfDir)
    val schema = rawSchema(spark, sfDir)
    // transformWithState requires the RocksDB provider; scope it to this
    // query and restore whatever the session had.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = spark.readStream.schema(schema).parquet(dir)
        .select(col("user_id"), graft.Tables.eventTimeMicros(schema, "ts").as("tsMicros"))
        .as[Ev]
      val counts = events
        .groupByKey(_.user_id)
        .transformWithState(new SessProcessor(gapMinutes * 60L * 1000000L),
          TimeMode.None(), OutputMode.Update)
        .toDF("user_id", "n_sessions", "n_events")
      val name = s"graft_sessions_tws_${System.nanoTime()}"
      val q = counts.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
      spark.table(name)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
