package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks coverage (SURVEY §2.8): csv/json/parquet round-trips,
  * hive-partitioned writes with partition pruning on read-back, glob file
  * listing, and the SQL entry point (§3.2). Writes go under /tmp/graft_io
  * (overwrite mode — driver may run Verify repeatedly). */
object Io {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)
  private val ioDir = "/tmp/graft_io"

  /** Remove a DuckDB database AND its write-ahead log: deleting only the
    * .duckdb file leaves a stale `.wal` that DuckDB replays into the
    * freshly-created database on next open — phantom rows from a previous
    * (killed) run. */
  private def deleteDuckDb(path: String): Unit = {
    new java.io.File(path).delete()
    new java.io.File(path + ".wal").delete()
    ()
  }

  /** CSV write → schema-inferring read → aggregate (read_csv/write_csv). */
  def io_csv_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir).lineitem
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    src.write.mode("overwrite").option("header", "true").csv(s"$ioDir/lineitem_csv")
    s.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$ioDir/lineitem_csv")
      .groupBy("l_returnflag")
      // exact decimal price sum (r14): the 5 groups each sum ~1/5 of the
      // fact, so double re-association drifted abs 2.6e-4 at sf0.1; qty is
      // integer-valued (exact in double). The roundtrip under test carries
      // the RAW columns — only the verification aggregate is decimal.
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
           sum(col("l_extendedprice").cast("decimal(18,4)"))
             .cast("decimal(28,4)").cast("double").as("price"))
      .orderBy("l_returnflag")
  }

  val ioCsvRoundtripSql =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
      |    AS DECIMAL(28,4)) AS DOUBLE) AS price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Line-delimited JSON write → read (read_json/write_json). */
  def io_json_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir).orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").json(s"$ioDir/orders_json")
    s.read.json(s"$ioDir/orders_json")
      .groupBy("o_orderstatus")
      // exact decimal total (r14): 3 groups each summing ~1/3 of orders —
      // double re-association drifted abs 1.4e-4 at sf0.1; the JSON
      // roundtrip under test carries the RAW column
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,4)"))
             .cast("decimal(28,4)").cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  val ioJsonRoundtripSql =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |    AS DECIMAL(28,4)) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Hive-style partitioned parquet write (ref daft-writers partition.rs),
    * then a read-back that prunes to one partition. */
  def io_partitioned_write(s: SparkSession, dir: String): DataFrame = {
    t(s, dir).lineitem
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(s"$ioDir/lineitem_part")
    // partition pruning: only the l_returnflag=R directory is scanned
    s.read.parquet(s"$ioDir/lineitem_part")
      .filter(col("l_returnflag") === "R")
      .agg(count(lit(1)).as("n_r"), sum("l_quantity").as("qty_r"))
  }

  val ioPartitionedWriteSql =
    """SELECT count(*) AS n_r, sum(l_quantity) AS qty_r
      |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin

  /** Glob listing → table (ref from_glob_path; Spark binaryFile source). */
  def io_glob_files(s: SparkSession, dir: String): DataFrame = {
    val files = s.read.format("binaryFile").load(s"$dir/*.parquet")
      .select(element_at(split(col("path"), "/"), -1).as("fname"), col("length"))
    files.agg(
      count(lit(1)).as("n_files"),
      concat_ws(",", sort_array(collect_list(col("fname")))).as("names"),
      bool_and(col("length") > 0).as("all_nonempty"))
  }

  val ioGlobFilesSql =
    """SELECT CAST(10 AS BIGINT) AS n_files,
      |  'customer.parquet,documents.parquet,embeddings.parquet,events.parquet,lineitem.parquet,nation.parquet,orders.parquet,part.parquet,region.parquet,supplier.parquet' AS names,
      |  true AS all_nonempty""".stripMargin

  /** WARC write → read round-trip (ref daft/io/_warc.py read_warc): each
    * document becomes a `response` record (one .warc file per partition),
    * read back through the streaming parser, doc id recovered from the
    * target URI and content byte-compared against the source column. */
  def io_warc_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Warc
    val warcDir = s"$ioDir/warc_${math.abs(dir.hashCode)}"
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("https://corpus.invalid/doc/"), col("doc_id")).as("uri"))
    Warc.write(docs, warcDir, "payload", "uri", "doc_id")
    Warc.read(s, s"$warcDir/*.warc")
      .select(
        element_at(split(col("WARC-Target-URI"), "/"), -1).cast("long").as("doc_id"),
        col("WARC-Type").as("rec_type"),
        col("Content-Length").as("content_length"),
        decode(col("warc_content"), "UTF-8").as("text"))
      .orderBy("doc_id")
  }

  val ioWarcRoundtripSql =
    """SELECT doc_id, 'response' AS rec_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length, text
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin

  /** Bounded Kafka batch read (ref daft/io/_kafka.py read_kafka): events
    * rows publish to an in-memory wire-protocol broker ([[graft.sources.kafka.MiniBroker]],
    * 4 partitions, offsets assigned in event_id order per partition),
    * then read back through the real client — Metadata/ListOffsets/Fetch
    * over a socket, one Spark task per partition — with per-partition
    * OFFSET BOUNDS [10, 110). The oracle reproduces the offset window as
    * a row_number over the same partitioning. localCheckpoint forces the
    * fetch while the broker is alive, so the returned frame is inert. */
  def io_kafka(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.kafka.{Kafka, MiniBroker}
    val broker = new MiniBroker
    try {
      val evs = t(s, dir).events
        .filter(col("event_id") < 2000)
        .select("event_id").orderBy("event_id")
        .as(org.apache.spark.sql.Encoders.scalaLong)
        .collect() // bounded fixture: the broker under test needs the rows
      evs.foreach { id =>
        broker.append("events", (id % 4).toInt, id,
          id.toString.getBytes("UTF-8"), id.toString.getBytes("UTF-8"))
      }
      val lo = Kafka.Offsets(Map("events" -> (0 until 4).map(_ -> 10L).toMap))
      val hi = Kafka.Offsets(Map("events" -> (0 until 4).map(_ -> 110L).toMap))
      Kafka.read(s, broker.bootstrap, Seq("events"), start = lo, end = hi)
        .withColumnRenamed("partition", "part")
        .groupBy("part")
        .agg(
          count(lit(1)).as("n"),
          min("offset").as("first_offset"),
          max("offset").as("last_offset"),
          sum(decode(col("value"), "UTF-8").cast("long")).as("id_sum"))
        .orderBy("part")
        .localCheckpoint(true)
    } finally broker.close()
  }

  val ioKafkaSql =
    """WITH src AS (
      |  SELECT event_id, CAST(event_id % 4 AS INT) AS part,
      |    row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS off
      |  FROM events WHERE event_id < 2000)
      |SELECT part, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(off) AS BIGINT) AS first_offset,
      |  CAST(max(off) AS BIGINT) AS last_offset,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM src WHERE off >= 10 AND off < 110
      |GROUP BY part ORDER BY part""".stripMargin

  /** Structured-Streaming Kafka source (`format("graft-kafka")`,
    * `streaming/KafkaStream.scala`) — superset surface: the reference's
    * `read_kafka` is batch-only. Two `Trigger.AvailableNow` runs against
    * the same checkpoint: the first streams half the fixture, more rows
    * land, the restart resumes FROM THE CHECKPOINTED OFFSETS and picks
    * up exactly the remainder — the oracle totals over the full fixture
    * only match if no row was lost or replayed across the restart. */
  def streaming_kafka(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.kafka.MiniBroker
    val broker = new MiniBroker
    val tag = math.abs(dir.hashCode)
    val out = s"/tmp/graft_skafka_out_$tag"
    val ck = s"/tmp/graft_skafka_ck_$tag"
    Seq(out, ck).foreach(p => graft.sources.PartitionedFiles.deleteRecursively(
      java.nio.file.Paths.get(p)))
    try {
      val evs = t(s, dir).events
        .filter(col("event_id") < 2000)
        .select("event_id").orderBy("event_id")
        .as(org.apache.spark.sql.Encoders.scalaLong)
        .collect() // bounded fixture: the broker under test needs the rows
      def fill(ids: Array[Long]): Unit = ids.foreach { id =>
        broker.append("events", (id % 4).toInt, id, null,
          id.toString.getBytes("UTF-8"))
      }
      def drainAvailable(): Unit = {
        val q = s.readStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrap)
          .option("topics", "events")
          .load()
          .select(col("partition").as("part"),
            decode(col("value"), "UTF-8").cast("long").as("event_id"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      val (firstHalf, rest) = evs.splitAt(evs.length / 2)
      fill(firstHalf); drainAvailable()
      fill(rest); drainAvailable() // restart: resumes at checkpointed offsets
      s.read.parquet(out)
        .groupBy("part")
        .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
        .orderBy("part")
        .localCheckpoint(true)
    } finally broker.close()
  }

  val streamingKafkaSql =
    """SELECT CAST(event_id % 4 AS INT) AS part, count(*) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE event_id < 2000
      |GROUP BY part ORDER BY part""".stripMargin

  /** ClickHouse writer (ref `write_clickhouse`, `dataframe.py:2548`) over
    * the public HTTP interface against the in-process MiniClickHouse
    * stub: the full documents table goes out as per-partition TabSeparated
    * inserts and is read back — the oracle hash only matches if every
    * string survived the TSV escaping byte-exactly. */
  def io_sink_clickhouse(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ClickHouse, Sinks}
    val ch = new ClickHouse.MiniClickHouse
    try {
      val docs = t(s, dir).documents.select("doc_id", "text", "lang", "n_chars")
      Sinks.writeSink(docs, new ClickHouse.Sink(ch.endpoint, "documents")).count()
      ClickHouse.readAll(s, ch.endpoint, "documents", schema = docs.schema)
        .orderBy("doc_id").localCheckpoint(true)
    } finally ch.close()
  }

  val ioSinkClickhouseSql =
    "SELECT doc_id, text, lang, n_chars FROM documents ORDER BY doc_id"

  /** Turbopuffer writer (ref `write_turbopuffer`, `dataframe.py:2499`)
    * over the public v2 HTTP API against MiniTurbopuffer: the embedding
    * corpus is upserted (id/vector mapping like the reference sink), then
    * each held-out query vector is ANN-queried top-5 — results only match
    * the DuckDB brute-force oracle if vectors round-tripped intact and
    * the stub's independent cosine agrees. */
  def io_sink_turbopuffer(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{Sinks, Turbopuffer}
    val tp = new Turbopuffer.MiniTurbopuffer
    try {
      val e = t(s, dir).embeddings
      Sinks.writeSink(
        e.filter(col("vec_id") >= 10).select("vec_id", "embedding"),
        new Turbopuffer.Sink(tp.endpoint, "emb",
          idColumn = "vec_id", vectorColumn = "embedding")).count()
      val queries = e.filter(col("vec_id") < 10).select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      val rows = queries.toSeq.flatMap { case (qid, vec) =>
        Turbopuffer.queryTopK(tp.endpoint, "emb", vec.map(_.toDouble), k = 5)
          .zipWithIndex.map { case ((nid, dist), i) => (qid, nid, 1.0 - dist, i + 1) }
      }
      s.createDataFrame(rows)
        .toDF("query_id", "neighbor_id", "cos_sim", "rk")
        .orderBy("query_id", "rk")
    } finally tp.close()
  }

  /** Hugging Face dataset upload (ref `write_huggingface`,
    * `dataframe.py:2598`) over the public LFS-batch + commit APIs against
    * MiniHub, then read back through the dataset-viewer parquet route —
    * the full publish→consume loop. Executors LFS-upload their part
    * files; the driver's finalize is one metadata commit. */
  def io_hf_upload(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{HuggingFace, HuggingFaceUpload}
    val hub = new HuggingFaceUpload.MiniHub
    try {
      val docs = t(s, dir).documents
        .select("doc_id", "text", "lang", "source", "n_chars")
      HuggingFaceUpload.upload(docs.repartition(4), "graft/documents", hub.endpoint)
      val cache = s"/tmp/graft_hfu_cache_q_${math.abs(dir.hashCode)}"
      graft.sources.PartitionedFiles.deleteRecursively(java.nio.file.Paths.get(cache))
      HuggingFace.read(s, "graft/documents", endpoint = hub.endpoint, cacheDir = cache)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id").localCheckpoint(true)
    } finally hub.close()
  }

  val ioHfUploadSql =
    "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"

  val ioSinkTurbopufferSql =
    """SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INT) AS rk FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_sim,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
      |               c.vec_id ASC) AS rk
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10) sub
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** Range source (ref daft/io/_range.py `daft.range`): distributed
    * integer range — no driver-side data, each partition synthesizes its
    * slice. */
  def io_range(s: SparkSession, dir: String): DataFrame =
    s.range(5, 5000, 3)
      .select(col("id"), (col("id") % 7).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("id").as("sum_id"))
      .orderBy("bucket")

  val ioRangeSql =
    """SELECT i % 7 AS bucket, count(*) AS n, CAST(sum(i) AS BIGINT) AS sum_id
      |FROM range(5, 5000, 3) t(i) GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Generator source (ref daft/io/_generator.py): a table synthesized
    * entirely on executors from deterministic per-row expressions — the
    * scale pattern for test/benchmark data that never exists on the
    * driver. */
  def io_generator(s: SparkSession, dir: String): DataFrame =
    s.range(0, 10000)
      .select(
        col("id"),
        pmod(xxhash64(col("id")), lit(1000)).as("h"),
        (col("id") * col("id") % 97).as("qr"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct("qr").as("n_qr"),
        min("h").geq(0).and(max("h").lt(1000)).as("h_in_range"))

  val ioGeneratorSql =
    """SELECT count(*) AS n, count(DISTINCT (i * i) % 97) AS n_qr, true AS h_in_range
      |FROM range(0, 10000) t(i)""".stripMargin

  /** Text-line source (ref daft/io/_text.py read_text): newline-delimited
    * text write + read-back; fidelity checked by count/length/distinct
    * aggregates (file order is not meaningful for a distributed write). */
  def io_text_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val txtDir = s"$ioDir/docs_text_${math.abs(dir.hashCode)}"
    t(s, dir).documents.select("text").write.mode("overwrite").text(txtDir)
    s.read.text(txtDir)
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct("value").as("n_distinct"),
        sum(length(col("value"))).as("total_chars"))
  }

  val ioTextRoundtripSql =
    """SELECT count(*) AS n_lines, count(DISTINCT text) AS n_distinct,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars
      |FROM documents""".stripMargin

  /** MCAP round-trip (ref daft/io/mcap/_mcap.py read_mcap): stage orders
    * rows as MCAP messages (topic = order status, log_time from the key),
    * write one lz4-chunked file per partition, stream them back through
    * the record parser. Exercises the full container path: magic, channel
    * registry, chunk decompression, message framing. */
  /** Arrow IPC (Feather V2) export/import — the training-loader handoff
    * (ref to_arrow/to_arrow_iter; torch/ray ingest IPC files). Mixed
    * types incl. a computed double and a timestamp-µs long exercise the
    * schema mapping both ways. */
  def io_arrow_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.ArrowIpc
    val arrowDir = s"$ioDir/arrow_${math.abs(dir.hashCode)}"
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars"), (col("n_chars") * lit(0.5)).as("half_chars"),
        encode(col("lang"), "UTF-8").as("lang_bytes"))
    ArrowIpc.write(docs.repartition(4), arrowDir, batchSize = 128)
    // the raw binary column round-trips through the IPC file; the COMPARED
    // projection surfaces it as hex because the driver's pandas
    // canonicalizer cannot sort/hash bytearray values (r8 red row)
    ArrowIpc.read(s, arrowDir)
      .withColumn("lang_hex", upper(hex(col("lang_bytes"))))
      .drop("lang_bytes")
      .orderBy("doc_id")
  }

  val ioArrowRoundtripSql =
    """SELECT doc_id, text, lang, n_chars, CAST(n_chars * 0.5 AS DOUBLE) AS half_chars,
      |  upper(hex(encode(lang))) AS lang_hex
      |FROM documents WHERE doc_id < 1000 ORDER BY doc_id""".stripMargin

  def io_mcap_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Mcap
    val mcapDir = s"$ioDir/mcap_${math.abs(dir.hashCode)}"
    val msgs = t(s, dir).orders
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderstatus").as("topic"),
        (col("o_orderkey") * lit(1000000L)).as("log_time"),
        (col("o_orderkey") * lit(1000000L) + lit(1L)).as("publish_time"),
        col("o_orderkey").cast("int").as("sequence"),
        col("o_orderpriority").as("data"))
    Mcap.write(msgs, mcapDir, "topic", "log_time", "publish_time", "sequence", "data",
      compression = "lz4")
    Mcap.read(s, s"$mcapDir/*.mcap")
      .orderBy("sequence")
  }

  val ioMcapRoundtripSql =
    """SELECT o_orderstatus AS topic, o_orderkey * 1000000 AS log_time,
      |  o_orderkey * 1000000 + 1 AS publish_time,
      |  CAST(o_orderkey AS INT) AS sequence, o_orderpriority AS data
      |FROM orders WHERE o_orderkey < 2000 ORDER BY sequence""".stripMargin

  /** Delta Lake round-trip (ref daft/io/_delta_lake.py read_deltalake /
    * write_deltalake; implemented from the open protocol — sources/Delta):
    * create a partitioned table with two append commits, read the latest
    * snapshot back through log replay, aggregate. */
  def io_delta_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val li = t(s, dir).lineitem
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    Delta.write(li.filter(col("l_orderkey") < 1000), path,
      mode = "append", partitionBy = Seq("l_returnflag"))
    Delta.write(li.filter(col("l_orderkey") >= 1000 && col("l_orderkey") < 2000), path)
    Delta.read(s, path)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
           round(sum("l_extendedprice"), 2).as("price"))
      .orderBy("l_returnflag")
  }

  val ioDeltaRoundtripSql =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty,
      |  round(sum(l_extendedprice), 2) AS price
      |FROM lineitem WHERE l_orderkey < 2000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Delta per-file stats skipping + OPTIMIZE ZORDER (delta.io
    * PROTOCOL.md §Per-file Statistics; production Delta's OPTIMIZE
    * ZORDER BY): write unclustered, z-order by (l_orderkey, l_partkey),
    * then read through a stats-pruned scan. The `skipped` column is
    * computed from actual file counts (opened < total), so the DuckDB
    * oracle comparison fails if skipping ever stops working — the scale
    * mechanism itself is under the correctness gate, not just a spec. */
  def io_delta_stats_skip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_stats_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val li = t(s, dir).lineitem
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    Delta.write(li.repartition(8), path)
    val totalBytes = Delta.snapshot(s, path).files.map(_.size).sum
    Delta.optimizeZorder(s, path, Seq("l_orderkey", "l_partkey"),
      targetFileBytes = math.max(1L, totalBytes / 8))
    val total = Delta.snapshot(s, path).files.size
    val pred = col("l_orderkey") <= 100L
    val opened = Delta.filesForScan(s, path, pred).size
    Delta.read(s, path, dataFilter = Some(pred))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
           round(sum("l_extendedprice"), 2).as("price"))
      .withColumn("skipped", lit(opened < total))
  }

  val ioDeltaStatsSkipSql =
    """SELECT count(*) AS n, sum(l_quantity) AS qty,
      |  round(sum(l_extendedprice), 2) AS price, true AS skipped
      |FROM lineitem WHERE l_orderkey <= 100""".stripMargin

  /** Delta row-level DML (copy-on-write DELETE + UPDATE, the spec's
    * remove + rewritten-add commit shape): delete a key range, update a
    * disjoint one, verify the surviving aggregate against the oracle's
    * CASE expression over the raw table. */
  def io_delta_dml(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_dml_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val ord = t(s, dir).orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    Delta.write(ord.repartitionByRange(4, col("o_orderkey")), path)
    Delta.delete(s, path, col("o_orderkey") <= 500L)
    Delta.update(s, path,
      Map("o_totalprice" -> (col("o_totalprice") * 2)), col("o_orderkey") > 5000L)
    Delta.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
  }

  val ioDeltaDmlSql =
    """SELECT count(*) AS n,
      |  round(sum(CASE WHEN o_orderkey > 5000 THEN o_totalprice * 2
      |                 ELSE o_totalprice END), 2) AS total
      |FROM orders WHERE o_orderkey > 500""".stripMargin

  /** Delta deletion vectors (merge-on-read DELETE, PROTOCOL.md §Deletion
    * Vectors): tombstone two predicates by (file, row-ordinal) bitmaps —
    * one small enough to inline, one forced to an on-disk
    * `deletion_vector_*.bin` — then verify the read-side anti-join
    * against the oracle's relational recomputation. `mor` asserts no data
    * file was rewritten; a CoW regression would flip it false. */
  def io_delta_dv(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_dv_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val ord = t(s, dir).orders.select("o_orderkey", "o_custkey", "o_totalprice")
    Delta.write(ord.repartitionByRange(4, col("o_orderkey")), path)
    val before = Delta.snapshot(s, path).files.map(_.path).toSet
    Delta.deleteVectors(s, path, col("o_orderkey") % 3 === 0L, // forced on-disk
      inlineMaxBytes = 0)
    Delta.deleteVectors(s, path, col("o_custkey") % 100 === 11L) // merges bitmaps
    val snap = Delta.snapshot(s, path)
    // both DELETEs were merge-on-read: same data files, tombstones only
    // (inline-vs-file storage is covered value-for-value in DeltaSpec)
    val mor = snap.files.map(_.path).toSet == before &&
      snap.files.exists(_.dv.isDefined)
    Delta.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .withColumn("mor", lit(mor))
  }

  val ioDeltaDvSql =
    """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS mor
      |FROM orders WHERE o_orderkey % 3 <> 0 AND o_custkey % 100 <> 11""".stripMargin

  /** Delta MERGE INTO (upsert by key, CoW): seed with low orderkeys,
    * merge a source that overlaps the top of the range and extends past
    * it; oracle reproduces matched-replaces + inserts with a UNION. */
  def io_delta_merge(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_merge_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val ord = t(s, dir).orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    Delta.write(ord.filter(col("o_orderkey") <= 3000L)
      .repartitionByRange(4, col("o_orderkey")), path)
    val src = ord.filter(col("o_orderkey") > 2000L && col("o_orderkey") <= 4000L)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
    Delta.merge(s, path, src, "o_orderkey")
    Delta.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
  }

  val ioDeltaMergeSql =
    """SELECT count(*) AS n, round(sum(total_price), 2) AS total FROM (
      |  SELECT o_totalprice AS total_price FROM orders WHERE o_orderkey <= 2000
      |  UNION ALL
      |  SELECT o_totalprice * 3 AS total_price FROM orders
      |  WHERE o_orderkey > 2000 AND o_orderkey <= 4000)""".stripMargin

  /** Delta time travel + overwrite semantics: version 2 overwrites the
    * table down to l_orderkey < 500; reading versionAsOf=1 still sees the
    * pre-overwrite state, the latest snapshot honors the removes. A
    * checkpoint is cut before the last read to exercise the
    * checkpoint-then-replay reconstruction path. */
  def io_delta_time_travel(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Delta
    val path = s"$ioDir/delta_tt_${math.abs(dir.hashCode)}"
    Delta.deleteTable(path)
    val ord = t(s, dir).orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    Delta.write(ord.filter(col("o_orderkey") < 1000), path)                 // v0
    Delta.write(ord.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000), path) // v1
    Delta.write(ord.filter(col("o_orderkey") < 500), path, mode = "overwrite")           // v2
    Delta.checkpoint(s, path)
    def summarize(df: DataFrame, v: Int) =
      df.agg(lit(v).as("version"), count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
    summarize(Delta.read(s, path, versionAsOf = Some(1L)), 1)
      .unionAll(summarize(Delta.read(s, path), 2))
      .orderBy("version")
  }

  val ioDeltaTimeTravelSql =
    """SELECT 1 AS version, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderkey < 2000
      |UNION ALL
      |SELECT 2 AS version, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY version""".stripMargin

  /** Iceberg manifest-bounds file skipping (spec §Manifests
    * lower_bounds/upper_bounds; ref `daft/io/_iceberg.py` prunes scans
    * from the same metadata): range-clustered write, then a stats-pruned
    * read; `skipped` carries opened<total into the oracle comparison. */
  def io_iceberg_stats_skip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Iceberg
    val path = s"$ioDir/iceberg_stats_${math.abs(dir.hashCode)}"
    Iceberg.deleteTable(path)
    val ord = t(s, dir).orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .repartitionByRange(6, col("o_orderkey"))
    Iceberg.write(ord, path)
    val total = Iceberg.state(path).files.size
    val pred = col("o_orderkey") <= 500L
    val opened = Iceberg.filesForScan(path, pred).size
    Iceberg.read(s, path, dataFilter = Some(pred))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .withColumn("skipped", lit(opened < total))
  }

  val ioIcebergStatsSkipSql =
    """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS skipped
      |FROM orders WHERE o_orderkey <= 500""".stripMargin

  /** Iceberg row-level DML (copy-on-write with manifest rewriting):
    * same shape as [[io_delta_dml]] over the customer table. */
  def io_iceberg_dml(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Iceberg
    val path = s"$ioDir/iceberg_dml_${math.abs(dir.hashCode)}"
    Iceberg.deleteTable(path)
    val cust = t(s, dir).customer.select("c_custkey", "c_nationkey", "c_acctbal")
    Iceberg.write(cust.repartitionByRange(4, col("c_custkey")), path)
    Iceberg.delete(s, path, col("c_custkey") <= 100L)
    Iceberg.update(s, path,
      Map("c_acctbal" -> (col("c_acctbal") + 1000)), col("c_nationkey") === 3)
    Iceberg.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total"))
  }

  val ioIcebergDmlSql =
    """SELECT count(*) AS n,
      |  round(sum(CASE WHEN c_nationkey = 3 THEN c_acctbal + 1000
      |                 ELSE c_acctbal END), 2) AS total
      |FROM customer WHERE c_custkey > 100""".stripMargin

  /** Iceberg v2 merge-on-read position deletes (spec §Position Delete
    * Files; the reference reads v2 tables via pyiceberg): two MoR DELETEs
    * tombstone rows by (file_path, pos) without rewriting data files; the
    * read applies them as an anti-join on (path, row ordinal). The oracle
    * recomputes the surviving set relationally from the base table. */
  def io_iceberg_v2_deletes(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Iceberg
    val path = s"$ioDir/iceberg_v2del_${math.abs(dir.hashCode)}"
    Iceberg.deleteTable(path)
    val cust = t(s, dir).customer.select("c_custkey", "c_nationkey", "c_acctbal")
    Iceberg.write(cust.repartitionByRange(4, col("c_custkey")), path, formatVersion = 2)
    Iceberg.deletePositions(s, path, col("c_custkey") <= 200L)
    Iceberg.deletePositions(s, path, col("c_nationkey") === 7)
    // data files untouched (merge-on-read): assert via the state contract
    val mor = Iceberg.state(path).deleteFiles.nonEmpty
    Iceberg.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total"))
      .withColumn("mor", lit(mor))
  }

  val ioIcebergV2DeletesSql =
    """SELECT count(*) AS n, round(sum(c_acctbal), 2) AS total, true AS mor
      |FROM customer WHERE c_custkey > 200 AND c_nationkey <> 7""".stripMargin

  /** Iceberg v2 merge-on-read EQUALITY deletes (spec §Equality Delete
    * Files): delete by key tuple without reading or rewriting any data
    * file — the cheapest delete the spec offers. Sequence-number scoping
    * is exercised end-to-end: nation-3 suppliers are deleted by suppkey,
    * then re-appended AFTER the delete (higher data sequence number), so
    * they survive; a second delete on a different key set then applies to
    * both generations. The oracle recomputes the surviving set
    * relationally from the base table. */
  def io_iceberg_eq_deletes(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Iceberg
    val path = s"$ioDir/iceberg_eqdel_${math.abs(dir.hashCode)}"
    Iceberg.deleteTable(path)
    val sup = t(s, dir).supplier.select("s_suppkey", "s_nationkey", "s_acctbal")
    Iceberg.write(sup.repartitionByRange(3, col("s_suppkey")), path,
      formatVersion = 2)                                                 // seq 1
    Iceberg.deleteEquality(s, path,
      sup.filter(col("s_nationkey").isin(3, 7)).select("s_suppkey"))     // seq 2
    Iceberg.write(sup.filter(col("s_nationkey") === 3), path)            // seq 3
    Iceberg.deleteEquality(s, path,
      s.range(1, 6).select(col("id").as("s_suppkey")))                   // seq 4
    // data files untouched (merge-on-read): two equality-delete commits at
    // distinct sequence numbers, asserted via the state contract
    val mor = Iceberg.state(path).deleteFiles
      .filter(_.content == 2).map(_.seq).distinct.size == 2
    Iceberg.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("total"))
      .withColumn("mor", lit(mor))
  }

  val ioIcebergEqDeletesSql =
    """SELECT count(*) AS n, round(sum(s_acctbal), 2) AS total, true AS mor
      |FROM (
      |  SELECT * FROM supplier WHERE s_nationkey NOT IN (3, 7)
      |  UNION ALL
      |  SELECT * FROM supplier WHERE s_nationkey = 3
      |) WHERE s_suppkey NOT IN (1, 2, 3, 4, 5)""".stripMargin

  /** Iceberg round-trip (ref daft/io/_iceberg.py read_iceberg /
    * write_iceberg; implemented from the open table spec — sources/
    * Iceberg): two append snapshots through Avro manifests, snapshot
    * time travel after an overwrite. */
  def io_iceberg_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Iceberg
    val path = s"$ioDir/iceberg_${math.abs(dir.hashCode)}"
    Iceberg.deleteTable(path)
    val cust = t(s, dir).customer
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    Iceberg.write(cust.filter(col("c_custkey") < 500), path,
      partitionBy = Seq("c_nationkey"))
    val keepId = Iceberg.write(
      cust.filter(col("c_custkey") >= 500 && col("c_custkey") < 800), path)
    Iceberg.write(cust.filter(col("c_custkey") < 100), path, mode = "overwrite")
    def summarize(df: DataFrame, v: Int) =
      df.agg(lit(v).as("snap"), count(lit(1)).as("n"),
        round(sum("c_acctbal"), 2).as("bal"))
    summarize(Iceberg.read(s, path, snapshotId = Some(keepId)), 1)
      .unionAll(summarize(Iceberg.read(s, path), 2))
      .orderBy("snap")
  }

  val ioIcebergRoundtripSql =
    """SELECT 1 AS snap, count(*) AS n, round(sum(c_acctbal), 2) AS bal
      |FROM customer WHERE c_custkey < 800
      |UNION ALL
      |SELECT 2 AS snap, count(*) AS n, round(sum(c_acctbal), 2) AS bal
      |FROM customer WHERE c_custkey < 100
      |ORDER BY snap""".stripMargin

  /** Hudi copy-on-write round-trip (ref daft/io/_hudi.py read_hudi;
    * implemented from the open table layout — sources/Hudi): partitioned
    * append commits, a replacecommit overwrite, instant time travel. */
  /** Hudi row-level DML (per-group replacecommit): same shape as
    * [[io_delta_dml]] over the supplier table. */
  def io_hudi_dml(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Hudi
    val path = s"$ioDir/hudi_dml_${math.abs(dir.hashCode)}"
    Hudi.deleteTable(path)
    val sup = t(s, dir).supplier.select("s_suppkey", "s_nationkey", "s_acctbal")
    Hudi.write(sup.repartitionByRange(3, col("s_suppkey")), path)
    Hudi.delete(s, path, col("s_suppkey") <= 10L)
    Hudi.update(s, path,
      Map("s_acctbal" -> (col("s_acctbal") * 2)), col("s_nationkey") === 5)
    Hudi.read(s, path)
      .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("total"))
  }

  val ioHudiDmlSql =
    """SELECT count(*) AS n,
      |  round(sum(CASE WHEN s_nationkey = 5 THEN s_acctbal * 2
      |                 ELSE s_acctbal END), 2) AS total
      |FROM supplier WHERE s_suppkey > 10""".stripMargin

  def io_hudi_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Hudi
    val path = s"$ioDir/hudi_${math.abs(dir.hashCode)}"
    Hudi.deleteTable(path)
    val sup = t(s, dir).supplier
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    Hudi.write(sup.filter(col("s_suppkey") % 2 === 0), path,
      partitionBy = Seq("s_nationkey"))
    val t1 = Hudi.write(sup.filter(col("s_suppkey") % 2 === 1), path)
    Hudi.write(sup.filter(col("s_suppkey") <= 10), path, mode = "overwrite")
    def summarize(df: DataFrame, v: Int) =
      df.agg(lit(v).as("snap"), count(lit(1)).as("n"),
        round(sum("s_acctbal"), 2).as("bal"))
    summarize(Hudi.read(s, path, asOfInstant = Some(t1)), 1)
      .unionAll(summarize(Hudi.read(s, path), 2))
      .orderBy("snap")
  }

  val ioHudiRoundtripSql =
    """SELECT 1 AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
      |FROM supplier
      |UNION ALL
      |SELECT 2 AS snap, count(*) AS n, round(sum(s_acctbal), 2) AS bal
      |FROM supplier WHERE s_suppkey <= 10
      |ORDER BY snap""".stripMargin

  /** hf://datasets source (ref daft/io/huggingface read_huggingface):
    * stage a documents subset as the parquet-conversion of an in-process
    * hub (the public dataset-viewer API contract), resolve + download it
    * through the distributed staged-fetch path, aggregate. */
  def io_huggingface(s: SparkSession, dir: String): DataFrame = {
    import java.net.InetSocketAddress
    import java.nio.file.{Files, Paths}
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import graft.sources.HuggingFace
    val srcDir = s"$ioDir/hf_src_${math.abs(dir.hashCode)}"
    t(s, dir).documents.filter(col("doc_id") < 400)
      .select("doc_id", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val part = Files.list(Paths.get(srcDir)).iterator()
    var bytes: Array[Byte] = null
    part.forEachRemaining(p =>
      if (p.getFileName.toString.endsWith(".parquet")) bytes = Files.readAllBytes(p))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val data = bytes
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val resp =
          if (path.startsWith("/api/datasets/"))
            s"""{"default":{"train":["http://127.0.0.1:${server.getAddress.getPort}/docs.parquet"]}}"""
              .getBytes("UTF-8")
          else data
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      }
    })
    server.start()
    try {
      val cache = s"$ioDir/hf_cache_${math.abs(dir.hashCode)}"
      graft.sources.PartitionedFiles.deleteRecursively(Paths.get(cache))
      HuggingFace.read(s, "graft/docs",
          endpoint = s"http://127.0.0.1:${server.getAddress.getPort}", cacheDir = cache)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), round(avg("n_chars"), 6).as("avg_chars"))
        .orderBy("lang")
    } finally server.stop(0)
  }

  val ioHuggingfaceSql =
    """SELECT lang, count(*) AS n, round(avg(n_chars), 6) AS avg_chars
      |FROM documents WHERE doc_id < 400
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** read_sql (ref daft/io/_sql.py): stage an orders table into a DuckDB
    * database file, read it back through the range-partitioned JDBC source
    * (4 parallel stripes on o_orderkey), and aggregate. */
  def io_read_sql(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Sql
    val db = s"$ioDir/read_sql_${math.abs(dir.hashCode)}.duckdb"
    deleteDuckDb(db)
    Sql.execute(s"jdbc:duckdb:$db", Seq(
      s"CREATE OR REPLACE TABLE orders AS SELECT * FROM read_parquet('$dir/orders.parquet')"))
    val maxKey = t(s, dir).orders.agg(max("o_orderkey")).head().getLong(0)
    Sql.readSqlPartitioned(s, s"jdbc:duckdb:$db", "orders",
        "o_orderkey", 0L, maxKey, numPartitions = 4)
      .groupBy("o_orderstatus")
      // round(2): big double sums drift in the last ulps across engines
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val ioReadSqlSql =
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** write_sink (ref dataframe.py:2267 DataSink protocol): push documents
    * through the pluggable JDBC sink (per-partition batched inserts into
    * DuckDB) and the parallel CSV part sink, then verify both by reading
    * back — per-partition write results aggregate to the source counts. */
  def io_write_sink(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{Sinks, Sql}
    val db = s"$ioDir/write_sink_${math.abs(dir.hashCode)}.duckdb"
    deleteDuckDb(db)
    val docs = t(s, dir).documents.select("doc_id", "text").repartition(8)
    // write_sink is BLOCKING (as in the reference): materialize the write
    // results before reading the sink back
    val jdbcRes = Sinks.writeSink(docs, new Sinks.JdbcSink(s"jdbc:duckdb:$db", "docs_sink"))
      .agg(sum("rowsWritten").as("jdbc_rows"), count(lit(1)).as("jdbc_parts")).head()
    val csvDir = s"$ioDir/write_sink_csv_${math.abs(dir.hashCode)}"
    val csvRes = Sinks.writeSink(docs, new Sinks.CsvPartSink(csvDir))
      .agg(sum("rowsWritten").as("csv_rows")).head()
    Sql.readSql(s, s"jdbc:duckdb:$db",
        "SELECT count(*) AS n, count(DISTINCT doc_id) AS nd FROM docs_sink")
      .select(
        lit(jdbcRes.getLong(0)).as("jdbc_rows"),
        lit(jdbcRes.getLong(1)).as("jdbc_parts"),
        lit(csvRes.getLong(0)).as("csv_rows"),
        col("n").as("db_rows"), (col("n") === col("nd")).as("no_dups"))
  }

  val ioWriteSinkSql =
    """SELECT count(*) AS jdbc_rows, CAST(8 AS BIGINT) AS jdbc_parts,
      |  count(*) AS csv_rows, count(*) AS db_rows, true AS no_dups
      |FROM documents""".stripMargin

  /** write_sql (ref dataframe.py:911, round-11 API sweep): the JDBC sink
    * with the reference's mode semantics — overwrite creates, a second
    * append doubles the rows, and metrics come back as the one-row frame —
    * read back through read_sql. The array column exercises the default
    * "str" non-primitive handling (JSON text), re-parsed on readback so
    * the oracle stays byte-format-agnostic. */
  def io_write_sql(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Sql
    val db = s"$ioDir/write_sql_${math.abs(dir.hashCode)}.duckdb"
    deleteDuckDb(db)
    val url = s"jdbc:duckdb:$db"
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"),
        split(trim(col("text")), "\\s+").as("toks"))
      .repartition(4)
    val m1 = Sql.writeSql(docs, url, "docs", writeMode = "overwrite").head()
    val m2 = Sql.writeSql(docs, url, "docs", writeMode = "append").head()
    Sql.readSql(s, url, "SELECT doc_id, lang, toks FROM docs")
      .withColumn("n_toks", size(from_json(col("toks"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_toks").cast("long")).as("total_toks"))
      .withColumn("written_rows", lit(m1.getLong(0) + m2.getLong(0)))
      .orderBy("lang")
  }

  val ioWriteSqlSql =
    // CAST the token sum to BIGINT: DuckDB's sum(INTEGER) yields HUGEINT
    // (int128), and the driver's pandas compare renders HUGEINT as float64
    // while the Spark parquet holds int64 — the r11 red was exactly this
    // (identical VALUES, hash-only mismatch; total_toks was the single
    // HUGEINT column across all 256 oracles).
    """SELECT lang, count(*) * 2 AS n, count(DISTINCT doc_id) AS n_docs,
      |  CAST(2 * sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |    AS total_toks,
      |  2 * (SELECT count(*) FROM documents WHERE doc_id < 300) AS written_rows
      |FROM documents WHERE doc_id < 300
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** skip_existing (ref dataframe.py:3233, round-11 API sweep): write the
    * processed subset's keys to parquet, anti-join the full table against
    * those files. The absent second path exercises the permissive
    * missing-path contract. */
  def io_skip_existing(s: SparkSession, dir: String): DataFrame = {
    val done = s"$ioDir/skip_existing_${math.abs(dir.hashCode)}"
    val o = t(s, dir).orders
    o.filter(col("o_orderkey") % 10 < 3).select("o_orderkey")
      .write.mode("overwrite").parquet(done)
    graft.ops.SkipExisting.skipExisting(
        o, Seq(done, s"$done-never-written"), Seq("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n_remaining"))
      .orderBy("o_orderstatus")
  }

  val ioSkipExistingSql =
    """SELECT o_orderstatus, count(*) AS n_remaining FROM orders
      |WHERE o_orderkey % 10 >= 3
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SQL entry point (§3.2): temp views + spark.sql with CTE, join,
    * window — same logical IR as the DataFrame API. */
  def sql_entry(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.createOrReplaceTempView("v_orders")
    tt.customer.createOrReplaceTempView("v_customer")
    s.sql(
      """WITH cust_orders AS (
        |  SELECT c_mktsegment, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM v_orders JOIN v_customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, round(sum(o_totalprice), 2) AS top3_sum
        |FROM cust_orders WHERE rk <= 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** Optimizer-rule surface (round 9): an UN-HINTED fact⋈fact⋈fact SQL
    * query, exactly what a user would type. The session's injected rules
    * (`plans/GraftOptimizerRules`, ref `optimization/rules/` which does
    * this generically) supply the 100 TB posture — no fact-side
    * broadcast, bloom prefilter at scale — that the curated corpus
    * otherwise hand-applies. `GraftOptimizerRulesSpec` pins the plan
    * shape; this row pins the rewrite's result fidelity against the
    * oracle. */
  def sql_optimizer_rules(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.customer.createOrReplaceTempView("v_customer")
    tt.orders.createOrReplaceTempView("v_orders")
    tt.lineitem.createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin)
  }

  val sqlOptimizerRulesSql =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  sum(l_extendedprice * (1 - l_discount)) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin

  /** Eager-aggregation rule surface (round 10, VERDICT r9 #4): un-hinted
    * q3-shaped SQL whose GROUP BY key is the fact side's join key, with
    * every decomposable aggregate class (SUM / COUNT / AVG / MIN / MAX —
    * AVG splits into two partials). `GraftOptimizerRulesSpec` pins the
    * rewritten plan shape; this row pins the FIRED rewrite's result
    * fidelity against the oracle. The rule's size gates are scoped down
    * for the sf0.01 fixture (minFactBytes, broadcast threshold) and
    * restored after the plan is evaluated — evaluation happens inside the
    * scope (bounded LIMIT 20 output relocalized) because Verify's write
    * action would otherwise re-plan under the restored session confs, and
    * the assert proves the partial aggregate actually sits below the join
    * rather than silently testing the unrewritten plan. */
  def sql_eager_agg(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.createOrReplaceTempView("v_orders")
    tt.lineitem.createOrReplaceTempView("v_lineitem")
    val oldMin = s.conf.getOption("spark.graft.optimizer.eagerAggregation.minFactBytes")
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.graft.optimizer.eagerAggregation.minFactBytes", "1")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = s.sql(
        """SELECT l_orderkey, o_orderpriority,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          |  count(*) AS n_items,
          |  round(avg(l_quantity), 6) AS avg_qty,
          |  round(min(l_extendedprice), 2) AS min_price,
          |  round(max(l_extendedprice), 2) AS max_price
          |FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
          |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          |GROUP BY l_orderkey, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin)
      assert(df.queryExecution.optimizedPlan.toString.contains("_eager_partial"),
        "EagerAggregationRule did not fire on the un-hinted eager-agg SQL")
      import scala.jdk.CollectionConverters._
      s.createDataFrame(df.collect().toSeq.asJava, df.schema)
    } finally {
      oldMin match {
        case Some(v) => s.conf.set("spark.graft.optimizer.eagerAggregation.minFactBytes", v)
        case None => s.conf.unset("spark.graft.optimizer.eagerAggregation.minFactBytes")
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  val sqlEagerAggSql =
    """SELECT l_orderkey, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin

  /** Stats-driven join reorder (ref reorder_joins/mod.rs +
    * enrich_with_stats.rs; Spark-first = CBO, round 11): three catalog
    * tables are ANALYZE'd, then un-hinted SQL written in a PESSIMAL order
    * (the fact joins customer first, the 1-row-selective nation filter
    * last). With row-count + column stats, CostBasedJoinReorder moves the
    * selective customer⋈nation join under the fact join — asserted
    * in-scope on the optimized plan (the innermost join must be the
    * dim⋈dim pair, not fact⋈customer as written) before the result is
    * oracle-compared. Broadcast is disabled inside the scope so reorder
    * (not broadcast placement) is what's proven. */
  def sql_cbo_reorder(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // ISOLATED child session (ADVICE r11): the CBO/broadcast confs live in
    // this session's own SessionState, so a concurrently-running query on
    // the parent session can never be planned under them. SharedState
    // (catalog, warehouse) is shared, which is exactly what the persistent
    // ANALYZE'd tables need.
    val iso = s.newSession()
    val tt = t(iso, dir)
    val sess = new graft.GraftSession(iso)
    val suffix = math.abs(dir.hashCode).toString
    val (nT, cT, oT) = (s"cbo_nation_$suffix", s"cbo_customer_$suffix", s"cbo_orders_$suffix")
    sess.createTable(nT, tt.nation)
    sess.createTable(cT, tt.customer)
    sess.createTable(oT, tt.orders)
    sess.analyzeTable(nT, Seq("n_nationkey", "n_name"))
    sess.analyzeTable(cT, Seq("c_custkey", "c_nationkey"))
    sess.analyzeTable(oT, Seq("o_custkey"))
    try {
      iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // CBO is scoped to the analyzed tables (see Engine.session: the
      // global default stays off because the cbo stats visitor changes
      // estimates on stat-less path reads too)
      iso.conf.set("spark.sql.cbo.enabled", "true")
      iso.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val df = iso.sql(
        s"""SELECT n_name, count(*) AS n_orders,
           |  round(sum(o_totalprice), 2) AS total
           |FROM $oT JOIN $cT ON o_custkey = c_custkey
           |JOIN $nT ON c_nationkey = n_nationkey
           |WHERE n_name IN ('NATION_7', 'NATION_12')
           |GROUP BY n_name ORDER BY n_name""".stripMargin)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      val innermost = joins.last.toString
      assert(innermost.contains(nT) && innermost.contains(cT) &&
        !innermost.contains(oT),
        s"CBO join reorder did not move the selective dim join under the fact:\n$innermost")
      import scala.jdk.CollectionConverters._
      s.createDataFrame(df.collect().toSeq.asJava, df.schema)
    } finally {
      // the child session's confs die with it; only the shared-catalog
      // tables need cleanup
      Seq(nT, cT, oT).foreach(sess.dropTable)
    }
  }

  val sqlCboReorderSql =
    """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_7', 'NATION_12')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Graft-native functions on the SQL surface (ref daft-sql binds every
    * function for `daft.sql`): `graft_cosine_similarity` is the SAME
    * codegen CosineSimilarityExpr the Column API plans, injected via
    * SparkSessionExtensions.injectFunction — SQL users get the fused
    * whole-stage-codegen kernel, not a UDF. */
  def sql_graft_functions(s: SparkSession, dir: String): DataFrame = {
    t(s, dir).embeddings.createOrReplaceTempView("v_emb")
    s.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  graft_cosine_similarity(a.embedding, b.embedding) AS cos_sim
        |FROM v_emb a JOIN v_emb b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 200
        |ORDER BY id_a""".stripMargin)
  }

  val sqlGraftFunctionsSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
      |WHERE a.vec_id < 200
      |ORDER BY id_a""".stripMargin

  /** CORRELATED scalar subquery (ref `unnest_subquery.rs` surface; SURVEY
    * §2.6; complements Relational's uncorrelated `subquery_scalar`): each
    * order compares against ITS customer's average price — Catalyst's
    * RewriteCorrelatedScalarSubquery turns this into an aggregate + join,
    * no per-row re-execution. */
  def subquery_scalar_corr(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS sum_above
        |FROM v_orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM v_orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val subqueryScalarCorrSql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS sum_above
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** IN subquery through the SQL PARSER (Relational's `subquery_in` pins
    * the DataFrame-API semi-join form; this one exercises the full SQL
    * scope path) → left-semi join under Catalyst either way. */
  def subquery_in_sql(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.createOrReplaceTempView("v_orders")
    tt.customer.createOrReplaceTempView("v_customer")
    s.sql(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM v_customer
        |WHERE c_custkey IN (SELECT o_custkey FROM v_orders
        |                    WHERE o_totalprice > 200000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val subqueryInSqlSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 200000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Positive correlated EXISTS with an extra predicate → left-semi join
    * under Catalyst (complements Relational's `subquery_not_exists`
    * anti-join form). */
  def subquery_exists(s: SparkSession, dir: String): DataFrame = {
    val tt = t(s, dir)
    tt.orders.createOrReplaceTempView("v_orders")
    tt.customer.createOrReplaceTempView("v_customer")
    s.sql(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_urgent,
        |  CAST(min(c_custkey) AS BIGINT) AS min_key
        |FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val subqueryExistsSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_urgent,
      |  CAST(min(c_custkey) AS BIGINT) AS min_key
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val sqlEntrySql =
    """WITH cust_orders AS (
      |  SELECT c_mktsegment, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment, round(sum(o_totalprice), 2) AS top3_sum
      |FROM cust_orders WHERE rk <= 3
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Catalog/session facade (ref daft/session.py): attach a parquet path
    * as a table, create a temp table from a query, list both, read back
    * through the catalog and aggregate — the whole facade surface in one
    * verifiable pass. */
  def catalog_session(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.GraftSession(s)
    sess.attachPath("cat_nation", s"$dir/nation.parquet")
    sess.createTempTable("cat_big_nations",
      sess.readTable("cat_nation").filter(col("n_regionkey") >= 2))
    // persistent path (ref session.py create_table/write_table): managed
    // warehouse table, recreated then appended — deterministic per run
    sess.dropTable("cat_persist")
    sess.createTable("cat_persist",
      sess.readTable("cat_nation").filter(col("n_regionkey") < 2))
    sess.writeTable("cat_persist",
      sess.readTable("cat_nation").filter(col("n_regionkey") === 2))
    val listed = sess.listTables()
      .filter(col("tableName").startsWith("cat_"))
      .agg(count(lit(1)).as("n_cat_tables"),
        bool_and(col("isTemporary")).as("all_temp"))
    val persisted = sess.readTable("cat_persist")
      .agg(count(lit(1)).as("n_persist"))
    sess.readTable("cat_big_nations")
      .agg(count(lit(1)).as("n_rows"), min("n_name").as("first_nation"))
      .crossJoin(listed).crossJoin(persisted)
      .select("n_rows", "first_nation", "n_cat_tables", "all_temp", "n_persist")
  }

  val catalogSessionSql =
    """SELECT count(*) AS n_rows, min(n_name) AS first_nation,
      |  CAST(3 AS BIGINT) AS n_cat_tables, false AS all_temp,
      |  (SELECT count(*) FROM nation WHERE n_regionkey <= 2) AS n_persist
      |FROM nation WHERE n_regionkey >= 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "catalog_session" -> (catalog_session _),
    "io_csv_roundtrip" -> (io_csv_roundtrip _),
    "io_json_roundtrip" -> (io_json_roundtrip _),
    "io_partitioned_write" -> (io_partitioned_write _),
    "io_glob_files" -> (io_glob_files _),
    "io_kafka" -> (io_kafka _),
    "streaming_kafka" -> (streaming_kafka _),
    "io_sink_clickhouse" -> (io_sink_clickhouse _),
    "io_sink_turbopuffer" -> (io_sink_turbopuffer _),
    "io_hf_upload" -> (io_hf_upload _),
    "io_range" -> (io_range _),
    "io_generator" -> (io_generator _),
    "io_text_roundtrip" -> (io_text_roundtrip _),
    "io_warc_roundtrip" -> (io_warc_roundtrip _),
    "io_mcap_roundtrip" -> (io_mcap_roundtrip _),
    "io_arrow_roundtrip" -> (io_arrow_roundtrip _),
    "io_delta_roundtrip" -> (io_delta_roundtrip _),
    "io_delta_time_travel" -> (io_delta_time_travel _),
    "io_delta_stats_skip" -> (io_delta_stats_skip _),
    "io_delta_dml" -> (io_delta_dml _),
    "io_delta_dv" -> (io_delta_dv _),
    "io_delta_merge" -> (io_delta_merge _),
    "io_iceberg_roundtrip" -> (io_iceberg_roundtrip _),
    "io_iceberg_stats_skip" -> (io_iceberg_stats_skip _),
    "io_iceberg_dml" -> (io_iceberg_dml _),
    "io_iceberg_v2_deletes" -> (io_iceberg_v2_deletes _),
    "io_iceberg_eq_deletes" -> (io_iceberg_eq_deletes _),
    "io_hudi_roundtrip" -> (io_hudi_roundtrip _),
    "io_hudi_dml" -> (io_hudi_dml _),
    "io_huggingface" -> (io_huggingface _),
    "io_read_sql" -> (io_read_sql _),
    "io_write_sql" -> (io_write_sql _),
    "io_skip_existing" -> (io_skip_existing _),
    "io_write_sink" -> (io_write_sink _),
    "sql_entry" -> (sql_entry _),
    "sql_optimizer_rules" -> (sql_optimizer_rules _),
    "sql_eager_agg" -> (sql_eager_agg _),
    "sql_cbo_reorder" -> (sql_cbo_reorder _),
    "sql_graft_functions" -> (sql_graft_functions _),
    "subquery_scalar_corr" -> (subquery_scalar_corr _),
    "subquery_in_sql" -> (subquery_in_sql _),
    "subquery_exists" -> (subquery_exists _))

  val oracle: Map[String, String] = Map(
    "catalog_session" -> catalogSessionSql,
    "io_csv_roundtrip" -> ioCsvRoundtripSql,
    "io_json_roundtrip" -> ioJsonRoundtripSql,
    "io_partitioned_write" -> ioPartitionedWriteSql,
    "io_glob_files" -> ioGlobFilesSql,
    "io_kafka" -> ioKafkaSql,
    "streaming_kafka" -> streamingKafkaSql,
    "io_sink_clickhouse" -> ioSinkClickhouseSql,
    "io_sink_turbopuffer" -> ioSinkTurbopufferSql,
    "io_hf_upload" -> ioHfUploadSql,
    "io_range" -> ioRangeSql,
    "io_generator" -> ioGeneratorSql,
    "io_text_roundtrip" -> ioTextRoundtripSql,
    "io_warc_roundtrip" -> ioWarcRoundtripSql,
    "io_mcap_roundtrip" -> ioMcapRoundtripSql,
    "io_arrow_roundtrip" -> ioArrowRoundtripSql,
    "io_delta_roundtrip" -> ioDeltaRoundtripSql,
    "io_delta_time_travel" -> ioDeltaTimeTravelSql,
    "io_delta_stats_skip" -> ioDeltaStatsSkipSql,
    "io_delta_dml" -> ioDeltaDmlSql,
    "io_delta_dv" -> ioDeltaDvSql,
    "io_delta_merge" -> ioDeltaMergeSql,
    "io_iceberg_roundtrip" -> ioIcebergRoundtripSql,
    "io_iceberg_stats_skip" -> ioIcebergStatsSkipSql,
    "io_iceberg_dml" -> ioIcebergDmlSql,
    "io_iceberg_v2_deletes" -> ioIcebergV2DeletesSql,
    "io_iceberg_eq_deletes" -> ioIcebergEqDeletesSql,
    "io_hudi_roundtrip" -> ioHudiRoundtripSql,
    "io_hudi_dml" -> ioHudiDmlSql,
    "io_huggingface" -> ioHuggingfaceSql,
    "io_read_sql" -> ioReadSqlSql,
    "io_write_sql" -> ioWriteSqlSql,
    "io_skip_existing" -> ioSkipExistingSql,
    "io_write_sink" -> ioWriteSinkSql,
    "sql_entry" -> sqlEntrySql,
    "sql_optimizer_rules" -> sqlOptimizerRulesSql,
    "sql_eager_agg" -> sqlEagerAggSql,
    "sql_cbo_reorder" -> sqlCboReorderSql,
    "sql_graft_functions" -> sqlGraftFunctionsSql,
    "subquery_scalar_corr" -> subqueryScalarCorrSql,
    "subquery_in_sql" -> subqueryInSqlSql,
    "subquery_exists" -> subqueryExistsSql)
}
