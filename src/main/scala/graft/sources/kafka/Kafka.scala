package graft.sources.kafka

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Bounded Kafka batch read (ref `daft/io/_kafka.py` `read_kafka`):
  * a fixed 6-column schema and explicit start/end bounds resolved to
  * concrete offsets per partition at PLANNING time, so the read is a
  * deterministic, repeatable batch — not a stream.
  *
  * Scale shape: planning is one driver-side metadata+ListOffsets pass
  * (O(partitions) round trips, KBs); data movement is one Spark task per
  * Kafka partition, each fetching ONLY its own [start,end) range from its
  * partition's leader broker — the same per-partition parallelism the
  * reference gets from one DataSourceTask per partition, and exactly how
  * a 1000-partition topic spreads over a 1000-executor cluster. No
  * driver-side row ever materializes.
  *
  * Bound semantics mirror the reference (`_resolve_bound`): earliest/
  * latest watermarks, epoch-millis timestamps (resolved broker-side via
  * ListOffsets, −1 → end of log), explicit per-partition offset maps
  * clamped to the live [low, high] watermark range. */
object Kafka {

  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true)))

  /** A start/end bound, normalized (ref `_normalize_bound`). */
  sealed trait Bound
  case object Earliest extends Bound
  case object Latest extends Bound
  final case class TimestampMs(ms: Long) extends Bound
  /** topic → partition → offset; must cover exactly the topics read. */
  final case class Offsets(byTopic: Map[String, Map[Int, Long]]) extends Bound

  /** One planned fetch slice: everything a task needs, serializable. */
  private final case class Slice(topic: String, partition: Int,
      host: String, port: Int, start: Long, end: Long)

  def read(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      start: Bound = Earliest,
      end: Bound = Latest,
      partitions: Option[Set[Int]] = None,
      timeoutMs: Int = 30000): DataFrame = {
    require(topics.nonEmpty, "read_kafka requires at least one topic")
    (start, end) match {
      case (Offsets(m), _) => requireExactTopics(m, topics, "start")
      case _ => ()
    }
    end match {
      case Offsets(m) => requireExactTopics(m, topics, "end")
      case _ => ()
    }

    val (host, port) = hostPort(bootstrapServers)
    val slices: Seq[Slice] = {
      val client = new KafkaClient(host, port, timeoutMs)
      try {
        val meta = client.metadata(topics)
        for {
          tm <- meta.topics
          pm <- tm.partitions
          if partitions.forall(_.contains(pm.partition))
          slice <- {
            val low = client.listOffset(tm.topic, pm.partition, -2L)
            val high = client.listOffset(tm.topic, pm.partition, -1L)
            val s = resolve(client, start, tm.topic, pm.partition, low, high)
            val e = resolve(client, end, tm.topic, pm.partition, low, high)
            val (lh, lp) = meta.brokers.getOrElse(pm.leaderId, (host, port))
            if (s < e) Some(Slice(tm.topic, pm.partition, lh, lp, s, e)) else None
          }
        } yield slice
      } finally client.close()
    }

    if (slices.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

    // one Spark task per Kafka partition slice
    val taskTimeoutMs = timeoutMs
    val rows = spark.sparkContext
      .parallelize(slices, slices.length)
      .flatMap { sl =>
        new Iterator[Row] {
          private val client = new KafkaClient(sl.host, sl.port, taskTimeoutMs)
          private var pos = sl.start
          private var buf: Iterator[Wire.Record] = Iterator.empty
          private var open = true
          private def fill(): Unit = {
            while (open && !buf.hasNext && pos < sl.end) {
              val (_, recs) = client.fetch(sl.topic, sl.partition, pos)
              // a fetch may return a batch starting before `pos` (batches
              // are stored whole) or rows past `end` — trim both sides
              val trimmed = recs.filter(r => r.offset >= pos && r.offset < sl.end)
              if (recs.nonEmpty) pos = math.max(pos + 1, recs.map(_.offset).max + 1)
              else pos = sl.end // empty fetch at/after high watermark: done
              buf = trimmed.iterator
            }
            if (open && !buf.hasNext && pos >= sl.end) { client.close(); open = false }
          }
          override def hasNext: Boolean = { fill(); buf.hasNext }
          override def next(): Row = {
            fill()
            val r = buf.next()
            Row(sl.topic, sl.partition, r.offset, r.timestampMs, r.key, r.value)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def requireExactTopics(m: Map[String, Map[Int, Long]],
      topics: Seq[String], which: String): Unit = {
    val provided = m.keySet
    val expected = topics.toSet
    require(provided == expected,
      s"read_kafka $which offsets must cover exactly the topics being read; " +
        s"expected=$expected provided=$provided")
    m.foreach { case (t, po) =>
      require(po.nonEmpty, s"read_kafka $which offset map for $t must be non-empty")
      po.foreach { case (p, o) => require(o >= 0, s"partition offsets must be >= 0 ($t/$p=$o)") }
    }
  }

  private def resolve(client: KafkaClient, bound: Bound,
      topic: String, partition: Int, low: Long, high: Long): Long = bound match {
    case Earliest => low
    case Latest => high
    case TimestampMs(ts) =>
      val off = client.listOffset(topic, partition, ts)
      if (off < 0) high // timestamp past the last message: end of log
      else math.max(low, math.min(high, off))
    case Offsets(m) =>
      val configured = m.getOrElse(topic, Map.empty).getOrElse(partition,
        throw new IllegalArgumentException(
          s"missing offset for partition $partition of topic $topic"))
      math.max(low, math.min(high, configured))
  }

  private def hostPort(bootstrap: String): (String, Int) = {
    // first entry of a comma-separated bootstrap list (any broker answers
    // metadata; fetch routing uses the leader map from metadata)
    val first = bootstrap.split(",").head.trim
    val i = first.lastIndexOf(':')
    require(i > 0, s"bootstrap server must be host:port, got $first")
    (first.substring(0, i), first.substring(i + 1).toInt)
  }
}
