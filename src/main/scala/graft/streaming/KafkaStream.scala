package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.kafka.{Kafka, KafkaClient, Wire}

/** Structured-Streaming Kafka source over the same wire client as the
  * bounded batch read (`graft.sources.kafka`) — `spark.readStream
  * .format("graft-kafka")`. The reference has NO streaming engine
  * (SURVEY §2.9); its `read_kafka` (`daft/io/_kafka.py`) is batch-only,
  * so this is superset surface: exactly-once micro-batches with offsets
  * tracked in the checkpoint log, `maxOffsetsPerTrigger` admission
  * control, and `Trigger.AvailableNow` support via Spark's wrapper.
  *
  * Scale shape: planning is O(partitions) driver-side metadata round
  * trips per micro-batch (KBs); each micro-batch runs one task per Kafka
  * partition fetching ONLY its own [start,end) slice from its leader —
  * identical parallelism to the batch path, so a 1000-partition topic
  * spreads over a 1000-executor cluster with no driver data path.
  * Replay is deterministic (fetch by offset), which is what makes the
  * checkpointed offsets exactly-once under retry.
  */
object KafkaStream {
  /** partition state: (topic, partition) → next offset to read. */
  type PartOffsets = Map[(String, Int), Long]

  private val om = new ObjectMapper

  /** Offset = the full per-partition cursor map, as stable JSON
    * (`{"topic":{"0":12,...},...}` with sorted keys — byte-identical
    * re-serialization so the offset log never sees spurious changes). */
  final case class KOffset(parts: PartOffsets) extends Offset {
    override def json(): String = {
      val root = om.createObjectNode()
      parts.groupBy(_._1._1).toSeq.sortBy(_._1).foreach { case (topic, ps) =>
        val tn = root.putObject(topic)
        ps.toSeq.map { case ((_, p), o) => (p, o) }.sortBy(_._1)
          .foreach { case (p, o) => tn.put(p.toString, o) }
      }
      om.writeValueAsString(root)
    }
  }

  def parseOffset(json: String): KOffset = {
    val root = om.readTree(json)
    val b = Map.newBuilder[(String, Int), Long]
    root.properties().asScala.foreach { e =>
      e.getValue.asInstanceOf[ObjectNode].properties().asScala.foreach { pe =>
        b += ((e.getKey, pe.getKey.toInt) -> pe.getValue.asLong)
      }
    }
    KOffset(b.result())
  }

  /** One fetch slice, shipped to its task. */
  final case class KSlice(topic: String, partition: Int, host: String,
      port: Int, start: Long, end: Long) extends InputPartition

  private[streaming] final case class Opts(bootstrap: String, topics: Seq[String],
      startLatest: Boolean, maxPerTrigger: Option[Long], timeoutMs: Int)

  private[streaming] def parseOpts(options: CaseInsensitiveStringMap): Opts = {
    val bootstrap = Option(options.get("kafka.bootstrap.servers"))
      .orElse(Option(options.get("bootstrap")))
      .getOrElse(throw new IllegalArgumentException(
        "graft-kafka requires option kafka.bootstrap.servers (or bootstrap)"))
    val topics = Option(options.get("topics")).orElse(Option(options.get("topic")))
      .getOrElse(throw new IllegalArgumentException("graft-kafka requires option topics"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val startLatest = Option(options.get("startingoffsets")) match {
      case None | Some("earliest") => false
      case Some("latest") => true
      case Some(other) => throw new IllegalArgumentException(
        s"startingOffsets must be earliest or latest, got $other")
    }
    Opts(bootstrap, topics, startLatest,
      Option(options.get("maxoffsetspertrigger")).map(_.toLong),
      Option(options.get("timeoutms")).map(_.toInt).getOrElse(30000))
  }

  private def hostPort(bootstrap: String): (String, Int) = {
    val first = bootstrap.split(",").head.trim
    val i = first.lastIndexOf(':')
    require(i > 0, s"bootstrap server must be host:port, got $first")
    (first.substring(0, i), first.substring(i + 1).toInt)
  }

  /** Current watermark (per partition) + leader routing, one connection. */
  private[streaming] def survey(opts: Opts, earliest: Boolean)
      : (PartOffsets, Map[(String, Int), (String, Int)]) = {
    val (lows, highs, leaders) = surveyFull(opts)
    (if (earliest) lows else highs, leaders)
  }

  /** Low + high watermarks and leader routing, one connection. */
  private[streaming] def surveyFull(opts: Opts)
      : (PartOffsets, PartOffsets, Map[(String, Int), (String, Int)]) = {
    val (h, p) = hostPort(opts.bootstrap)
    val client = new KafkaClient(h, p, opts.timeoutMs)
    try {
      val meta = client.metadata(opts.topics)
      val lows = Map.newBuilder[(String, Int), Long]
      val highs = Map.newBuilder[(String, Int), Long]
      val leaders = Map.newBuilder[(String, Int), (String, Int)]
      for (tm <- meta.topics; pm <- tm.partitions) {
        lows += ((tm.topic, pm.partition) -> client.listOffset(tm.topic, pm.partition, -2L))
        highs += ((tm.topic, pm.partition) -> client.listOffset(tm.topic, pm.partition, -1L))
        leaders += ((tm.topic, pm.partition) -> meta.brokers.getOrElse(pm.leaderId, (h, p)))
      }
      (lows.result(), highs.result(), leaders.result())
    } finally client.close()
  }
}

/** `format("graft-kafka")` provider: fixed schema, micro-batch + batch. */
final class KafkaStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Kafka.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaStreamTable(new CaseInsensitiveStringMap(properties))
}

final class KafkaStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val opts = KafkaStream.parseOpts(options)
  override def name(): String = s"graft-kafka(${opts.topics.mkString(",")})"
  override def schema(): StructType = Kafka.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaScan(opts)
    }
}

final class KafkaScan(opts: KafkaStream.Opts) extends Scan {
  import KafkaStream._
  override def readSchema(): StructType = Kafka.schema
  override def description(): String = s"graft-kafka ${opts.topics.mkString(",")}"

  /** Batch parity: earliest→latest snapshot, one task per partition. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val (lows, highs, leaders) = surveyFull(opts)
      lows.toSeq.sortBy(_._1).flatMap { case (tp, lo) =>
        val hi = highs.getOrElse(tp, lo)
        val (lh, lp) = leaders(tp)
        if (hi > lo) Some(KSlice(tp._1, tp._2, lh, lp, lo, hi)) else None
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KafkaReaderFactory(opts.timeoutMs)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaMicroBatchStream(opts)
}

final class KafkaMicroBatchStream(opts: KafkaStream.Opts)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import KafkaStream._

  /** Trigger.AvailableNow contract: the end of "available" is FROZEN at
    * query start — batches chip away at this fixed target (respecting
    * maxOffsetsPerTrigger) and the query terminates when it's reached,
    * even while producers keep appending. */
  @volatile private var frozenTarget: Option[PartOffsets] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenTarget = Some(survey(opts, earliest = false)._1)

  override def initialOffset(): Offset =
    KOffset(survey(opts, earliest = !opts.startLatest)._1)

  override def getDefaultReadLimit: ReadLimit =
    opts.maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def reportLatestOffset(): Offset =
    KOffset(survey(opts, earliest = false)._1)

  /** Cap the batch at `maxOffsetsPerTrigger` rows, distributed across
    * partitions proportionally to their backlog (the fair split the
    * Kafka connector uses — a greedy split would starve later
    * partitions behind one deep backlog). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KOffset].parts
    val (lows, liveHighs, _) = surveyFull(opts)
    val highs = frozenTarget.getOrElse(liveHighs)
    // a partition added AFTER query start has no cursor yet: begin at its
    // LOW watermark so rows produced before discovery are not lost (the
    // Kafka connector's new-partition semantics) — starting at the high
    // watermark would silently drop the discovery gap
    val effFrom = highs.map { case (tp, hi) =>
      tp -> from.getOrElse(tp, lows.getOrElse(tp, hi)) }
    val capped = limit match {
      case _: ReadAllAvailable => highs
      case r: ReadMaxRows =>
        val backlog = highs.map { case (tp, hi) =>
          tp -> math.max(0L, hi - effFrom(tp)) }
        val total = backlog.values.sum
        if (total <= r.maxRows) highs
        else {
          val f = r.maxRows.toDouble / total
          highs.map { case (tp, hi) =>
            // round sub-1 prorations UP (the upstream connector's rateLimit
            // rule): with many backlogged partitions and a small trigger cap,
            // flooring every share to 0 would make end==start forever and
            // Trigger.AvailableNow could never reach its frozen target
            val share = backlog(tp) * f
            val give = if (share > 0 && share < 1) 1L else math.floor(share).toLong
            tp -> (effFrom(tp) + give) }
        }
      case _ => highs // unknown composite limit: take everything available
    }
    KOffset(effFrom ++ capped.map { case (tp, end) =>
      tp -> math.max(effFrom(tp), end) })
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KOffset].parts
    val e = end.asInstanceOf[KOffset].parts
    val (lows, _, leaders) = surveyFull(opts)
    // same new-partition default as latestOffset: no cursor → low watermark
    def startOf(tp: (String, Int), hi: Long) =
      s.getOrElse(tp, lows.getOrElse(tp, hi))
    if (e.forall { case (tp, hi) => startOf(tp, hi) >= hi }) return Array.empty
    val (bh, bp) = {
      val first = opts.bootstrap.split(",").head.trim
      val i = first.lastIndexOf(':')
      (first.substring(0, i), first.substring(i + 1).toInt)
    }
    e.toSeq.sortBy(_._1).flatMap { case (tp, hi) =>
      val lo = startOf(tp, hi)
      val (lh, lp) = leaders.getOrElse(tp, (bh, bp))
      if (hi > lo) Some(KSlice(tp._1, tp._2, lh, lp, lo, hi)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaReaderFactory(opts.timeoutMs)

  override def deserializeOffset(json: String): Offset = parseOffset(json)
  override def commit(end: Offset): Unit = () // offsets live in the checkpoint log
  override def stop(): Unit = ()
}

final class KafkaReaderFactory(timeoutMs: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaPartitionReader(partition.asInstanceOf[KafkaStream.KSlice], timeoutMs)
}

/** Streams one [start,end) slice from its partition leader — the same
  * fetch loop as the batch path (`Kafka.read`), emitting InternalRow. */
final class KafkaPartitionReader(sl: KafkaStream.KSlice, timeoutMs: Int)
    extends PartitionReader[InternalRow] {
  private val client = new KafkaClient(sl.host, sl.port, timeoutMs)
  private var pos = sl.start
  private var buf: Iterator[Wire.Record] = Iterator.empty
  private var cur: Wire.Record = _

  override def next(): Boolean = {
    while (!buf.hasNext && pos < sl.end) {
      val (_, recs) = client.fetch(sl.topic, sl.partition, pos)
      val trimmed = recs.filter(r => r.offset >= pos && r.offset < sl.end)
      if (recs.nonEmpty) pos = math.max(pos + 1, recs.map(_.offset).max + 1)
      else pos = sl.end // at/after high watermark: slice exhausted
      buf = trimmed.iterator
    }
    if (buf.hasNext) { cur = buf.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(sl.topic), sl.partition, cur.offset,
      cur.timestampMs, cur.key, cur.value)

  override def close(): Unit = client.close()
}
