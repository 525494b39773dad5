package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}

import Wire.{Reader, Record}

/** Minimal blocking Kafka client over the public wire protocol
  * (kafka.apache.org/protocol) — enough for a BOUNDED batch read:
  * Metadata v1 (partition discovery + leader routing), ListOffsets v1
  * (watermarks + timestamp→offset), Fetch v4 (RecordBatch v2 payloads),
  * ApiVersions v0 (handshake sanity check).
  *
  * One instance = one connection; NOT thread-safe. Planner code uses one
  * on the driver; each fetch task opens its own against its partition's
  * leader (ref `daft/io/_kafka.py` opens one consumer per source task
  * the same way). */
private[graft] final class KafkaClient(host: String, port: Int, timeoutMs: Int = 30000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream, 1 << 16))
  private var correlation = 0

  private def call(apiKey: Int, apiVersion: Int)(body: Wire.Writer => Unit): Reader = {
    correlation += 1
    val expected = correlation
    out.write(Wire.request(apiKey, apiVersion, expected, body))
    out.flush()
    val frame = Wire.readFrame(in)
    val r = new Reader(frame)
    val got = r.i32()
    require(got == expected, s"correlation mismatch: sent $expected got $got")
    r
  }

  /** ApiVersions v0: (minVersion, maxVersion) per api key. */
  def apiVersions(): Map[Int, (Int, Int)] = {
    val r = call(18, 0)(_ => ())
    val err = r.i16()
    require(err == 0, s"ApiVersions error $err")
    r.array(rr => (rr.i16().toInt, (rr.i16().toInt, rr.i16().toInt))).toMap
  }

  final case class PartitionMeta(partition: Int, leaderId: Int)
  final case class TopicMeta(topic: String, partitions: Seq[PartitionMeta])
  final case class ClusterMeta(brokers: Map[Int, (String, Int)], topics: Seq[TopicMeta])

  /** Metadata v1 for the given topics. */
  def metadata(topics: Seq[String]): ClusterMeta = {
    val r = call(3, 1)(w => w.array(topics)((ww, t) => { ww.str(t); () }))
    val brokers = r.array { rr =>
      val id = rr.i32(); val host = rr.str(); val port = rr.i32(); rr.str() // rack
      id -> (host, port)
    }.toMap
    r.i32() // controller_id
    val tms = r.array { rr =>
      val err = rr.i16()
      val name = rr.str()
      rr.i8() // is_internal
      val parts = rr.array { pr =>
        val perr = pr.i16()
        val idx = pr.i32()
        val leader = pr.i32()
        pr.array(_.i32()) // replicas
        pr.array(_.i32()) // isr
        require(perr == 0, s"Metadata partition error $perr for $name/$idx")
        PartitionMeta(idx, leader)
      }
      require(err == 0, s"topic not found or errored: $name (error $err)")
      TopicMeta(name, parts)
    }
    ClusterMeta(brokers, tms)
  }

  /** ListOffsets v1 for one partition. `timestamp` −2 = earliest,
    * −1 = latest, else: earliest offset with timestamp ≥ the given one
    * (−1 offset when the timestamp is past the end of the log). */
  def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
    val r = call(2, 1) { w =>
      w.i32(-1) // replica_id
      w.array(Seq(topic)) { (ww, t) =>
        ww.str(t)
        ww.array(Seq(partition)) { (pw, p) => pw.i32(p).i64(timestamp); () }
        ()
      }
    }
    var result = -1L
    r.array { tr =>
      tr.str()
      tr.array { pr =>
        val idx = pr.i32(); val err = pr.i16(); pr.i64() // timestamp
        val off = pr.i64()
        require(err == 0, s"ListOffsets error $err for $topic/$idx")
        if (idx == partition) result = off
      }
    }
    result
  }

  /** Fetch v4: records from `offset` (one round trip — the caller loops
    * until its end offset). Returns (highWatermark, records). */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 4 << 20, maxWaitMs: Int = 500): (Long, Seq[Record]) = {
    val r = call(1, 4) { w =>
      w.i32(-1)        // replica_id
      w.i32(maxWaitMs) // max_wait_ms
      w.i32(1)         // min_bytes
      w.i32(maxBytes)  // max_bytes (response-level)
      w.i8(0)          // isolation_level: read_uncommitted
      w.array(Seq(topic)) { (ww, t) =>
        ww.str(t)
        ww.array(Seq(partition)) { (pw, p) => pw.i32(p).i64(offset).i32(maxBytes); () }
        ()
      }
    }
    r.i32() // throttle_time_ms
    var hw = -1L
    var records: Seq[Record] = Nil
    r.array { tr =>
      tr.str()
      tr.array { pr =>
        val idx = pr.i32(); val err = pr.i16()
        val highWatermark = pr.i64()
        pr.i64() // last_stable_offset
        pr.array { ar => ar.i64(); ar.i64() } // aborted_transactions
        val recordSet = pr.bytes()
        require(err == 0, s"Fetch error $err for $topic/$idx")
        if (idx == partition) {
          hw = highWatermark
          records = Wire.decodeRecordBatches(recordSet)
        }
      }
    }
    (hw, records)
  }

  override def close(): Unit = socket.close()
}
