package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import Wire.{Reader, Record, Writer}

/** In-memory single-node broker speaking the same wire-protocol subset
  * [[KafkaClient]] consumes (ApiVersions v0, Metadata v1, ListOffsets v1,
  * Fetch v4, RecordBatch v2) — the test double for the bounded Kafka
  * source, in the mold of the stub HTTP server behind the LLM client
  * spec: no Kafka jar exists in this environment, so conformance is
  * checked against an independent implementation of the published
  * protocol rather than a mock of our own client.
  *
  * Thread-per-connection; logs live in memory as per-partition vectors.
  * NOT a production broker — no replication, no groups, no produce API
  * (tests append via [[append]]). */
final class MiniBroker extends AutoCloseable {

  private val logs = new ConcurrentHashMap[(String, Int), Vector[Record]]()
  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  val port: Int = server.getLocalPort
  def bootstrap: String = s"127.0.0.1:$port"

  /** Append a message; offsets are assigned densely per partition. */
  def append(topic: String, partition: Int, timestampMs: Long,
      key: Array[Byte], value: Array[Byte]): Long = {
    var assigned = -1L
    logs.compute((topic, partition), (_, cur) => {
      val log = if (cur == null) Vector.empty else cur
      assigned = log.length.toLong
      log :+ Record(assigned, timestampMs, key, value)
    })
    assigned
  }

  def createTopic(topic: String, partitions: Int): Unit =
    (0 until partitions).foreach(p => logs.putIfAbsent((topic, p), Vector.empty))

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // socket closed on shutdown
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(socket: Socket): Unit = {
    try {
      val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
      val out = new DataOutputStream(socket.getOutputStream)
      while (true) {
        val frame = Wire.readFrame(in)
        val r = new Reader(frame)
        val apiKey = r.i16()
        val apiVersion = r.i16()
        val correlationId = r.i32()
        r.str() // client_id
        val body = new Writer
        body.i32(correlationId)
        apiKey match {
          case 18 => apiVersionsV0(body)
          case 3 => metadataV1(r, body)
          case 2 => listOffsetsV1(r, body)
          case 1 => fetchV4(r, body)
          case k => throw new IllegalArgumentException(s"MiniBroker: unsupported api key $k v$apiVersion")
        }
        Wire.writeFrame(out, body.result())
      }
    } catch { case _: Throwable => () } finally socket.close()
  }

  private def apiVersionsV0(body: Writer): Unit = {
    body.i16(0) // error
    body.array(Seq((18, 0, 0), (3, 0, 9), (2, 0, 5), (1, 4, 11))) {
      case (w, (k, lo, hi)) => w.i16(k).i16(lo).i16(hi); ()
    }
  }

  private def metadataV1(r: Reader, body: Writer): Unit = {
    val requested = r.array(_.str())
    val known = logs.keySet.asScala.toSeq
    val topics = (if (requested.isEmpty) known.map(_._1).distinct else requested).distinct
    body.array(Seq(0)) { (w, id) => // brokers
      w.i32(id).str("127.0.0.1").i32(port).str(null); ()
    }
    body.i32(0) // controller_id
    body.array(topics) { (w, t) =>
      val parts = known.filter(_._1 == t).map(_._2).sorted
      if (parts.isEmpty) {
        w.i16(3) // UNKNOWN_TOPIC_OR_PARTITION
        w.str(t).i8(0)
        w.array(Seq.empty[Int])((_, _) => ())
      } else {
        w.i16(0)
        w.str(t).i8(0)
        w.array(parts) { (pw, p) =>
          pw.i16(0).i32(p).i32(0) // error, index, leader
          pw.array(Seq(0))((rw, b) => { rw.i32(b); () }) // replicas
          pw.array(Seq(0))((rw, b) => { rw.i32(b); () }) // isr
          ()
        }
      }
      ()
    }
  }

  private def listOffsetsV1(r: Reader, body: Writer): Unit = {
    r.i32() // replica_id
    val req = r.array { tr =>
      val t = tr.str()
      t -> tr.array(pr => (pr.i32(), pr.i64()))
    }
    body.array(req) { case (w, (topic, parts)) =>
      w.str(topic)
      w.array(parts) { case (pw, (p, ts)) =>
        val log = Option(logs.get((topic, p)))
        log match {
          case None => pw.i32(p).i16(3).i64(-1L).i64(-1L)
          case Some(l) =>
            val off = ts match {
              case -2L => 0L
              case -1L => l.length.toLong
              case t => l.find(_.timestampMs >= t).map(_.offset).getOrElse(-1L)
            }
            pw.i32(p).i16(0).i64(ts).i64(off)
        }
        ()
      }
      ()
    }
  }

  private def fetchV4(r: Reader, body: Writer): Unit = {
    r.i32(); r.i32(); r.i32(); r.i32(); r.i8() // replica, wait, min, max, isolation
    val req = r.array { tr =>
      val t = tr.str()
      t -> tr.array(pr => (pr.i32(), pr.i64(), pr.i32()))
    }
    body.i32(0) // throttle_time_ms
    body.array(req) { case (w, (topic, parts)) =>
      w.str(topic)
      w.array(parts) { case (pw, (p, offset, partMaxBytes)) =>
        Option(logs.get((topic, p))) match {
          case None =>
            pw.i32(p).i16(3).i64(-1L).i64(-1L)
            pw.array(Seq.empty[Int])((_, _) => ())
            pw.bytes(null)
          case Some(log) =>
            val hw = log.length.toLong
            pw.i32(p).i16(0).i64(hw).i64(hw)
            pw.array(Seq.empty[Int])((_, _) => ()) // aborted_transactions
            if (offset >= hw) pw.bytes(Array.emptyByteArray)
            else {
              // batches of ≤100 records, ≤500 records per response —
              // forces the client through multi-batch decode AND the
              // multi-round-trip fetch loop that real partMaxBytes
              // truncation produces
              val out = new Writer
              var i = offset.toInt
              var emitted = 0
              val cap = math.min(500, math.max(1, partMaxBytes / 64))
              while (i < log.length && emitted < cap) {
                val group = log.slice(i, math.min(i + 100, log.length))
                out.raw(Wire.encodeRecordBatch(group.head.offset, group))
                emitted += group.length
                i += group.length
              }
              pw.bytes(out.result())
            }
        }
        ()
      }
      ()
    }
  }

  override def close(): Unit = {
    running = false
    server.close()
  }
}
