package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** MCAP source/sink — the open container format for multimodal robotics /
  * sensor logs (public spec at mcap.dev; ref `daft/io/mcap/_mcap.py:96`,
  * output schema mirrors the reference's `read_mcap`: topic, log_time,
  * publish_time, sequence, data).
  *
  * Format (from the public spec): 8-byte magic `\x89MCAP0\r\n`, then
  * records of `opcode u8 + length u64le + content`, closed by a Footer
  * record and the magic again. Messages reference a Channel (id → topic)
  * and may ride inside Chunk records whose payload is an embedded record
  * stream, optionally lz4- or zstd-compressed.
  *
  * Scale shape (same as [[Warc]]): Spark plans the file LISTING
  * (binaryFile + glob, partitioned by file — MCAP files are not splittable
  * at arbitrary offsets without the summary index), and each task STREAMS
  * its files record-by-record. Memory is bounded by one record / one
  * decompressed chunk. Topic and time filters (the reference's
  * `topics`/`start_time`/`end_time` pushdowns) are applied during the
  * parse, before rows are materialized.
  */
object Mcap {

  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("log_time", LongType),
    StructField("publish_time", LongType),
    StructField("sequence", IntegerType),
    StructField("data", StringType)))

  private val Magic: Array[Byte] =
    Array(0x89.toByte, 'M', 'C', 'A', 'P', '0', '\r', '\n').map(_.toByte)

  // record opcodes (public spec §records)
  private val OpHeader = 0x01
  private val OpFooter = 0x02
  private val OpSchema = 0x03
  private val OpChannel = 0x04
  private val OpMessage = 0x05
  private val OpChunk = 0x06
  private val OpDataEnd = 0x0F

  /** Read MCAP file(s) (glob supported) into the reference-shaped frame,
    * with the reference's pushdowns: topic set and [start, end) log-time
    * window (nanoseconds, same unit as message.log_time). */
  def read(
      spark: SparkSession,
      path: String,
      topics: Option[Seq[String]] = None,
      startTime: Option[Long] = None,
      endTime: Option[Long] = None): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"))
    val enc = Encoders.row(schema)
    val topicSet = topics.map(_.toSet)
    files.flatMap { fileRow =>
      val p = fileRow.getString(0)
      val local = if (p.startsWith("file:")) Paths.get(new java.net.URI(p)) else Paths.get(p)
      val in = new BufferedInputStream(Files.newInputStream(local), 1 << 16)
      // close on task end regardless of iterator consumption — a limit()
      // that abandons the iterator mid-file must not leak the fd
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
      parseStream(in, topicSet, startTime, endTime)
    }(enc)
  }

  /** Stream messages off an MCAP byte stream, one Row per message. */
  private[graft] def parseStream(
      raw: InputStream,
      topics: Option[Set[String]],
      startTime: Option[Long],
      endTime: Option[Long]): Iterator[Row] = {
    val din = new DataInputStream(raw)
    val magic = new Array[Byte](8)
    din.readFully(magic)
    if (!java.util.Arrays.equals(magic, Magic))
      throw new java.io.IOException("not an MCAP file (bad magic)")

    // channel id → topic, shared across top-level and chunk-embedded records
    val channels = mutable.Map.empty[Int, String]

    def keep(topic: String, logTime: Long): Boolean =
      topics.forall(_.contains(topic)) &&
        startTime.forall(logTime >= _) && endTime.forall(logTime < _)

    def parseChannel(content: Array[Byte]): Unit = {
      val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      val id = b.getShort & 0xffff
      b.getShort // schema_id (unused: data surfaces as a string column)
      channels(id) = getString(b)
    }

    def parseMessage(content: Array[Byte]): Row = {
      val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      val channelId = b.getShort & 0xffff
      val sequence = b.getInt
      val logTime = b.getLong
      val publishTime = b.getLong
      val topic = channels.getOrElse(channelId,
        throw new java.io.IOException(s"message references unknown channel $channelId"))
      if (!keep(topic, logTime)) null
      else {
        val data = new String(content, b.position(), content.length - b.position(),
          StandardCharsets.UTF_8)
        Row(topic, logTime, publishTime, sequence, data)
      }
    }

    // one decompressed chunk's messages, parsed eagerly (bounded by the
    // chunk's uncompressed_size — the format's own batching unit)
    def parseChunk(content: Array[Byte]): Iterator[Row] = {
      val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      b.getLong; b.getLong; b.getLong // message start/end time, uncompressed size
      b.getInt // uncompressed_crc (0 = absent)
      val compression = getString(b)
      val recLen = b.getLong
      val compressed = new Array[Byte](recLen.toInt)
      b.get(compressed)
      val recBytes: InputStream = compression match {
        case "" => new ByteArrayInputStream(compressed)
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(
          new ByteArrayInputStream(compressed))
        case "zstd" => new com.github.luben.zstd.ZstdInputStream(
          new ByteArrayInputStream(compressed))
        case other => throw new java.io.IOException(s"unsupported chunk compression: $other")
      }
      val cin = new DataInputStream(recBytes)
      val rows = mutable.ArrayBuffer.empty[Row]
      var done = false
      while (!done) {
        val op = cin.read()
        if (op < 0) done = true
        else {
          val len = readLongLE(cin)
          val body = new Array[Byte](len.toInt)
          cin.readFully(body)
          op match {
            case OpChannel => parseChannel(body)
            case OpMessage =>
              val r = parseMessage(body)
              if (r != null) rows += r
            case _ => () // schemas / indexes: skipped
          }
        }
      }
      rows.iterator
    }

    new Iterator[Row] {
      private var pending: Iterator[Row] = Iterator.empty
      private var nextRow: Row = fetch()

      private def fetch(): Row = {
        while (true) {
          if (pending.hasNext) return pending.next()
          val op = din.read()
          if (op < 0) return null
          val len = readLongLE(din)
          op match {
            case OpFooter | OpDataEnd =>
              // no messages past the data section; don't re-read the
              // summary's repeated channel/schema records
              return null
            case OpChannel | OpMessage | OpChunk =>
              val body = new Array[Byte](len.toInt)
              try din.readFully(body)
              catch { case _: EOFException => throw new java.io.IOException("truncated MCAP record") }
              op match {
                case OpChannel => parseChannel(body)
                case OpMessage =>
                  val r = parseMessage(body)
                  if (r != null) return r
                case OpChunk => pending = parseChunk(body)
              }
            case _ =>
              // header / schema / indexes / attachments: skip content
              var toSkip = len
              while (toSkip > 0) {
                val s = din.skip(toSkip)
                if (s <= 0) throw new java.io.IOException("truncated MCAP record")
                toSkip -= s
              }
          }
        }
        null // unreachable
      }

      def hasNext: Boolean = nextRow != null
      def next(): Row = {
        val r = nextRow
        nextRow = fetch()
        r
      }
    }
  }

  // ---- writer (distributed sink + fixture generator) ----------------------

  /** Write one MCAP file per partition, round-trippable by [[read]]. Rows
    * supply (topic, log_time, publish_time, sequence, data-string) columns;
    * messages go into one Chunk per file with the given compression
    * ("none" | "lz4" | "zstd"). */
  def write(
      df: DataFrame, outDir: String,
      topicCol: String, logTimeCol: String, publishTimeCol: String,
      sequenceCol: String, dataCol: String,
      compression: String = "lz4"): Unit = {
    require(Set("none", "lz4", "zstd")(compression), s"compression=$compression")
    val tIdx = df.schema.fieldIndex(topicCol)
    val lIdx = df.schema.fieldIndex(logTimeCol)
    val pIdx = df.schema.fieldIndex(publishTimeCol)
    val sIdx = df.schema.fieldIndex(sequenceCol)
    val dIdx = df.schema.fieldIndex(dataCol)
    Files.createDirectories(Paths.get(outDir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = Files.newOutputStream(
          Paths.get(outDir, f"part-$pid%05d.mcap"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        try writeFile(out, rows, tIdx, lIdx, pIdx, sIdx, dIdx, compression)
        finally out.close()
      }
    }
  }

  private def writeFile(
      out: java.io.OutputStream, rows: Iterator[Row],
      tIdx: Int, lIdx: Int, pIdx: Int, sIdx: Int, dIdx: Int,
      compression: String): Unit = {
    out.write(Magic)
    writeRecord(out, OpHeader, { b =>
      putString(b, "") // profile
      putString(b, "graft") // library
    })
    // channel + message records build the (uncompressed) chunk payload
    val chunkBody = new java.io.ByteArrayOutputStream()
    val topicIds = mutable.LinkedHashMap.empty[String, Int]
    var minLog = Long.MaxValue
    var maxLog = Long.MinValue
    rows.foreach { r =>
      val topic = r.getString(tIdx)
      val id = topicIds.getOrElseUpdate(topic, {
        val nid = topicIds.size + 1
        writeRecord(chunkBody, OpChannel, { b =>
          b.putShort(nid.toShort) // id
          b.putShort(0.toShort) // schema_id 0 = schema-less
          putString(b, topic)
          putString(b, "json") // message_encoding
          b.putInt(0) // empty metadata map
        })
        nid
      })
      val logTime = r.getLong(lIdx)
      minLog = math.min(minLog, logTime)
      maxLog = math.max(maxLog, logTime)
      val data = r.getString(dIdx).getBytes(StandardCharsets.UTF_8)
      writeRecord(chunkBody, OpMessage, { b =>
        b.putShort(id.toShort)
        b.putInt(r.getInt(sIdx))
        b.putLong(logTime)
        b.putLong(r.getLong(pIdx))
        b.put(data)
      }, extra = data.length)
    }
    val uncompressed = chunkBody.toByteArray
    val packed = compression match {
      case "none" => uncompressed
      case "lz4" =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        z.write(uncompressed); z.close()
        bos.toByteArray
      case "zstd" => com.github.luben.zstd.Zstd.compress(uncompressed)
    }
    writeRecord(out, OpChunk, { b =>
      b.putLong(if (minLog == Long.MaxValue) 0L else minLog)
      b.putLong(if (maxLog == Long.MinValue) 0L else maxLog)
      b.putLong(uncompressed.length.toLong)
      b.putInt(0) // crc not computed
      putString(b, if (compression == "none") "" else compression)
      b.putLong(packed.length.toLong)
      b.put(packed)
    }, extra = packed.length)
    writeRecord(out, OpDataEnd, _.putInt(0)) // data_section_crc = 0
    writeRecord(out, OpFooter, { b =>
      b.putLong(0L); b.putLong(0L); b.putInt(0) // no summary section
    })
    out.write(Magic)
  }

  // ---- binary helpers (all MCAP ints are little-endian) --------------------

  private def readLongLE(din: DataInputStream): Long = {
    val b = new Array[Byte](8)
    din.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  private def getString(b: ByteBuffer): String = {
    val n = b.getInt
    val arr = new Array[Byte](n)
    b.get(arr)
    new String(arr, StandardCharsets.UTF_8)
  }

  private def putString(b: ByteBuffer, s: String): Unit = {
    val arr = s.getBytes(StandardCharsets.UTF_8)
    b.putInt(arr.length)
    b.put(arr)
  }

  /** Serialize one record: opcode, u64le content length, content. The
    * builder starts from a conservatively-sized buffer (256B + payload)
    * and grows on demand — a Channel record with a long topic string
    * must not overflow a fixed buffer. */
  private def writeRecord(out: java.io.OutputStream, op: Int,
      fill: ByteBuffer => Unit, extra: Int = 0): Unit = {
    var cap = 256 + extra
    var b: ByteBuffer = null
    var done = false
    while (!done) {
      b = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)
      try { fill(b); done = true }
      catch { case _: java.nio.BufferOverflowException => cap *= 2 }
    }
    val content = java.util.Arrays.copyOf(b.array(), b.position())
    val hdr = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(op.toByte)
    hdr.putLong(content.length.toLong)
    out.write(hdr.array())
    out.write(content)
  }
}
