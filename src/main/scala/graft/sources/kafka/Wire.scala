package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Binary primitives of the Kafka wire protocol (public spec:
  * kafka.apache.org/protocol — ref surface `daft/io/_kafka.py`, which
  * delegates to confluent_kafka; no client library exists in this
  * environment, so the protocol subset is implemented directly).
  *
  * Only NON-FLEXIBLE message versions are used (fixed-width lengths, no
  * tagged fields): Metadata v1, ListOffsets v1, Fetch v4, ApiVersions v0
  * — all inside every modern broker's advertised version ranges (Fetch v4
  * is the minimum version brokers still serve after the message-format
  * v0/v1 removal). Record payloads are RecordBatch magic=2 (varint
  * records), the only on-disk format since Kafka 0.11. */
private[graft] object Wire {

  // ------------------------------------------------------------ writer

  final class Writer {
    private var buf = ByteBuffer.allocate(4096)
    private def ensure(n: Int): ByteBuffer = {
      if (buf.remaining() < n) {
        val grown = ByteBuffer.allocate(math.max(buf.capacity() * 2, buf.position() + n))
        buf.flip(); grown.put(buf); buf = grown
      }
      buf
    }
    def i8(v: Int): Writer = { ensure(1).put(v.toByte); this }
    def i16(v: Int): Writer = { ensure(2).putShort(v.toShort); this }
    def i32(v: Int): Writer = { ensure(4).putInt(v); this }
    def i64(v: Long): Writer = { ensure(8).putLong(v); this }
    def raw(b: Array[Byte]): Writer = { ensure(b.length).put(b); this }
    /** non-flexible STRING: i16 length + utf8 (-1 = null) */
    def str(s: String): Writer =
      if (s == null) i16(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); i16(b.length); raw(b) }
    /** non-flexible BYTES: i32 length + bytes (-1 = null) */
    def bytes(b: Array[Byte]): Writer =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    /** non-flexible ARRAY: i32 count + elements */
    def array[T](xs: Seq[T])(f: (Writer, T) => Unit): Writer = {
      i32(xs.length); xs.foreach(f(this, _)); this
    }
    /** records use zigzag varints (protobuf encoding) */
    def varint(v: Int): Writer = varlong(v.toLong)
    def varlong(v: Long): Writer = {
      val b = ensure(10)
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { b.put(((z & 0x7f) | 0x80).toByte); z >>>= 7 }
      b.put(z.toByte); this
    }
    def result(): Array[Byte] = {
      val out = new Array[Byte](buf.position()); buf.flip(); buf.get(out); out
    }
  }

  // ------------------------------------------------------------ reader

  final class Reader(data: Array[Byte]) {
    private val buf = ByteBuffer.wrap(data)
    def i8(): Byte = buf.get()
    def i16(): Short = buf.getShort()
    def i32(): Int = buf.getInt()
    def i64(): Long = buf.getLong()
    def raw(n: Int): Array[Byte] = { val b = new Array[Byte](n); buf.get(b); b }
    def str(): String = {
      val n = i16()
      if (n < 0) null else new String(raw(n), StandardCharsets.UTF_8)
    }
    def bytes(): Array[Byte] = { val n = i32(); if (n < 0) null else raw(n) }
    def array[T](f: Reader => T): Seq[T] = {
      val n = i32(); if (n < 0) Nil else (0 until n).map(_ => f(this))
    }
    def varint(): Int = varlong().toInt
    def varlong(): Long = {
      var z = 0L; var shift = 0; var b = 0
      do { b = buf.get() & 0xff; z |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def remaining: Int = buf.remaining()
    def position: Int = buf.position()
    def skip(n: Int): Unit = buf.position(buf.position() + n)
  }

  // ------------------------------------------------------------ framing

  /** One request: i32 frame length + header v1 (api_key, api_version,
    * correlation_id, client_id) + body. */
  def request(apiKey: Int, apiVersion: Int, correlationId: Int, body: Writer => Unit): Array[Byte] = {
    val w = new Writer
    w.i16(apiKey).i16(apiVersion).i32(correlationId).str("graft")
    body(w)
    val payload = w.result()
    val framed = ByteBuffer.allocate(4 + payload.length)
    framed.putInt(payload.length).put(payload)
    framed.array()
  }

  def readFrame(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    if (len < 0 || len > (64 << 20)) throw new EOFException(s"bad frame length $len")
    val b = new Array[Byte](len)
    in.readFully(b)
    b
  }

  def writeFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  // ------------------------------------------------------------ records

  final case class Record(offset: Long, timestampMs: Long, key: Array[Byte], value: Array[Byte])

  /** Decode every RecordBatch (magic=2) in a Fetch response's record set.
    * Compression codecs other than none/gzip are rejected explicitly
    * (snappy/lz4/zstd need codec libraries this environment lacks). */
  def decodeRecordBatches(recordSet: Array[Byte]): Seq[Record] = {
    if (recordSet == null || recordSet.isEmpty) return Nil
    val out = Seq.newBuilder[Record]
    val r = new Reader(recordSet)
    while (r.remaining >= 61) { // batch header is 61 bytes
      val baseOffset = r.i64()
      val batchLength = r.i32()
      if (batchLength < 0 || batchLength > r.remaining) return out.result() // truncated tail batch
      val batchBody = r.raw(batchLength)
      val b = new Reader(batchBody)
      b.i32() // partitionLeaderEpoch
      val magic = b.i8()
      require(magic == 2, s"unsupported record batch magic $magic (expected 2)")
      b.i32() // crc (not verified on read)
      val attributes = b.i16()
      val codec = attributes & 0x07
      b.i32() // lastOffsetDelta
      val baseTimestamp = b.i64()
      b.i64() // maxTimestamp
      b.i64() // producerId
      b.i16() // producerEpoch
      b.i32() // baseSequence
      val recordCount = b.i32()
      val recordBytes: Array[Byte] = codec match {
        case 0 => b.raw(b.remaining)
        case 1 => gunzip(b.raw(b.remaining))
        case c => throw new IllegalArgumentException(
          s"unsupported Kafka compression codec $c — only none(0) and gzip(1) are decodable here")
      }
      val rr = new Reader(recordBytes)
      var i = 0
      while (i < recordCount) {
        val recLen = rr.varint()
        val end = rr.position + recLen
        rr.i8() // record attributes
        val tsDelta = rr.varlong()
        val offDelta = rr.varint()
        val keyLen = rr.varint()
        val key = if (keyLen < 0) null else rr.raw(keyLen)
        val valLen = rr.varint()
        val value = if (valLen < 0) null else rr.raw(valLen)
        // headers are skipped: advance to the record end
        rr.skip(end - rr.position)
        out += Record(baseOffset + offDelta, baseTimestamp + tsDelta, key, value)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one uncompressed RecordBatch (magic=2) — the broker side.
    * CRC32C over the bytes from `attributes` onward, per spec. */
  def encodeRecordBatch(baseOffset: Long, records: Seq[Record]): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val baseTs = records.head.timestampMs
    val body = new Writer
    records.foreach { rec =>
      val payload = new Writer
      payload.i8(0) // record attributes
      payload.varlong(rec.timestampMs - baseTs)
      payload.varint((rec.offset - baseOffset).toInt)
      if (rec.key == null) payload.varint(-1)
      else { payload.varint(rec.key.length); payload.raw(rec.key) }
      if (rec.value == null) payload.varint(-1)
      else { payload.varint(rec.value.length); payload.raw(rec.value) }
      payload.varint(0) // headers
      val pb = payload.result()
      body.varint(pb.length).raw(pb)
    }
    val recordBytes = body.result()

    // from `attributes` to end: the CRC's coverage
    val afterCrc = new Writer
    afterCrc.i16(0) // attributes: no compression, create-time timestamps
    afterCrc.i32((records.last.offset - baseOffset).toInt) // lastOffsetDelta
    afterCrc.i64(baseTs)
    afterCrc.i64(records.last.timestampMs)
    afterCrc.i64(-1L) // producerId
    afterCrc.i16(-1)  // producerEpoch
    afterCrc.i32(-1)  // baseSequence
    afterCrc.i32(records.length)
    afterCrc.raw(recordBytes)
    val covered = afterCrc.result()
    val crc = new java.util.zip.CRC32C
    crc.update(covered)

    val batch = new Writer
    batch.i64(baseOffset)
    batch.i32(4 + 1 + 4 + covered.length) // partitionLeaderEpoch + magic + crc + rest
    batch.i32(-1) // partitionLeaderEpoch
    batch.i8(2)   // magic
    batch.i32(crc.getValue.toInt)
    batch.raw(covered)
    batch.result()
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }
}
