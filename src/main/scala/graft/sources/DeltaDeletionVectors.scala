package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

/** Delta Lake deletion vectors, implemented from the published spec
  * (delta.io PROTOCOL.md §Deletion Vectors + §Deletion Vector Format;
  * bitmap container layout per the public RoaringFormatSpec). The
  * reference reads DV tables through delta-rs (`daft/io/delta_lake/`).
  *
  * A deletion vector marks rows of ONE parquet data file as deleted by
  * their row ordinal — the merge-on-read alternative to copy-on-write
  * rewrites. Wire pieces:
  *
  *  - descriptor (in the `add` action): `storageType` "i" (inline),
  *    "u" (relative file, z85-encoded UUID name), "p" (absolute path);
  *    `pathOrInlineDv`, `offset`, `sizeInBytes`, `cardinality`.
  *  - DV data blob: 4-byte little-endian magic 1681511377, then a
  *    RoaringBitmapArray: 8-byte LE bitmap count, then each 32-bit
  *    RoaringBitmap in the standard portable format (row index =
  *    bitmapIndex·2³² + bitmap value).
  *  - on-disk DV file: 1-byte format version (1), then per stored DV a
  *    4-byte BIG-endian length, the blob, and a 4-byte BE CRC-32 of the
  *    blob (the JVM `DataOutputStream` framing production Delta uses —
  *    framing is BE while the bitmap internals stay LE). `offset` points
  *    at the length field.
  */
object DeltaDeletionVectors {

  /** The `deletionVector` struct of an `add` action. */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  private val Magic = 1681511377

  // ------------------------------------------------------------------- z85
  // ZeroMQ Z85 (spec 32/Z85): 4 bytes → 5 chars, big-endian base-85.

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  private[graft] def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  private[graft] def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  // -------------------------------------------- roaring bitmap array codec

  /** Deleted row ordinals from a serialized DV blob (magic + bitmaps).
    * Handles all three container kinds, so externally-written tables
    * (array, bitmap, or run containers) read identically. */
  private[graft] def deserialize(blob: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad deletion-vector magic $magic (expected $Magic)")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var b = 0L
    while (b < nBitmaps) {
      val high = b << 32
      readOneBitmap(buf, v => out += (high | (v & 0xffffffffL)))
      b += 1
    }
    out.result()
  }

  /** One standard portable 32-bit RoaringBitmap (RoaringFormatSpec). */
  private def readOneBitmap(buf: ByteBuffer, emit: Long => Unit): Unit = {
    val cookie = buf.getInt
    val hasRuns = (cookie & 0xffff) == 12347
    val size =
      if (hasRuns) (cookie >>> 16) + 1
      else { require(cookie == 12346, s"bad roaring cookie $cookie"); buf.getInt }
    val runFlags: Array[Byte] =
      if (hasRuns) { val a = new Array[Byte]((size + 7) / 8); buf.get(a); a }
      else Array.emptyByteArray
    def isRun(i: Int): Boolean = hasRuns && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    // offset header present unless (runs && size < 4); sequential read
    // doesn't need the offsets — skip them
    if (!hasRuns || size >= 4) buf.position(buf.position() + 4 * size)
    i = 0
    while (i < size) {
      val base = keys(i).toLong << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { emit(base | (buf.getShort & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = buf.getLong
          if (word != 0L) {
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0L) emit(base | (w * 64 + bit))
              bit += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialize sorted distinct row ordinals as a DV blob (magic +
    * RoaringBitmapArray). Containers are array (≤4096 values) or bitmap —
    * the no-run-container cookie, which every roaring reader accepts. */
  private[graft] def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val bitmaps = sorted.groupBy(_ >>> 32)
    val parts = (0L until nBitmaps).map { b =>
      serializeOneBitmap(bitmaps.getOrElse(b, Array.empty[Long]).map(v => (v & 0xffffffffL).toInt))
    }
    val total = 12 + parts.map(_.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(nBitmaps)
    parts.foreach(buf.put)
    buf.array()
  }

  private def serializeOneBitmap(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val size = byKey.length
    val containers: Seq[Array[Byte]] = byKey.map { case (_, vs) =>
      if (vs.length <= 4096) {
        val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        vs.sorted.foreach(v => b.putShort((v & 0xffff).toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val low = v & 0xffff
          words(low / 64) |= 1L << (low % 64)
        }
        val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }
    val headerBytes = 8 + 4 * size + 4 * size // cookie+size, desc, offsets
    val buf = ByteBuffer.allocate(headerBytes + containers.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    buf.putInt(size)
    byKey.foreach { case (key, vs) =>
      buf.putShort((key & 0xffff).toShort)
      buf.putShort(((vs.length - 1) & 0xffff).toShort)
    }
    var off = headerBytes
    containers.foreach { c => buf.putInt(off); off += c.length }
    containers.foreach(buf.put)
    buf.array()
  }

  // --------------------------------------------------------------- file io

  /** Absolute on-disk path of a non-inline DV. For "u" the last 20 chars
    * of `pathOrInlineDv` are the z85-encoded UUID, anything before them a
    * directory prefix under the table root. */
  def absolutePath(tablePath: String, d: Descriptor): String = d.storageType match {
    case "p" => d.pathOrInlineDv.replaceFirst("^file:(//)?", "")
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"bad u-storage pathOrInlineDv: $enc")
      val prefix = enc.dropRight(20)
      val uuidBytes = z85Decode(enc.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) s"$tablePath/$name" else s"$tablePath/$prefix/$name"
    case other => sys.error(s"storageType $other has no file path")
  }

  /** Deleted row ordinals of one descriptor (driver or executor side). */
  def positions(tablePath: String, d: Descriptor): Array[Long] = d.storageType match {
    case "i" => deserialize(z85Decode(d.pathOrInlineDv))
    case "u" | "p" =>
      val bytes = Files.readAllBytes(Paths.get(absolutePath(tablePath, d)))
      require(bytes.nonEmpty && bytes(0) == 1,
        s"unsupported DV file format version ${if (bytes.isEmpty) "?" else bytes(0)}")
      val at = d.offset.getOrElse(1)
      val buf = ByteBuffer.wrap(bytes, at, bytes.length - at) // BE framing
      val len = buf.getInt
      require(len == d.sizeInBytes,
        s"DV length mismatch: file says $len, descriptor says ${d.sizeInBytes}")
      val blob = new Array[Byte](len)
      buf.get(blob)
      val expected = buf.getInt
      val crc = new CRC32; crc.update(blob)
      require(crc.getValue.toInt == expected, "DV checksum mismatch")
      deserialize(blob)
    case other => sys.error(s"unsupported DV storageType $other")
  }

  /** Write several DV blobs into ONE `deletion_vector_<uuid>.bin` under
    * `tablePath` (the spec's multi-DV file shape) and return each blob's
    * "u" descriptor in input order. */
  def writeDvFile(tablePath: String, blobs: Seq[(Array[Byte], Long)]): Seq[Descriptor] = {
    val uuid = UUID.randomUUID()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val enc = z85Encode(uuidBytes)
    val total = 1 + blobs.map(_._1.length + 8).sum
    val buf = ByteBuffer.allocate(total) // big-endian framing
    buf.put(1.toByte)
    val descriptors = blobs.map { case (blob, cardinality) =>
      val offset = buf.position()
      buf.putInt(blob.length)
      buf.put(blob)
      val crc = new CRC32; crc.update(blob)
      buf.putInt(crc.getValue.toInt)
      Descriptor("u", enc, Some(offset), blob.length, cardinality)
    }
    val out: Path = Paths.get(tablePath, s"deletion_vector_$uuid.bin")
    Files.createDirectories(out.getParent)
    Files.write(out, buf.array())
    descriptors
  }

  /** Inline ("i") descriptor for a DV blob. */
  def inlineDescriptor(blob: Array[Byte], cardinality: Long): Descriptor =
    Descriptor("i", z85Encode(pad4(blob)), None, blob.length, cardinality)

  /** z85 requires 4-byte alignment; the descriptor's sizeInBytes keeps
    * the true length, so trailing pad bytes are ignored on decode. */
  private def pad4(b: Array[Byte]): Array[Byte] =
    if (b.length % 4 == 0) b else b ++ new Array[Byte](4 - b.length % 4)
}
