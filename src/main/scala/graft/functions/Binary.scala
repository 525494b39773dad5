package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, Inflater, InflaterOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary namespace — mirrors `daft/functions/binary.py`: base64/hex/utf8
  * encode/decode via Spark builtins; gzip/zlib/deflate codecs as UDFs
  * (JDK java.util.zip — no Spark builtin). */
object Binary {

  /** The reference's MIME signature table (decision chain
    * `src/daft-file/src/file.rs:441-495`; signatures are the public
    * IANA/WHATWG ones). One rule = (mime, all-of (offset, hex-bytes)
    * checks); the FIRST rule whose checks all match wins, so rule ORDER
    * mirrors the reference exactly (e.g. WEBP's RIFF test precedes
    * WAV's). HDF5's superblock may sit at user-block offsets
    * 0/512/1024/2048/4096, all within the reference's 4 KiB sniff window.
    * This single table drives BOTH the codegen'd column function
    * [[guessMimeType]] and the JVM-side gate sniffer
    * `graft.ops.MediaFiles.sniff` — fix a signature here, both move. */
  private[graft] val MimeSignatures: Seq[(String, Seq[(Int, String)])] = {
    val hdf5 = "894844460D0A1A0A" // \x89HDF\r\n\x1a\n
    Seq(
      "image/png" -> Seq(0 -> "89504E470D0A1A0A"),
      "image/jpeg" -> Seq(0 -> "FFD8"),
      "image/gif" -> Seq(0 -> "47494638"), // GIF8
      "image/webp" -> Seq(0 -> "52494646", 8 -> "57454250"), // RIFF..WEBP
      "application/pdf" -> Seq(0 -> "25504446"), // %PDF
      "application/zip" -> Seq(0 -> "504B0304"),
      "audio/mpeg" -> Seq(0 -> "494433"), // ID3
      "audio/mpeg" -> Seq(0 -> "FFFB"),   // MPEG ADTS layer-III sync
      "audio/wav" -> Seq(0 -> "52494646", 8 -> "57415645"), // RIFF..WAVE
      "audio/ogg" -> Seq(0 -> "4F676753"), // OggS
      "video/mp4" -> Seq(4 -> "66747970"), // ....ftyp
      "video/mpeg" -> Seq(0 -> "000001BA"),
      "text/html" -> Seq(0 -> "3C21444F4354595045"), // <!DOCTYPE
      "text/html" -> Seq(0 -> "3C68746D6C"),         // <html
      "text/html" -> Seq(0 -> "3C48544D4C"),         // <HTML
      "application/vnd.hdfgroup.hdf5" -> Seq(0 -> hdf5),
      "application/vnd.hdfgroup.hdf5" -> Seq(512 -> hdf5),
      "application/vnd.hdfgroup.hdf5" -> Seq(1024 -> hdf5),
      "application/vnd.hdfgroup.hdf5" -> Seq(2048 -> hdf5),
      "application/vnd.hdfgroup.hdf5" -> Seq(4096 -> hdf5))
  }

  /** Magic-byte MIME sniffing (ref `daft/functions/file_.py:134`):
    * null when unknown. Pure codegen'd builtins — hex substrings compared
    * to literal strings — expanded from [[MimeSignatures]]. */
  def guessMimeType(c: Column): Column =
    MimeSignatures.foldLeft(Option.empty[Column]) {
      case (acc, (mime, checks)) =>
        val cond = checks.map { case (off, hx) =>
          hex(substring(c, off + 1, hx.length / 2)) === hx
        }.reduce(_ && _)
        Some(acc.fold(when(cond, mime))(_.when(cond, mime)))
    }.get

  def encodeBase64(c: Column): Column = base64(c)
  def decodeBase64(c: Column): Column = unbase64(c)
  def encodeHex(c: Column): Column = hex(c)
  def decodeHex(c: Column): Column = unhex(c)
  def encodeUtf8(c: Column): Column = encode(c, "UTF-8")
  def decodeUtf8(c: Column): Column = decode(c, "UTF-8")
  def lengthBytes(c: Column): Column = octet_length(c)

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }
  private def gunzipBytes(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }
  private def zlibBytes(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DeflaterOutputStream(bos, new Deflater(Deflater.DEFAULT_COMPRESSION, raw))
    out.write(b); out.close()
    bos.toByteArray
  }
  private def unzlibBytes(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new InflaterOutputStream(bos, new Inflater(raw))
    out.write(b); out.close()
    bos.toByteArray
  }

  val gzipUdf = udf { b: Array[Byte] => if (b == null) null else gzipBytes(b) }
  val gunzipUdf = udf { b: Array[Byte] => if (b == null) null else gunzipBytes(b) }
  val zlibUdf = udf { b: Array[Byte] => if (b == null) null else zlibBytes(b, raw = false) }
  val unzlibUdf = udf { b: Array[Byte] => if (b == null) null else unzlibBytes(b, raw = false) }
  val deflateUdf = udf { b: Array[Byte] => if (b == null) null else zlibBytes(b, raw = true) }
  val inflateUdf = udf { b: Array[Byte] => if (b == null) null else unzlibBytes(b, raw = true) }

  // try_ variants (ref binary.py try_compress/try_decompress, str.py
  // try_decode): null on malformed input instead of a task failure — the
  // posture a 100 TB corpus with a sprinkling of corrupt blobs needs
  val tryGunzipUdf = udf { b: Array[Byte] =>
    if (b == null) null
    else try gunzipBytes(b) catch { case scala.util.control.NonFatal(_) => null }
  }
  val tryUnzlibUdf = udf { b: Array[Byte] =>
    if (b == null) null
    else try unzlibBytes(b, raw = false) catch { case scala.util.control.NonFatal(_) => null }
  }
  val tryInflateUdf = udf { b: Array[Byte] =>
    if (b == null) null
    else try unzlibBytes(b, raw = true) catch { case scala.util.control.NonFatal(_) => null }
  }
  val tryDecodeUtf8Udf = udf { b: Array[Byte] =>
    if (b == null) null
    else {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      catch { case _: java.nio.charset.CharacterCodingException => null }
    }
  }

  def tryDecompress(c: Column, codec: String): Column = codec.toLowerCase match {
    case "gzip" => tryGunzipUdf(c)
    case "zlib" => tryUnzlibUdf(c)
    case "deflate" => tryInflateUdf(c)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Strict-UTF8 decode returning null on invalid byte sequences (the
    * builtin `decode` substitutes U+FFFD instead of failing). */
  def tryDecodeUtf8(c: Column): Column = tryDecodeUtf8Udf(c)

  /** Strict charset encode returning null on unmappable characters (ref
    * binary.py try_encode — the builtin substitutes `?`). */
  def tryEncode(c: Column, charset: String): Column = {
    val cs = charset
    val f = udf { s: String =>
      if (s == null) null
      else try {
        val bb = java.nio.charset.Charset.forName(cs).newEncoder()
          .encode(java.nio.CharBuffer.wrap(s))
        val out = new Array[Byte](bb.remaining())
        bb.get(out)
        out
      } catch { case scala.util.control.NonFatal(_) => null }
    }
    f(c)
  }

  def compress(c: Column, codec: String): Column = codec.toLowerCase match {
    case "gzip"    => gzipUdf(c)
    case "zlib"    => zlibUdf(c)
    case "deflate" => deflateUdf(c)
    case other     => throw new IllegalArgumentException(s"unknown codec $other")
  }

  def decompress(c: Column, codec: String): Column = codec.toLowerCase match {
    case "gzip"    => gunzipUdf(c)
    case "zlib"    => unzlibUdf(c)
    case "deflate" => inflateUdf(c)
    case other     => throw new IllegalArgumentException(s"unknown codec $other")
  }
}
