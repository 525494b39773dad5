package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, Inflater, InflaterOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary namespace — mirrors `daft/functions/binary.py`: base64/hex/utf8
  * encode/decode via Spark builtins; gzip/zlib/deflate codecs as UDFs
  * (JDK java.util.zip — no Spark builtin). */
object Binary {

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
