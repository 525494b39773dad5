package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) source/sink — the canonical CommonCrawl
  * container and the highest-volume LLM-training-data ingestion format
  * (ref `daft/io/_warc.py:24`, `src/daft-warc/`; output schema mirrors the
  * reference: the four mandatory metadata columns + optional payload type,
  * raw `warc_content` bytes, remaining headers as a `warc_headers` JSON
  * string).
  *
  * Scale shape: the file LISTING is planned by Spark (binaryFile listing,
  * glob support, partitioned by file), and each task STREAMS its files
  * record-by-record — no whole-file materialization, memory bounded by one
  * record. CommonCrawl-style corpora (many ~1 GB segment files) distribute
  * by file, which is the standard parallelization for WARC since records
  * are not splittable at arbitrary byte offsets. Gzip members (.warc.gz)
  * are handled transparently.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("WARC-Record-ID", StringType),
    StructField("WARC-Target-URI", StringType),
    StructField("WARC-Type", StringType),
    StructField("WARC-Date", StringType), // ISO-8601 text; cast as needed
    StructField("Content-Length", LongType),
    StructField("WARC-Identified-Payload-Type", StringType),
    StructField("warc_content", BinaryType),
    StructField("warc_headers", StringType)))

  /** Read WARC file(s) (glob supported) into the reference-shaped frame. */
  def read(spark: SparkSession, path: String): DataFrame = read(spark, Seq(path))

  /** Multi-path variant (the `daft.datasets.common_crawl` loader resolves
    * a crawl manifest into an explicit file list — ref
    * `common_crawl.py:36-75`). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "read_warc: empty path list")
    // listing via the binaryFile source (glob/dir semantics for free);
    // column pruning keeps the file CONTENT out of the listing pass
    val files = spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"))
    val enc = Encoders.row(schema)
    files.flatMap { fileRow =>
      val p = fileRow.getString(0)
      val local = if (p.startsWith("file:")) Paths.get(new java.net.URI(p)) else Paths.get(p)
      val raw: InputStream = new BufferedInputStream(Files.newInputStream(local), 1 << 16)
      val in = if (p.endsWith(".gz")) new BufferedInputStream(new GZIPInputStream(raw), 1 << 16) else raw
      parseStream(in)
    }(enc)
  }

  /** Stream WARC records off an input stream, one Row per record. */
  private[sources] def parseStream(in: InputStream): Iterator[Row] = {
    val din = new DataInputStream(in)

    def readLine(): String = {
      // WARC headers are CRLF-delimited ASCII/UTF-8
      val buf = new mutable.ArrayBuffer[Byte](128)
      var b = din.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') {
        buf += b.toByte
        b = din.read()
      }
      val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1 else buf.length
      new String(buf.toArray, 0, n, StandardCharsets.UTF_8)
    }

    new Iterator[Row] {
      private var nextRow: Row = fetch()

      private def fetch(): Row = {
        // skip inter-record blank lines, find version line
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) return null
        if (!line.startsWith("WARC/"))
          throw new java.io.IOException(s"malformed WARC: expected version line, got '$line'")
        // header block until blank line
        val headers = mutable.LinkedHashMap.empty[String, String]
        line = readLine()
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          if (i > 0) headers(line.substring(0, i).trim) = line.substring(i + 1).trim
          line = readLine()
        }
        val len = headers.getOrElse("Content-Length", "0").toLong
        val content = new Array[Byte](len.toInt)
        try din.readFully(content)
        catch { case _: EOFException => throw new java.io.IOException("truncated WARC record") }
        val known = Set("WARC-Record-ID", "WARC-Target-URI", "WARC-Type", "WARC-Date",
          "Content-Length", "WARC-Identified-Payload-Type")
        val rest = headers.filterNot { case (k, _) => known(k) }
        val json = rest.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString("{", ",", "}")
        Row(
          headers.getOrElse("WARC-Record-ID", null),
          headers.getOrElse("WARC-Target-URI", null),
          headers.getOrElse("WARC-Type", null),
          headers.getOrElse("WARC-Date", null),
          len,
          headers.getOrElse("WARC-Identified-Payload-Type", null),
          content,
          json)
      }

      def hasNext: Boolean = nextRow != null
      def next(): Row = {
        val r = nextRow
        nextRow = fetch()
        r
      }
    }
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Write a WARC file per partition (distributed sink round-trippable by
    * [[read]]): `contentCol` bytes become `response` records with the
    * given target-URI and record-id columns. */
  def write(df: DataFrame, outDir: String,
      contentCol: String, uriCol: String, idCol: String,
      date: String = "2026-01-01T00:00:00Z"): Unit = {
    val cIdx = df.schema.fieldIndex(contentCol)
    val uIdx = df.schema.fieldIndex(uriCol)
    val iIdx = df.schema.fieldIndex(idCol)
    Files.createDirectories(Paths.get(outDir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      var out: java.io.OutputStream = null
      var pid = -1
      rows.foreach { r =>
        if (out == null) {
          pid = org.apache.spark.TaskContext.getPartitionId()
          out = Files.newOutputStream(
            Paths.get(outDir, f"part-$pid%05d.warc"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        }
        val content = r.get(cIdx).asInstanceOf[Array[Byte]]
        val rid = String.valueOf(r.get(iIdx))
        val uri = String.valueOf(r.get(uIdx))
        val hdr =
          s"""WARC/1.0\r
             |WARC-Type: response\r
             |WARC-Record-ID: <urn:uuid:$rid>\r
             |WARC-Target-URI: $uri\r
             |WARC-Date: $date\r
             |Content-Type: application/octet-stream\r
             |Content-Length: ${content.length}\r
             |\r
             |""".stripMargin
        out.write(hdr.getBytes(StandardCharsets.UTF_8))
        out.write(content)
        out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
      }
      if (out != null) out.close()
    }
  }
}
