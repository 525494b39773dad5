package graft.sources

import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ClickHouse writer over the PUBLIC HTTP interface
  * (clickhouse.com/docs/en/interfaces/http) — ref `write_clickhouse`
  * (`dataframe.py:2548`, `daft/io/clickhouse/`). The reference binds the
  * native client lib; no such jar exists offline, but the HTTP interface
  * is a published text protocol (query in the URL, data in the body,
  * `FORMAT TabSeparated` with documented escaping), so the sink speaks
  * it directly — the same no-jar route as the Kafka wire client.
  *
  * Scale shape: the standard [[DataSink]] contract — every partition
  * POSTs its own batched inserts straight from its executor (ClickHouse
  * HTTP inserts are atomic per request up to max_insert_block_size, so
  * batches are the unit of retry); the driver only issues DDL and sees
  * one result row per partition. A 1000-partition write is 1000
  * concurrent insert streams, which is how bulk HTTP loading into a
  * ClickHouse cluster is actually done.
  */
object ClickHouse {

  /** Spark → ClickHouse column type (the documented type names). */
  private[sources] def chType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "Int64"
    case DoubleType | FloatType => "Float64"
    case BooleanType => "UInt8"
    case TimestampType => "DateTime64(6, 'UTC')"
    case DateType => "Date32"
    case ArrayType(FloatType | DoubleType, _) => "Array(Float64)"
    case _ => "String"
  }

  /** TabSeparated escaping per the format spec: backslash, tab, newline,
    * CR escaped; NULL is `\N`. */
  private[sources] def tsvEscape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }

  private[graft] def tsvValue(v: Any): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "1" else "0"
    case ts: java.sql.Timestamp =>
      // DateTime64(6) literal: epoch micros rendered as decimal seconds
      val us = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      // sign rendered separately: `us/1000000L` truncates toward zero, so
      // for us in (-1e6, 0) the integral part is 0 and the "-" vanished
      // (-0.5s rendered as "0.500000"); a floorDiv representation would be
      // just as wrong in a decimal string ("-1.500000" parses as -1.5s)
      val sign = if (us < 0) "-" else ""
      val abs = math.abs(us)
      f"$sign%s${abs / 1000000L}%d.${abs % 1000000L}%06d"
    case a: scala.collection.Seq[_] =>
      a.map(tsvValue).mkString("[", ",", "]")
    case other => tsvEscape(String.valueOf(other))
  }

  final class Sink(
      endpoint: String,
      table: String,
      database: String = "default",
      engine: String = "MergeTree ORDER BY tuple()",
      batchRows: Int = 10000) extends DataSink {

    def name = s"clickhouse:$database.$table"

    // one client per sink instance; instances are per-task after Spark
    // deserializes the closure, so connections are never shared across
    // threads. @transient: HttpClient itself is not serializable.
    @transient private lazy val http = HttpClient.newHttpClient()

    private def post(query: String, body: Array[Byte]): String = {
      val uri = URI.create(
        s"$endpoint/?query=${URLEncoder.encode(query, UTF_8)}")
      val resp = http.send(
        HttpRequest.newBuilder(uri)
          .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200,
        s"clickhouse $query -> HTTP ${resp.statusCode()}: ${resp.body()}")
      resp.body()
    }

    override def start(schema: StructType): Unit = {
      val cols = schema.fields
        .map(f => s"`${f.name}` ${chType(f.dataType)}").mkString(", ")
      post(s"DROP TABLE IF EXISTS `$database`.`$table`", Array.emptyByteArray)
      post(s"CREATE TABLE `$database`.`$table` ($cols) ENGINE = $engine",
        Array.emptyByteArray)
    }

    def writePartition(pid: Int, rows: Iterator[Row], schema: StructType): WriteResult = {
      val insert = s"INSERT INTO `$database`.`$table` FORMAT TabSeparated"
      var n = 0L
      var bytes = 0L
      rows.grouped(batchRows).foreach { batch =>
        val body = batch.map { r =>
          (0 until r.length).map(i => tsvValue(r.get(i))).mkString("\t")
        }.mkString("", "\n", "\n").getBytes(UTF_8)
        post(insert, body)
        n += batch.length
        bytes += body.length
      }
      WriteResult(pid, n, bytes, s"$endpoint/$database.$table")
    }
  }

  /** Read back `SELECT * FROM db.table` (TabSeparatedWithNamesAndTypes) —
    * validation-scale readback for round-trip checks, not a source. */
  def readAll(spark: SparkSession, endpoint: String, table: String,
      database: String = "default", schema: StructType): DataFrame = {
    val http = HttpClient.newHttpClient()
    val q = s"SELECT * FROM `$database`.`$table` FORMAT TabSeparatedWithNamesAndTypes"
    val uri = URI.create(s"$endpoint/?query=${URLEncoder.encode(q, UTF_8)}")
    val resp = http.send(HttpRequest.newBuilder(uri).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"clickhouse select -> ${resp.statusCode()}")
    val lines = resp.body().split("\n").filter(_.nonEmpty).toSeq
    val data = lines.drop(2) // names row + types row
    val rows = data.map { line =>
      val cells = line.split("\t", -1)
      Row.fromSeq(schema.fields.zip(cells).map { case (f, c) => parseCell(f.dataType, c) })
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 't' => b.append('\t'); case 'n' => b.append('\n')
          case 'r' => b.append('\r'); case '\\' => b.append('\\')
          case c => b.append(c)
        }
        i += 2
      } else { b.append(s(i)); i += 1 }
    }
    b.toString
  }

  private def parseCell(dt: DataType, c: String): Any =
    if (c == "\\N") null
    else dt match {
      case LongType | IntegerType | ShortType | ByteType => c.toLong
      case DoubleType | FloatType => c.toDouble
      case BooleanType => c.trim == "1"
      case _ => unescape(c)
    }

  /** In-process single-node stub speaking the HTTP-interface subset the
    * sink and readback use (the MiniBroker pattern: conformance against
    * an independent implementation of the published protocol, since no
    * server exists offline). Parses DDL, TabSeparated inserts with the
    * documented escaping, and `SELECT * ... FORMAT
    * TabSeparatedWithNamesAndTypes`. */
  final class MiniClickHouse extends AutoCloseable {
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // table → (column name/type pairs, rows of raw TSV cells)
    private val tables =
      new ConcurrentHashMap[String, (Seq[(String, String)], java.util.List[Seq[String]])]()

    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    def rowCount(table: String): Int =
      Option(tables.get(table)).map(_._2.size).getOrElse(0)

    server.createContext("/", (ex: HttpExchange) => {
      try {
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> URLDecoder.decode(v, UTF_8)
          }.toMap
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val query = params.getOrElse("query", "").trim
        val out = handle(query, body)
        val b = out.getBytes(UTF_8)
        ex.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
      } catch {
        case e: Throwable =>
          val b = ("Code: 62. DB::Exception: " + e.getMessage).getBytes(UTF_8)
          ex.sendResponseHeaders(400, b.length)
          ex.getResponseBody.write(b)
      } finally ex.close()
    })
    server.start()

    private val CreateRe =
      """(?s)CREATE TABLE `?([\w.`]+?)`?\.`?(\w+)`?\s*\((.*)\)\s*ENGINE\s*=.*""".r
    private val DropRe = """DROP TABLE IF EXISTS `?([\w.`]+?)`?\.`?(\w+)`?""".r
    private val InsertRe =
      """(?s)INSERT INTO `?([\w.`]+?)`?\.`?(\w+)`?\s+FORMAT TabSeparated\s*""".r
    private val SelectRe =
      """SELECT \* FROM `?([\w.`]+?)`?\.`?(\w+)`? FORMAT TabSeparatedWithNamesAndTypes""".r

    private def handle(query: String, body: String): String = query match {
      case DropRe(_, t) => tables.remove(t); ""
      case CreateRe(_, t, colsSpec) =>
        val cols = colsSpec.split(",(?![^()\\[\\]]*[)\\]])").toSeq.map { c =>
          val parts = c.trim.split("\\s+", 2)
          (parts(0).stripPrefix("`").stripSuffix("`"), parts(1).trim)
        }
        require(tables.putIfAbsent(t,
          (cols, java.util.Collections.synchronizedList(
            new java.util.ArrayList[Seq[String]]()))) == null, s"table $t exists")
        ""
      case InsertRe(_, t) =>
        val tab = tables.get(t)
        require(tab != null, s"no such table $t")
        val (cols, store) = tab
        body.split("\n").filter(_.nonEmpty).foreach { line =>
          val cells = line.split("\t", -1).toSeq
          require(cells.length == cols.length,
            s"row has ${cells.length} cells, table $t has ${cols.length} columns")
          store.add(cells)
        }
        ""
      case SelectRe(_, t) =>
        val tab = tables.get(t)
        require(tab != null, s"no such table $t")
        val (cols, store) = tab
        val header = cols.map(_._1).mkString("\t") + "\n" +
          cols.map(_._2).mkString("\t") + "\n"
        header + store.asScala.map(_.mkString("\t")).mkString("", "\n", "\n")
      case "" => "Ok.\n" // health ping
      case other => throw new IllegalArgumentException(s"unsupported query: $other")
    }

    override def close(): Unit = server.stop(0)
  }
}
