package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Duration
import java.util.UUID
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

/** URL byte IO as columns: `download` (url → binary) and `upload`
  * (binary → written path), the front door of multimodal pipelines
  * (ref `daft/functions/url.py:44-149`).
  *
  * Execution shape (the scale-critical part):
  *  - per-partition lazily-initialized HTTP client + bounded IO thread
  *    pool — connections are created once per task, not per row, and
  *    `maxConnections` bounds per-task concurrency, so a 1000-executor
  *    cluster opens ≤ tasks×maxConnections sockets (ref url.py's
  *    multithreading/max_connections notes);
  *  - rows stream through `mapPartitions` in flight-sized batches: no
  *    driver collect, no shuffle, memory bounded by batch × payload;
  *  - `onError="null"` degrades per-row to null (default "raise" fails
  *    fast), matching the reference's on_error contract.
  *
  * Schemes: `file://` (and bare paths) via java.nio, `http(s)://` via
  * java.net.http — all JDK-native, zero extra deps.
  */
object UrlIO {

  /** Live download pools in this JVM — a test hook proving the task
    * completion listener reclaims pools even when the row iterator is
    * abandoned mid-partition (limit/take/failed task). */
  private[graft] val livePools = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fetchOne(client: HttpClient, url: String): Array[Byte] = {
    val uri = new URI(url)
    uri.getScheme match {
      case null | "file" =>
        val p = if (uri.getScheme == null) Paths.get(url) else Paths.get(uri)
        Files.readAllBytes(p)
      case "http" | "https" =>
        val req = HttpRequest.newBuilder(uri)
          .timeout(Duration.ofSeconds(30)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() >= 400)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
        resp.body()
      case other =>
        throw new IllegalArgumentException(s"unsupported scheme: $other ($url)")
    }
  }

  /** url column → binary column appended as `outCol`. */
  def download(
      df: DataFrame,
      urlCol: String,
      outCol: String,
      maxConnections: Int = 32,
      onError: String = "raise"): DataFrame = {
    require(onError == "raise" || onError == "null", s"onError=$onError")
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(urlCol)
    val nullOnError = onError == "null"
    val conns = maxConnections
    df.mapPartitions { rows =>
      // lazy per-partition state: one client + one bounded pool per task.
      // The fetch pool (bounds per-task concurrency) is deliberately NOT
      // the client's executor — sharing them deadlocks: every pool thread
      // blocks in client.send(), which needs executor threads to complete.
      // Cleanup is tied to TASK COMPLETION, not iterator exhaustion: a
      // downstream limit/take/failure stops pulling mid-partition, and an
      // exhaustion-based shutdown would strand the pool (and its sockets)
      // for the executor's lifetime.
      var poolRef: java.util.concurrent.ExecutorService = null
      lazy val pool = {
        val p = Executors.newFixedThreadPool(conns)
        poolRef = p
        livePools.incrementAndGet()
        p
      }
      Option(org.apache.spark.TaskContext.get()).foreach {
        _.addTaskCompletionListener[Unit] { _ =>
          if (poolRef != null) {
            poolRef.shutdownNow()
            poolRef.awaitTermination(10, TimeUnit.SECONDS)
            livePools.decrementAndGet()
          }
        }
      }
      lazy val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10))
        .build()
      rows.grouped(conns * 4).flatMap { batch =>
        val futures = batch.map { r =>
          val url = r.getString(idx)
          val fut = pool.submit(new java.util.concurrent.Callable[Array[Byte]] {
            def call(): Array[Byte] =
              if (url == null) null
              else
                try fetchOne(client, url)
                catch {
                  case e: Exception =>
                    if (nullOnError) null else throw e
                }
          })
          (r, fut)
        }
        futures.map { case (r, fut) => Row.fromSeq(r.toSeq :+ fut.get()) }
      }
    }(enc)
  }

  /** binary column → files under `location`, returning the written path
    * as `outCol` (compatible with `download`). Default filenames are
    * UUIDs like the reference; pass `nameCol` for deterministic names. */
  def upload(
      df: DataFrame,
      bytesCol: String,
      location: String,
      outCol: String,
      nameCol: Option[String] = None,
      onError: String = "raise"): DataFrame = {
    require(onError == "raise" || onError == "null", s"onError=$onError")
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val nIdx = nameCol.map(df.schema.fieldIndex)
    val nullOnError = onError == "null"
    val baseUri = new URI(if (location.contains("://")) location else s"file://$location")
    require(baseUri.getScheme == "file", s"upload supports file:// locations, got $location")
    val baseDir = Paths.get(baseUri).toString
    df.mapPartitions { rows =>
      lazy val dir = {
        val d = Paths.get(baseDir)
        Files.createDirectories(d)
        d
      }
      rows.map { r =>
        val bytes = r.get(bIdx).asInstanceOf[Array[Byte]]
        val path: String =
          if (bytes == null) null
          else
            try {
              val name = nIdx.map(i => String.valueOf(r.get(i)))
                .getOrElse(UUID.randomUUID().toString)
              val p = dir.resolve(name)
              Files.write(p, bytes,
                StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
                StandardOpenOption.WRITE)
              s"file://$p"
            } catch {
              case e: Exception => if (nullOnError) null else throw e
            }
        Row.fromSeq(r.toSeq :+ path)
      }
    }(enc)
  }
}
