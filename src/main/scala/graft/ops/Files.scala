package graft.ops

import java.nio.file.{Files => JFiles, Paths}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.types.FileRef

/** File column ops (ref `daft/functions/file_.py`: file, file_path,
  * file_size, file_exists, guess_mime_type; typed variants video_file/
  * audio_file/image_file tag the media type). Files are FileRef values
  * ([[graft.types.FileUDT]]) — a path plus optionally materialized bytes —
  * resolved lazily per-row on the executor (pure map, no shuffle). */
object Files {

  /** Magic-byte MIME heuristic for File-UDT routing — a SUPERSET of the
    * reference's sniffer (adds bmp/gzip/warc and a text/plain fallback the
    * media pipeline wants). The reference-exact decision chain
    * (file.rs:441-495) is the codegen'd column function
    * [[graft.functions.Binary.guessMimeType]]; use that for
    * `guess_mime_type` parity. */
  def guessMime(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 4) return None
    def at(i: Int) = b(i) & 0xff
    val mime =
      if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
      else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image/jpeg"
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "image/gif"
      else if (at(0) == 'B' && at(1) == 'M') "image/bmp"
      else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        b.length >= 12 && at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E')
        "audio/wav"
      else if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "application/pdf"
      else if (at(0) == 'P' && at(1) == 'K' && (at(2) == 3 || at(2) == 5)) "application/zip"
      else if (at(0) == 0x1f && at(1) == 0x8b) "application/gzip"
      else if (at(0) == 'W' && at(1) == 'A' && at(2) == 'R' && at(3) == 'C') "application/warc"
      // negative signed bytes = UTF-8 continuation/lead bytes — still text
      else if (b.take(64).forall(x => (x >= 0x09 || x < 0) && x != 0x7f)) "text/plain"
      else "application/octet-stream"
    Some(mime)
  }

  private def mediaTypeOf(path: String): String = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "png" | "jpg" | "jpeg" | "gif" | "bmp" => "image"
      case "wav" | "aiff" | "mp3" | "flac" => "audio"
      case "mp4" | "mkv" | "webm" | "avi" => "video"
      case "h5" | "hdf5" => "hdf5"
      case _ => "unknown"
    }
  }

  private def localPath(p: String) =
    if (p.startsWith("file:")) Paths.get(new java.net.URI(p)) else Paths.get(p)

  /** path column → FileRef (ref file_.py `file(url)`); bytes stay
    * unmaterialized (null) until `fileRead`. */
  val fileUdf = udf((p: String) =>
    if (p == null) None else Some(FileRef(p, null, mediaTypeOf(p))))

  def file(path: Column): Column = fileUdf(path)

  /** ref file_path(file). (UDT columns don't support getField — the
    * logical type hides its storage struct, so accessors are functions.) */
  val filePathUdf = udf((f: FileRef) => Option(f).map(_.path))
  def filePath(file: Column): Column = filePathUdf(file)

  /** ref file_size(file): stat on the executor. */
  val fileSizeUdf = udf((f: FileRef) =>
    Option(f).flatMap { fr =>
      if (fr.bytes != null) Some(fr.bytes.length.toLong)
      else {
        val p = localPath(fr.path)
        if (JFiles.exists(p)) Some(JFiles.size(p)) else None
      }
    })

  /** ref file_exists(file). */
  val fileExistsUdf = udf((f: FileRef) =>
    Option(f).map(fr => fr.bytes != null || JFiles.exists(localPath(fr.path))))

  /** Materialize bytes into the FileRef (download-adjacent; local/file://
    * here, remote schemes via [[UrlIO.download]]). */
  val fileReadUdf = udf((f: FileRef) =>
    Option(f).map { fr =>
      if (fr.bytes != null) fr
      else {
        val p = localPath(fr.path)
        FileRef(fr.path, if (JFiles.exists(p)) JFiles.readAllBytes(p) else null, fr.mediaType)
      }
    })

  /** ref guess_mime_type(bytes). */
  val guessMimeUdf = udf((b: Array[Byte]) => guessMime(b))
}
