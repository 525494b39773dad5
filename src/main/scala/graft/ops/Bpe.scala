package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => JFiles, Paths}
import java.util.Base64

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-level BPE tokenizer with tiktoken-format pretrained vocabularies
  * (ref `daft/functions/str.py:1086` tokenize_encode/decode, which loads
  * `.tiktoken` files: one `base64(token_bytes) rank` pair per line; format
  * per the public tiktoken project).
  *
  * Token bytes are carried as ISO-8859-1 strings (1 char = 1 byte) so they
  * hash/compare cheaply as map keys. Encoding is the standard BPE merge
  * loop: split text into pieces (GPT-2-style regex), start from single
  * bytes, repeatedly merge the adjacent pair whose concatenation has the
  * LOWEST rank until no merge applies. Any vocab containing all 256
  * single-byte tokens round-trips losslessly.
  *
  * Scale shape: the vocab is a broadcast-sized dim (≤ a few 100k entries);
  * encode/decode are scalar UDFs over the broadcast map — pure map pass. */
object Bpe {

  type Ranks = Map[String, Int]

  private val latin1 = StandardCharsets.ISO_8859_1

  /** GPT-2-style piece splitter (contractions, letter runs, digit runs,
    * punctuation runs, whitespace). */
  private val pieceRe =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+".r

  /** Parse a .tiktoken vocab: `base64 rank` per line. */
  def loadTiktoken(path: String): Ranks =
    JFiles.readAllLines(Paths.get(path)).toArray(Array.empty[String])
      .iterator.map(_.trim).filter(_.nonEmpty).map { line =>
        val parts = line.split("\\s+")
        require(parts.length == 2, s"malformed tiktoken line: $line")
        new String(Base64.getDecoder.decode(parts(0)), latin1) -> parts(1).toInt
      }.toMap

  /** Write ranks in .tiktoken format (rank order). */
  def saveTiktoken(ranks: Ranks, path: String): Unit = {
    val lines = ranks.toSeq.sortBy(_._2).map { case (tok, r) =>
      s"${Base64.getEncoder.encodeToString(tok.getBytes(latin1))} $r"
    }
    JFiles.createDirectories(Paths.get(path).getParent)
    JFiles.write(Paths.get(path), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** BPE-encode one piece (latin1 byte-string) to ranks. */
  private def encodePiece(piece: String, ranks: Ranks): List[Int] = {
    if (piece.isEmpty) return Nil
    val parts = mutable.ArrayBuffer.from(piece.map(_.toString))
    var done = false
    while (!done && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        ranks.get(parts(i) + parts(i + 1)) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _ =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
      }
    }
    parts.map(ranks).toList // all singles present ⇒ total
  }

  /** Encode UTF-8 text → token ids. */
  def encode(text: String, ranks: Ranks): Array[Int] = {
    if (text == null) return Array.empty
    pieceRe.findAllIn(text).flatMap { piece =>
      encodePiece(new String(piece.getBytes(StandardCharsets.UTF_8), latin1), ranks)
    }.toArray
  }

  /** Decode token ids → UTF-8 text. */
  def decode(ids: Seq[Int], inverse: Map[Int, String]): String = {
    val sb = new StringBuilder
    ids.foreach(id => sb.append(inverse(id)))
    new String(sb.toString.getBytes(latin1), StandardCharsets.UTF_8)
  }

  /** Train a byte-level BPE vocab: 256 single-byte tokens (rank = byte
    * value) + `nMerges` learned merges (most-frequent adjacent pair per
    * step; ties broken lexicographically for determinism). */
  def train(corpus: Seq[String], nMerges: Int): Ranks = {
    val ranks = mutable.LinkedHashMap.from(
      (0 until 256).map(b => new String(Array(b.toByte), latin1) -> b))
    // working corpus: each piece as a list of current tokens
    var pieces: Seq[mutable.ArrayBuffer[String]] = corpus.flatMap { text =>
      pieceRe.findAllIn(if (text == null) "" else text).map { p =>
        mutable.ArrayBuffer.from(
          new String(p.getBytes(StandardCharsets.UTF_8), latin1).map(_.toString))
      }
    }
    var merge = 0
    var exhausted = false
    while (merge < nMerges && !exhausted) {
      val freq = mutable.HashMap.empty[(String, String), Int]
      pieces.foreach { parts =>
        var i = 0
        while (i < parts.length - 1) {
          val pair = (parts(i), parts(i + 1))
          freq(pair) = freq.getOrElse(pair, 0) + 1
          i += 1
        }
      }
      if (freq.isEmpty) exhausted = true
      else {
        // most frequent pair; lexicographic tiebreak for determinism
        val ((a, b), n) = freq.toSeq.sortBy { case ((x, y), c) => (-c, x + y) }.head
        if (n < 2) exhausted = true
        else {
          val tok = a + b
          ranks(tok) = 256 + merge
          pieces.foreach { parts =>
            var i = 0
            while (i < parts.length - 1) {
              if (parts(i) == a && parts(i + 1) == b) {
                parts(i) = tok
                parts.remove(i + 1)
              } else i += 1
            }
          }
          merge += 1
        }
      }
    }
    ranks.toMap
  }

  /** DataFrame surface: encode a text column against a broadcast vocab. */
  def encodeCol(df: DataFrame, textCol: String, outCol: String, ranks: Ranks): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(ranks)
    val f = udf((t: String) => encode(t, bc.value))
    df.withColumn(outCol, f(col(textCol)))
  }

  /** DataFrame surface: decode an ids column against the broadcast vocab. */
  def decodeCol(df: DataFrame, idsCol: String, outCol: String, ranks: Ranks): DataFrame = {
    val spark = df.sparkSession
    val inverse = ranks.map(_.swap)
    val bc = spark.sparkContext.broadcast(inverse)
    val f = udf((ids: Seq[Int]) => decode(ids, bc.value))
    df.withColumn(outCol, f(col(idsCol)))
  }
}
