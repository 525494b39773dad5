package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Misc namespace — mirrors `daft/functions/misc.py`: hashing (xxhash-style,
  * seeded), minhash, simhash, uuid, null helpers. MinHash/SimHash are
  * one-pass Scala UDFs over token arrays (O(tokens·k) primitive ops, no
  * shuffle) — the scalable building blocks for the dedup pipelines in
  * `graft.ops.Dedup`. */
object Misc {

  def hash32(cols: Column*): Column = hash(cols: _*)
  def hash64(cols: Column*): Column = xxhash64(cols: _*)
  def uuidCol(): Column = expr("uuid()")
  def eqNullSafe(a: Column, b: Column): Column = a <=> b
  def fillNull(c: Column, v: Column): Column = coalesce(c, v)
  def isIn(c: Column, vs: Any*): Column = c.isin(vs: _*)

  /** UUID generation, v4 or time-ordered v7 (ref misc.py:53 `uuid`).
    * v4 is Spark's builtin; v7 per RFC 9562: 48-bit unix-ms timestamp,
    * 4-bit version, 12 random bits, 2-bit variant, 62 random bits —
    * assembled from codegen'd builtins (hex/conv/rand), no UDF. */
  def uuidGen(version: String = "v4"): Column = version match {
    case "v4" => expr("uuid()")
    case "v7" => uuid7At(unix_millis(now()))
    case other => throw new IllegalArgumentException(s"unsupported uuid version $other")
  }

  /** UUIDv7 with an explicit millisecond timestamp column — the
    * deterministic-prefix building block (`uuidGen("v7")` passes now()).
    * Random bits come from unseeded rand() so rows are distinct. */
  def uuid7At(ms: Column): Column = {
    val t = lpad(lower(hex(ms)), 12, "0")
    def randHex(bits: Int, digits: Int): Column =
      lpad(lower(conv(floor(rand() * pow(lit(2), lit(bits))).cast("long").cast("string"),
        10, 16)), digits, "0")
    val variant = lower(hex((floor(rand() * 4) + 8).cast("long"))) // 8|9|a|b
    concat(
      substring(t, 1, 8), lit("-"),
      substring(t, 9, 4), lit("-"),
      lit("7"), randHex(12, 3), lit("-"),
      variant, randHex(12, 3), lit("-"),
      randHex(24, 6), randHex(24, 6))
  }

  /** Millisecond timestamp encoded in a UUIDv7 string (the inverse of
    * [[uuid7At]]'s prefix). */
  def uuid7Millis(u: Column): Column =
    conv(concat(substring(u, 1, 8), substring(u, 10, 4)), 16, 10).cast("long")

  private def uuid7Ts(u: Column): Column = timestamp_millis(uuid7Millis(u))

  /** Timestamp-part extraction from UUIDv7 (ref misc.py
    * extract_{day,hour,minute,month}_uuid7). */
  def extractDayUuid7(u: Column): Column = dayofmonth(uuid7Ts(u))
  def extractHourUuid7(u: Column): Column = hour(uuid7Ts(u))
  def extractMinuteUuid7(u: Column): Column = minute(uuid7Ts(u))
  def extractMonthUuid7(u: Column): Column = month(uuid7Ts(u))

  /** Uniform random integer in [low, high] (ref misc.py:94 random_int);
    * seeded variant is best-effort stable per row layout, like the
    * reference. */
  def randomInt(low: Long, high: Long, seed: Option[Long] = None): Column = {
    require(high >= low, s"random_int bounds [$low, $high] are inverted")
    val r = seed.map(rand(_)).getOrElse(rand())
    (floor(r * lit(high - low + 1)) + lit(low)).cast("long")
  }

  /** 64-bit avalanche hash (splitmix64 finalizer) — deterministic across
    * JVMs, used as the base hash for minhash/simhash. */
  @inline private[graft] def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private[graft] def stringHash64(s: String, seed: Long): Long = {
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = 0
    while (i < s.length) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    mix64(h ^ s.length.toLong)
  }

  /** MinHash signature: k minimum values of k seeded hash functions over the
    * token array, computed in one pass (ref misc.py:428). */
  def minhashSignature(tokens: Seq[String], k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (tokens == null) return sig
    val it = tokens.iterator
    while (it.hasNext) {
      val t = it.next()
      if (t != null) {
        val base = stringHash64(t, seed)
        var i = 0
        while (i < k) {
          // per-permutation hash derived from the base via mixing — a
          // standard one-hash minhash family
          val h = mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
    }
    sig
  }

  /** 64-bit SimHash over tokens (ref misc.py:462). */
  def simhash64(tokens: Seq[String], seed: Long): Long = {
    if (tokens == null) return 0L
    val acc = new Array[Int](64)
    val it = tokens.iterator
    while (it.hasNext) {
      val t = it.next()
      if (t != null) {
        val h = stringHash64(t, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def minhashUdf(k: Int, seed: Long) =
    udf { tokens: Seq[String] => minhashSignature(tokens, k, seed) }

  /** LSH band buckets computed IN one kernel call: signature + per-band
    * bucket hash fused. Returning the banded buckets directly (instead of
    * the signature, sliced per band downstream) matters for performance:
    * a signature column referenced once inside a per-band lambda gets
    * inlined by CollapseProject, re-evaluating the O(tokens×k) kernel
    * once PER BAND (measured 64× on the minhash-LSH pipeline). */
  def minhashBands(tokens: Seq[String], k: Int, bandRows: Int, seed: Long): Array[Long] = {
    val sig = minhashSignature(tokens, k, seed)
    val nBands = k / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var r = 0
      while (r < bandRows) { h = mix64(h ^ sig(b * bandRows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  def minhashBandsUdf(k: Int, bandRows: Int, seed: Long) =
    udf { tokens: Seq[String] => minhashBands(tokens, k, bandRows, seed) }

  /** Band buckets from PRE-HASHED tokens (xxhash64'd shingles): same
    * banding semantics, but the per-token string hash is paid once per
    * document upstream instead of inside the kernel. */
  def minhashBandsFromHashes(hashes: Seq[Long], k: Int, bandRows: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (hashes != null) {
      val it = hashes.iterator
      while (it.hasNext) {
        val base = mix64(it.next() ^ seed)
        var i = 0
        while (i < k) {
          val h = mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
    }
    val nBands = k / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var r = 0
      while (r < bandRows) { h = mix64(h ^ sig(b * bandRows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  def minhashBandsFromHashesUdf(k: Int, bandRows: Int, seed: Long) =
    udf { hashes: Seq[Long] => minhashBandsFromHashes(hashes, k, bandRows, seed) }

  /** Word n-gram shingles, hashed and sorted-distinct, in ONE O(tokens)
    * kernel pass (the Column-expression form pays an O(n) slice copy +
    * array_join per position, and costs ~1 ms/doc at n=3 — measured 5 s
    * per evaluation over a 5k-doc corpus, and self-join plans evaluate
    * it on every branch). */
  def hashedShingles(text: String, n: Int, seed: Long): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = text.split(" ")
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = stringHash64(sb.toString, seed)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hashes (shingles() is distinct)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  def hashedShinglesUdf(n: Int, seed: Long = 0L) =
    udf { text: String => hashedShingles(text, n, seed) }

  /** SimHash from pre-hashed tokens. With `hashedShingles(_, _, 0L)`
    * input this is BIT-IDENTICAL to `simhash64(shingleStrings, 0L)`:
    * both vote on `stringHash64(gram, 0)`. */
  def simhash64FromHashes(hashes: Seq[Long]): Long = {
    if (hashes == null) return 0L
    val acc = new Array[Int](64)
    val it = hashes.iterator
    while (it.hasNext) {
      val h = it.next()
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  val simhash64FromHashesUdf = udf { hashes: Seq[Long] => simhash64FromHashes(hashes) }


  val simhashUdfDefault = udf { tokens: Seq[String] => simhash64(tokens, 0L) }

  def minhash(tokens: Column, k: Int, seed: Long = 1L): Column =
    minhashUdf(k, seed)(tokens)

  def simhash(tokens: Column): Column = simhashUdfDefault(tokens)

  /** Hamming distance between two 64-bit simhashes. */
  def simhashHamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
