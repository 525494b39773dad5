package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, xxhash64}

/** Split-block Bloom filter — the cache-conscious layout from the public
  * parquet-format BloomFilter spec (Apache Parquet `BloomFilter.md`,
  * itself from Putze/Sanders/Singler "Cache-, Hash- and Space-Efficient
  * Bloom Filters", 2007; the same structure Impala/Kudu use):
  *
  *   - the filter is an array of 256-bit (32-byte) BLOCKS;
  *   - a key selects ONE block (high hash bits scaled to block count)
  *     and sets/tests one bit in each of the block's eight 32-bit words
  *     (bit chosen by `(x * SALT[i]) >>> 27`);
  *   - every probe therefore touches one contiguous 32-byte region —
  *     ONE cache miss, vs ~7 scattered misses for the classic
  *     word-per-hash layout (`spark.util.sketch.BloomFilter`).
  *
  * That matters because the probe runs on EVERY fact row ahead of a
  * shuffle ([[Prune]]): at the SF100-equivalent tier the classic probe
  * was the single largest CPU line in q3's scan stage (profiled r8,
  * ~380 ns/row, miss-bound). Build-side insertion gets the same
  * single-miss benefit.
  *
  * fpp at `bitsPerKey` is slightly worse than a classic Bloom filter of
  * equal size (blocked filters lose a little to block-load imbalance):
  * ~0.9% at 12 bits/key, ~2% at 10. Default 12.
  */
final class SplitBlockBloom(val numBlocks: Int) extends Serializable {
  require(numBlocks > 0, "numBlocks must be positive")
  // 8 ints (256 bits) per block, laid out contiguously
  val blocks: Array[Int] = new Array[Int](numBlocks * 8)

  def insertHash(h: Long): Unit = {
    val b = SplitBlockBloom.blockIndex(h, numBlocks) << 3
    val x = h.toInt
    var i = 0
    while (i < 8) {
      blocks(b + i) |= 1 << ((x * SplitBlockBloom.SALT(i)) >>> 27)
      i += 1
    }
  }

  def mightContainHash(h: Long): Boolean =
    SplitBlockBloom.contains(blocks, numBlocks, h)

  def merge(other: SplitBlockBloom): SplitBlockBloom = {
    require(other.numBlocks == numBlocks, "cannot merge differently-sized filters")
    var i = 0
    while (i < blocks.length) { blocks(i) |= other.blocks(i); i += 1 }
    this
  }

  def sizeBytes: Long = blocks.length.toLong * 4

  /** Compact wire form (little-endian int32 block words; numBlocks is
    * implied by length) — the payload the optimizer-injected bloom
    * aggregate ships through its scalar subquery. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(blocks.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asIntBuffer().put(blocks)
    bb.array()
  }
}

object SplitBlockBloom {
  /** parquet-format BloomFilter.md salt constants (public spec). */
  final val SALT: Array[Int] = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  /** Fair block selection from the high 32 hash bits (multiply-shift —
    * no modulo bias, no division on the hot path). */
  def blockIndex(h: Long, numBlocks: Int): Int =
    (((h >>> 32) * numBlocks) >>> 32).toInt

  /** Static probe shared by interpreted eval and generated code: one
    * 32-byte block load, eight register-local bit tests. */
  def contains(blocks: Array[Int], numBlocks: Int, h: Long): Boolean = {
    val b = blockIndex(h, numBlocks) << 3
    val x = h.toInt
    var i = 0
    while (i < 8) {
      if ((blocks(b + i) & (1 << ((x * SALT(i)) >>> 27))) == 0) return false
      i += 1
    }
    true
  }

  /** Inverse of [[SplitBlockBloom.toBytes]]. */
  def fromBytes(bytes: Array[Byte]): SplitBlockBloom = {
    require(bytes.length % 32 == 0 && bytes.length > 0,
      s"split-block bloom payload must be a positive multiple of 32 bytes, got ${bytes.length}")
    val bf = new SplitBlockBloom(bytes.length / 32)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asIntBuffer().get(bf.blocks)
    bf
  }

  /** Blocks for `n` keys at `bitsPerKey` (256 bits per block). */
  def blocksFor(n: Long, bitsPerKey: Int): Int =
    math.max(1, math.min(Int.MaxValue / 8L, (n * bitsPerKey + 255) / 256)).toInt

  /** Distributed build over `df`'s `key` column: xxhash64 each non-null
    * key (the probe side hashes identically, so string/decimal/struct
    * keys work; null keys are dropped BEFORE hashing — they never match
    * an equi-join, and xxhash64(null) is just the seed so the old
    * post-hash null check was dead), insert into a PARTITION-LOCAL
    * filter allocated inside the task, OR-merge on the driver as task
    * results stream in.
    *
    * The filter must NOT appear in the task closure: a treeAggregate
    * zero value is serialized with the closure, so at 150-200M keys
    * every build task received a fresh 200-300 MB array of zeros over
    * the wire (r8 driver logs: "Broadcasting large task binary with
    * size 213.4 MiB"). With mapPartitions + fold the task binary is
    * back to bytes; merge traffic is `tasks × filter` result shipping,
    * bounded by the 8-task coalesce, and the driver holds at most two
    * filters at a time (fold merges incrementally per task completion).
    * Runs on the unsafe row iterator — no per-row boxing on a build
    * that can be 10s of millions of keys. */
  def build(df: DataFrame, key: String, n: Long, bitsPerKey: Int = 12): SplitBlockBloom = {
    val nb = blocksFor(n, bitsPerKey)
    val hashed = df.filter(col(key).isNotNull).select(xxhash64(col(key)).as("__k"))
    // few wide tasks, not many narrow ones: every task ships a full
    // filter to the merge, so at 30M keys × 12 bits (~45 MB) the
    // aggregation cost is dominated by result shipping/merges, not
    // inserts (~20 ns each). 8 tasks bound the merge traffic at ~8
    // filters while keeping inserts trivially cheap.
    val rdd = hashed.queryExecution.toRdd // InternalRow: primitive getLong
    val narrowed = if (rdd.getNumPartitions > 8) rdd.coalesce(8) else rdd
    val partials = narrowed.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val bf = new SplitBlockBloom(nb)
        while (rows.hasNext) bf.insertHash(rows.next().getLong(0))
        Iterator.single(bf)
      }
    }
    // fold, not reduce: the zero is a null sentinel (bytes in the
    // closure, never a filter), and an all-empty build still returns a
    // valid empty filter
    val merged = partials.fold(null) { (a, b) =>
      if (a == null) b else if (b == null) a else a.merge(b)
    }
    if (merged == null) new SplitBlockBloom(nb) else merged
  }
}
