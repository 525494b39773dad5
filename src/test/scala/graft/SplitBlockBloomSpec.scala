package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SplitBlockBloom

/** Split-block Bloom filter (parquet-format layout): the no-false-negative
  * contract, a measured fpp bound at the default sizing, merge/distributed
  * build equivalence, and the codegen probe path through Prune. */
class SplitBlockBloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives, fpp within budget at 12 bits/key") {
    val n = 200000
    val bf = new SplitBlockBloom(SplitBlockBloom.blocksFor(n, 12))
    val rnd = new scala.util.Random(42)
    val keys = Array.fill(n)(rnd.nextLong())
    keys.foreach(bf.insertHash)
    assert(keys.forall(bf.mightContainHash), "false negative!")
    val keySet = keys.toSet
    val probes = Array.fill(200000)(rnd.nextLong())
    val fp = probes.count(h => !keySet.contains(h) && bf.mightContainHash(h))
    // spec-predicted ~0.9% at 12 bits/key; assert a loose 2% ceiling
    assert(fp.toDouble / probes.length < 0.02, s"fpp=${fp.toDouble / probes.length}")
  }

  test("merge is a bitwise union: merged filter contains both key sets") {
    val nb = SplitBlockBloom.blocksFor(1000, 12)
    val a = new SplitBlockBloom(nb)
    val b = new SplitBlockBloom(nb)
    (0L until 500L).foreach(i => a.insertHash(i * 0x9E3779B97F4A7C15L))
    (500L until 1000L).foreach(i => b.insertHash(i * 0x9E3779B97F4A7C15L))
    a.merge(b)
    assert((0L until 1000L).forall(i => a.mightContainHash(i * 0x9E3779B97F4A7C15L)))
  }

  test("distributed build equals a local single-threaded build") {
    val df = (1 to 50000).map(_.toLong).toDF("k").repartition(7)
    val dist = SplitBlockBloom.build(df, "k", 50000, 12)
    val local = new SplitBlockBloom(SplitBlockBloom.blocksFor(50000, 12))
    // the build hashes with xxhash64 — replicate through the SQL function
    val hashes = df.select(xxhash64(col("k"))).as[Long].collect()
    hashes.foreach(local.insertHash)
    assert(java.util.Arrays.equals(dist.blocks, local.blocks))
  }

  test("block index is fair-ish and in range across the hash space") {
    val nb = 1000
    val rnd = new scala.util.Random(7)
    val counts = new Array[Int](nb)
    (1 to 100000).foreach { _ =>
      val b = SplitBlockBloom.blockIndex(rnd.nextLong(), nb)
      assert(b >= 0 && b < nb)
      counts(b) += 1
    }
    assert(counts.max < 100000 / nb * 3, s"max block load ${counts.max}")
  }

  test("null build keys are skipped, null probe keys are dropped by the filter") {
    val build = Seq(Some(1L), None, Some(2L)).toDF("k")
    val bf = SplitBlockBloom.build(build, "k", 3, 12)
    val bc = spark.sparkContext.broadcast(bf)
    val big = Seq(Some(1L), Some(2L), Some(99999L), None).toDF("k")
    val kept = big.filter(col("k").isNotNull &&
        graft.expressions.BlockBloomMightContainExpr.mightContain(bc, xxhash64(col("k"))))
      .as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L) && !kept.contains(0L))
    // r9: nulls are dropped BEFORE hashing (the old post-hash isNullAt
    // check was dead — xxhash64(null) is just the seed). Detectable now:
    // the seed hash must not have been inserted by the null build row.
    val hashOfNull = build.filter(col("k").isNull)
      .select(xxhash64(col("k"))).as[Long].head()
    assert(!bf.mightContainHash(hashOfNull),
      "null build key leaked into the filter (pre-hash null drop regressed)")
  }

  test("wire form round-trips: fromBytes(toBytes) probes identically") {
    val nb = SplitBlockBloom.blocksFor(5000, 12)
    val bf = new SplitBlockBloom(nb)
    val rnd = new scala.util.Random(11)
    val keys = Array.fill(5000)(rnd.nextLong())
    keys.foreach(bf.insertHash)
    val back = SplitBlockBloom.fromBytes(bf.toBytes)
    assert(back.numBlocks == nb)
    assert(java.util.Arrays.equals(back.blocks, bf.blocks))
    assert(keys.forall(back.mightContainHash))
    intercept[IllegalArgumentException](SplitBlockBloom.fromBytes(new Array[Byte](33)))
    intercept[IllegalArgumentException](SplitBlockBloom.fromBytes(Array.emptyByteArray))
  }

  test("subquery aggregate (partial+merge over partitions) equals the RDD build") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
    import org.apache.spark.sql.graftbridge.Bridge
    val df = (1 to 30000).map(_.toLong).toDF("k").repartition(9)
    val nb = SplitBlockBloom.blocksFor(30000, 12)
    val aggCol = Bridge.column(AggregateExpression(
      graft.expressions.BlockBloomAggregate(
        Bridge.expression(xxhash64(col("k"))), nb),
      Complete, isDistinct = false))
    val bytes = df.agg(aggCol.as("bf")).head().getAs[Array[Byte]]("bf")
    val viaAgg = SplitBlockBloom.fromBytes(bytes)
    val viaBuild = SplitBlockBloom.build(df, "k", 30000, 12)
    assert(java.util.Arrays.equals(viaAgg.blocks, viaBuild.blocks),
      "two-phase aggregate build must be byte-identical to the RDD build")
  }
}
