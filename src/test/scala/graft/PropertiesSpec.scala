package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (reference strategy:
  * tests/property_based_testing/strategies.py + test_sort.py — total-order
  * invariants over random data). Uses raw ScalaCheck generators sampled
  * with fixed seeds (the scalatest bridge isn't in the offline dep set). */
class PropertiesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val rowsGen: Gen[List[(Long, Option[Double], String)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(0L, 20L)
      v <- Gen.option(Gen.choose(-1e6, 1e6))
      s <- Gen.oneOf("a", "b", "c", "")
    } yield (k, v, s))

  private def mkDf(rows: List[(Long, Option[Double], String)]) = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType), StructField("s", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2.orNull, r._3)), 3), schema)
  }

  test("sort is a total order: nulls first, then ascending; multiset preserved") {
    for (rows <- samples(rowsGen, 8); if rows.nonEmpty) {
      val sorted = mkDf(rows)
        .orderBy(org.apache.spark.sql.functions.col("v").asc_nulls_first,
          org.apache.spark.sql.functions.col("k").asc,
          org.apache.spark.sql.functions.col("s").asc)
        .collect()
      assert(sorted.length == rows.length)
      val vs = sorted.map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      val (nulls, defined) = vs.span(_.isEmpty)
      assert(defined.forall(_.isDefined), "nulls must all sort first")
      val doubles = defined.flatten
      assert(doubles.zip(doubles.drop(1)).forall { case (a, b) => a <= b })
      assert(nulls.length == rows.count(_._2.isEmpty))
    }
  }

  test("dedupSubstrings equals the naive suffix-scan reference on random corpora") {
    // tiny alphabet forces natural cross- and within-doc duplicate
    // windows; the relational pipeline must match a direct in-memory
    // implementation of the Lee et al. semantics exactly
    val W = 3
    val docGen: Gen[List[String]] = Gen.listOfN(24,
      Gen.choose(0, 9).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))))
    for (texts <- samples(docGen, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      import spark.implicits._
      val got = graft.ops.Dedup
        .dedupSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text", windowTokens = W)
        .orderBy("doc_id").as[(Long, String)].collect().toSeq

      // naive reference: count every W-token window string globally,
      // mark covered positions, rebuild; empty docs disappear
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val counts = toks.flatMap { case (_, w) =>
        if (w.length >= W) w.sliding(W).map(_.mkString(" ")).toSeq else Nil
      }.groupBy(identity).map { case (k, v) => k -> v.length }
      val expected = toks.flatMap { case (id, w) =>
        val dupStarts = if (w.length >= W)
          (0 to w.length - W).filter(i => counts(w.slice(i, i + W).mkString(" ")) >= 2)
        else Nil
        if (dupStarts.isEmpty) Some(id -> w.mkString(" "))
        else {
          val covered = dupStarts.flatMap(p => p until p + W).toSet
          val kept = w.zipWithIndex.collect { case (t, j) if !covered(j) => t }
          if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
        }
      }
      assert(got == expected.sortBy(_._1),
        s"mismatch on corpus: ${docs.take(5)}...")
    }
  }

  test("groupBy sum equals per-key scala sum") {
    for (rows <- samples(rowsGen, 8); if rows.nonEmpty) {
      val got = mkDf(rows)
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("sv"),
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect()
        .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getLong(2)))
        .toMap
      val expect = rows.groupBy(_._1).map { case (k, rs) =>
        val defined = rs.flatMap(_._2)
        k -> ((if (defined.isEmpty) None else Some(defined.sum)), rs.size.toLong)
      }
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, (sv, n)) =>
        val (ev, en) = expect(k)
        assert(n == en)
        (sv, ev) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) <= math.max(1e-9, math.abs(b) * 1e-12))
          case (a, b)             => assert(a == b)
        }
      }
    }
  }

  test("minhash jaccard estimate converges to true jaccard") {
    val gen = for {
      common <- Gen.choose(5, 40)
      onlyA <- Gen.choose(0, 20)
      onlyB <- Gen.choose(0, 20)
    } yield (common, onlyA, onlyB)
    for ((common, onlyA, onlyB) <- samples(gen, 15)) {
      val shared = (0 until common).map(i => s"c$i")
      val a = shared ++ (0 until onlyA).map(i => s"a$i")
      val b = shared ++ (0 until onlyB).map(i => s"b$i")
      val k = 256
      val sa = graft.functions.Misc.minhashSignature(a, k, 1L)
      val sb = graft.functions.Misc.minhashSignature(b, k, 1L)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
      val truth = common.toDouble / (common + onlyA + onlyB)
      assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
    }
  }
}
