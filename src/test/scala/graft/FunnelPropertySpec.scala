package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ClickBench

/** Funnel/retention invariants over random event permutations (VERDICT r7
  * #10): the windowed running-max funnel must equal a brute-force
  * existence check over (view, click, purchase) triples, and the
  * retention rollup must equal a naive per-user day-set fold. Timestamps
  * cluster tightly (including exact ties and exact 24 h boundaries) so
  * the tie-break and window-edge semantics are actually exercised. */
class FunnelPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7000L + i)))

  private val DAY = 100L // small window so boundaries are reachable

  // (user, type, t): t on a tiny grid → frequent equal-t ties; DAY-sized
  // gaps reachable; "other" event types must be pre-filtered by callers
  // (cb_funnel filters), so the generator stays within the funnel types
  private val eventsGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(0L, 5L)
      ty <- Gen.oneOf("view", "click", "purchase")
      t <- Gen.oneOf(Gen.choose(0L, 30L), Gen.choose(80L, 120L),
        Gen.choose(190L, 210L))
    } yield (u, ty, t))

  /** Brute-force reference: funnel depth by existence over event pairs/
    * triples with the window's (t, event_type-lexicographic) tie order.
    * A precedes B iff key(A) < key(B); "view" sorts after "click" and
    * "purchase", so an equal-t view does NOT precede them, while an
    * equal-t click DOES precede a purchase. */
  private def naiveLevel(evts: Seq[(String, Long)], day: Long): Int = {
    def rank(ty: String) = ty match { case "click" => 0; case "purchase" => 1; case "view" => 2 }
    def before(a: (String, Long), b: (String, Long)): Boolean =
      a._2 < b._2 || (a._2 == b._2 && rank(a._1) < rank(b._1))
    val views = evts.filter(_._1 == "view")
    val clicks = evts.filter(_._1 == "click")
    val purchases = evts.filter(_._1 == "purchase")
    val l3 = purchases.exists(p => clicks.exists(c => before(c, p) &&
      views.exists(v => before(v, c) && p._2 - v._2 <= day)))
    val l2 = clicks.exists(c => views.exists(v => before(v, c) && c._2 - v._2 <= day))
    if (l3) 3 else if (l2) 2 else if (views.nonEmpty) 1 else 0
  }

  private def mkDf(rows: List[(Long, String, Long)]) = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("t", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3), schema)
  }

  test("funnelLevels equals brute-force triple-existence on random permutations") {
    for (rows <- samples(eventsGen, 10); if rows.nonEmpty) {
      val got = ClickBench.funnelLevels(mkDf(rows), day = DAY)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = rows.groupBy(_._1).map { case (u, es) =>
        u -> naiveLevel(es.map(e => (e._2, e._3)), DAY)
      }
      assert(got == want, s"rows=$rows")
    }
  }

  test("funnel depth is permutation-invariant (input order must not matter)") {
    for (rows <- samples(eventsGen, 4); if rows.nonEmpty) {
      val a = ClickBench.funnelLevels(mkDf(rows), day = DAY)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val b = ClickBench.funnelLevels(mkDf(rows.reverse), day = DAY)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(a == b)
    }
  }

  private val activityGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(50, for {
      u <- Gen.choose(0L, 7L)
      d <- Gen.choose(100L, 120L) // spans d0=103 → d0+14=117
    } yield (u, d))

  test("retentionCounts equals naive per-user day-set fold") {
    val d0 = 103L
    for (rows <- samples(activityGen, 8); if rows.nonEmpty) {
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("d", LongType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
      val got = ClickBench.retentionCounts(df, d0).collect().head
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val day0 = byUser.count(_._2.contains(d0))
      val r7 = byUser.count(u => u._2.contains(d0) && u._2.contains(d0 + 7))
      val r14 = byUser.count(u => u._2.contains(d0) && u._2.contains(d0 + 14))
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
        (day0.toLong, r7.toLong, r14.toLong), s"rows=$rows")
    }
  }
}
