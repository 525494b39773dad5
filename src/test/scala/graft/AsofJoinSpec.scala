package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join vs a brute-force in-memory oracle over seeded random data —
  * the reference's test strategy for its asof suite
  * (tests/dataframe/test_asof_join*.py + property-based sort tests). */
class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val rng = new scala.util.Random(12345)
  private val leftRows = (1 to 300).map { i =>
    (i.toLong, rng.nextInt(5).toLong, rng.nextInt(1000).toLong)
  } // (id, key, t)
  private val rightRows = (1 to 200).map { i =>
    (i.toLong + 1000, rng.nextInt(5).toLong, rng.nextInt(1000).toLong)
  }

  private def mkDf(rows: Seq[(Long, Long, Long)], prefix: String) = {
    val schema = StructType(Seq(
      StructField(s"${prefix}id", LongType), StructField(s"${prefix}k", LongType),
      StructField(s"${prefix}t", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 4), schema)
  }

  private def bruteForce(strategy: AsofJoin.Strategy): Map[Long, Option[Long]] =
    leftRows.map { case (id, k, t) =>
      val cands = rightRows.filter(_._2 == k)
      val pick = strategy match {
        case AsofJoin.Backward =>
          val le = cands.filter(_._3 <= t)
          if (le.isEmpty) None else Some(le.maxBy(_._3))
        case AsofJoin.Forward =>
          val ge = cands.filter(_._3 >= t)
          if (ge.isEmpty) None else Some(ge.minBy(_._3))
        case AsofJoin.Nearest =>
          if (cands.isEmpty) None
          else {
            val minDiff = cands.map(c => math.abs(c._3 - t)).min
            val best = cands.filter(c => math.abs(c._3 - t) == minDiff)
            Some(best.minBy(_._3)) // tie -> backward (earlier t)
          }
      }
      id -> pick.map(_._3)
    }.toMap

  for (strategy <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest)) {
    test(s"asof $strategy matches brute force on random data") {
      val got = AsofJoin.join(
          mkDf(leftRows, "l"), mkDf(rightRows, "r"), "lt", "rt",
          Seq("lk"), Seq("rk"), strategy)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(5)).map(_.asInstanceOf[Long]))
        .toMap
      val expect = bruteForce(strategy)
      assert(got.size == leftRows.size, "left rows must all be preserved")
      val diffs = expect.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
      assert(diffs.isEmpty, s"mismatches (id, expected_t, got_t): ${diffs.take(5)}")
    }
  }

  for (strategy <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest)) {
    test(s"global asof $strategy (range-partitioned) matches brute force") {
      val noKeyLeft = leftRows.map { case (id, _, t) => (id, 0L, t) }
      val noKeyRight = rightRows.map { case (id, _, t) => (id, 0L, t) }
      val got = AsofJoin.joinGlobal(
          mkDf(noKeyLeft, "l"), mkDf(noKeyRight, "r"), "lt", "rt", strategy,
          numPartitions = 7)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(5)).map(_.asInstanceOf[Long]))
        .toMap
      val expect = noKeyLeft.map { case (id, _, t) =>
        val pick = strategy match {
          case AsofJoin.Backward =>
            val le = noKeyRight.filter(_._3 <= t)
            if (le.isEmpty) None else Some(le.map(_._3).max)
          case AsofJoin.Forward =>
            val ge = noKeyRight.filter(_._3 >= t)
            if (ge.isEmpty) None else Some(ge.map(_._3).min)
          case AsofJoin.Nearest =>
            if (noKeyRight.isEmpty) None
            else {
              val minDiff = noKeyRight.map(c => math.abs(c._3 - t)).min
              Some(noKeyRight.filter(c => math.abs(c._3 - t) == minDiff).map(_._3).min)
            }
        }
        id -> pick
      }.toMap
      assert(got.size == noKeyLeft.size)
      val diffs = expect.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
      assert(diffs.isEmpty, s"mismatches: ${diffs.take(5)}")
    }
  }

  test("asof tolerance nulls far matches") {
    val got = AsofJoin.join(
        mkDf(leftRows, "l"), mkDf(rightRows, "r"), "lt", "rt",
        Seq("lk"), Seq("rk"), AsofJoin.Backward, toleranceMicros = Some(50L))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(5)).map(_.asInstanceOf[Long]))
      .toMap
    val expect = leftRows.map { case (id, k, t) =>
      val le = rightRows.filter(c => c._2 == k && c._3 <= t)
      id -> (if (le.isEmpty) None else Some(le.maxBy(_._3)._3).filter(rt => t - rt <= 50L))
    }.toMap
    assert(got == expect)
  }

  test("planner-integrated asof matches the cogroup implementation exactly") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, TestSpark.sfDir).events
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = e.filter(col("event_type") === "purchase")
      .selectExpr("event_id as p_event_id", "user_id as p_user", "ts as p_ts", "value as p_value")
    for (strat <- Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest)) {
      val viaCogroup = AsofJoin
        .join(clicks, purchases, "ts", "p_ts", Seq("user_id"), Seq("p_user"), strat)
        .select("event_id", "p_event_id").orderBy("event_id").collect()
      val viaPlanner = graft.plans.PlannedAsof
        .join(clicks, purchases, "ts", "p_ts", Seq("user_id"), Seq("p_user"), strat)
        .select("event_id", "p_event_id").orderBy("event_id").collect()
      assert(viaCogroup.length == viaPlanner.length && viaCogroup.length > 0)
      viaCogroup.zip(viaPlanner).foreach { case (a, b) => assert(a == b, s"strategy $strat") }
    }
    // the physical plan is the custom operator with planner-owned exchanges
    val plan = graft.plans.PlannedAsof
      .join(clicks, purchases, "ts", "p_ts", Seq("user_id"), Seq("p_user"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the custom operator:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "EnsureRequirements must plan the by-key exchanges")
  }
}
