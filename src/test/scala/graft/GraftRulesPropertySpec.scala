package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: the injected optimizer rules are result-invisible. For ANY
  * pair of tables (skewed keys, null keys, empty sides) and any supported
  * join type, the rules-on result equals the rules-off result
  * row-for-row — the prefilter may only drop rows the join would drop,
  * and the broadcast guard may only change physical strategy. Thresholds
  * are forced down so the bloom rule actually fires on these tiny frames,
  * and the suite asserts the probe was seen at least once — a property
  * run that never exercises the rewrite proves nothing. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't in the
  * offline dep set — same pattern as PropertiesSpec). */
class GraftRulesPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4200L + i)))

  private val keyGen: Gen[Option[Long]] = Gen.frequency(
    5 -> Gen.choose(0L, 30L).map(Some(_)), // dense, collides
    2 -> Gen.choose(0L, 1000000L).map(Some(_)), // sparse
    1 -> Gen.const(Option.empty[Long])) // null keys

  private val tableGen: Gen[List[(Option[Long], Int)]] =
    Gen.choose(0, 120).flatMap(n =>
      Gen.listOfN(n, keyGen.flatMap(k => Gen.choose(0, 9).map(v => (k, v)))))

  private def canon(d: DataFrame): Seq[String] =
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def withForcedThresholds[T](body: => T): T = {
    spark.conf.set("spark.graft.optimizer.bloomPrefilter.minProbeBytes", "1")
    spark.conf.set("spark.graft.optimizer.bloomPrefilter.probeRatio", "1")
    // broadcast off: these frames are tiny, so with the default threshold
    // every creation side hits the (correct) will-broadcast skip and the
    // property would never exercise the rewrite
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // keep Filter(LocalRelation) visible: ConvertToLocalRelation folds the
    // creation-side filter into a bare LocalRelation before preCBO, so the
    // selective-filter gate would never see one on these in-memory frames
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally {
      spark.conf.unset("spark.graft.optimizer.bloomPrefilter.minProbeBytes")
      spark.conf.unset("spark.graft.optimizer.bloomPrefilter.probeRatio")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  private def withRulesOff[T](body: => T): T = {
    spark.conf.set("spark.graft.optimizer.bloomPrefilter.enabled", "false")
    spark.conf.set("spark.graft.optimizer.factBroadcastGuard.enabled", "false")
    try body
    finally {
      spark.conf.unset("spark.graft.optimizer.bloomPrefilter.enabled")
      spark.conf.unset("spark.graft.optimizer.factBroadcastGuard.enabled")
    }
  }

  test("rules-on join results equal rules-off for arbitrary tables") {
    withForcedThresholds {
      var probeSeen = false
      val cases = samples(
        for {
          a <- tableGen; b <- tableGen
          jt <- Gen.oneOf("inner", "left_semi")
        } yield (a, b, jt), 25)
      assert(cases.size >= 20)
      for (((aRows, bRows, joinType), i) <- cases.zipWithIndex) {
        val a = aRows.toDF("ka", "va")
        // the creation-side filter makes it "likely selective" so the
        // bloom rule's structural gate passes on these tiny frames
        val b = bRows.toDF("kb", "vb").filter(col("vb") < 8)
        val joined = a.join(b, col("ka") === col("kb"), joinType)
        val on = canon(joined)
        if (!probeSeen)
          probeSeen = joined.queryExecution.executedPlan.toString
            .contains("graft_bloom_might_contain")
        val off = withRulesOff(
          canon(a.join(b, col("ka") === col("kb"), joinType)))
        assert(on == off, s"case $i join=$joinType: rules changed the result")
      }
      assert(probeSeen,
        "the bloom prefilter never fired across the whole property run — " +
          "the property tested nothing; check the forced thresholds")
    }
  }

  test("eager aggregation is result-invisible over random skew/null tables, and fires") {
    // name-based fact detection needs parquet-backed named tables: write
    // each random frame under <dir>/facta.parquet / <dir>/dimb.parquet and
    // declare facta a fact for the rule's role heuristic
    val olds = Seq(
      "spark.graft.optimizer.factTables" -> Some("facta,dimb"),
      "spark.graft.optimizer.eagerAggregation.minFactBytes" -> Some("1"),
      "spark.graft.optimizer.bloomPrefilter.enabled" -> Some("false"),
      "spark.sql.autoBroadcastJoinThreshold" -> Some("-1"))
    val prev = olds.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    olds.foreach { case (k, Some(v)) => spark.conf.set(k, v); case _ => }
    try {
      var fired = false
      val valGen: Gen[Option[Int]] = Gen.frequency(
        8 -> Gen.choose(-50, 50).map(Some(_)), 1 -> Gen.const(Option.empty[Int]))
      val factGen: Gen[List[(Option[Long], Option[Int])]] =
        Gen.choose(40, 200).flatMap(n =>
          Gen.listOfN(n, keyGen.flatMap(k => valGen.map(v => (k, v)))))
      val dimGen: Gen[List[(Option[Long], Int)]] =
        Gen.choose(0, 25).flatMap(n =>
          Gen.listOfN(n, keyGen.flatMap(k => Gen.choose(0, 3).map(w => (k, w)))))
      val cases = samples(
        for { f <- factGen; d <- dimGen; shape <- Gen.choose(0, 2) }
          yield (f, d, shape), 15)
      assert(cases.size >= 12)
      for (((fRows, dRows, shape), i) <- cases.zipWithIndex) {
        val dir = java.nio.file.Files.createTempDirectory(s"eager_prop_$i").toString
        fRows.toDF("k", "v").write.parquet(s"$dir/facta.parquet")
        dRows.toDF("dk", "w").write.parquet(s"$dir/dimb.parquet")
        def query(): DataFrame = {
          val f = spark.read.parquet(s"$dir/facta.parquet")
          val d = spark.read.parquet(s"$dir/dimb.parquet")
          val j = f.join(d, col("k") === col("dk"))
          shape match {
            case 0 => j.groupBy(col("k"), col("w")).agg(
              sum("v").as("s"), count(lit(1)).as("c"), min("v").as("mn"))
            case 1 => j.groupBy(col("k")).agg(
              count("v").as("cv"), max("v").as("mx"), sum("v").as("s"),
              avg(col("v").cast("double")).as("a"))
            case _ => j.groupBy(col("w")).agg(
              sum("v").as("s"), count(lit(1)).as("c"),
              avg(col("v").cast("double")).as("a"))
          }
        }
        val dfOn = query()
        val on = canon(dfOn)
        if (!fired)
          fired = dfOn.queryExecution.executedPlan.toString.contains("_eager_partial")
        spark.conf.set("spark.graft.optimizer.eagerAggregation.enabled", "false")
        val off = try canon(query())
        finally spark.conf.unset("spark.graft.optimizer.eagerAggregation.enabled")
        assert(on == off, s"case $i shape=$shape: eager aggregation changed the result")
      }
      assert(fired,
        "eager aggregation never fired across the property run — it tested nothing")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("multi-key equi-joins survive the rules (combined-hash probe)") {
    withForcedThresholds {
      val a = (1 to 200).map(i => (i % 7L, i % 11L, i)).toDF("k1", "k2", "va")
      val b = (1 to 60).map(i => (i % 7L, i % 13L, i)).toDF("j1", "j2", "vb")
        .filter(col("vb") < 40)
      val cond = col("k1") === col("j1") && col("k2") === col("j2")
      val on = canon(a.join(b, cond))
      val off = withRulesOff(canon(a.join(b, cond)))
      assert(on == off)
    }
  }
}
