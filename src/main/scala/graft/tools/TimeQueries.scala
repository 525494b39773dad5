package graft.tools

/** Time an arbitrary subset of `SparkEntry.queries` at a Bench scaled tier
  * (VERDICT r12 #3: the TPC-DS slice must be "timed at the scaled tiers").
  * Prints one JSON line per tier, same shape as Bench's per-query maps, so
  * the numbers can be recorded in SURVEY / quiet artifacts.
  *
  *   TIME_PREFIX=tpcds_ TIME_K=100,1000 sbt "runMain graft.tools.TimeQueries"
  *
  * Per-query budget self-gate (VERDICT r14 #1): the tpcds/cb corpora have
  * no published baselines, so Bench's over_budget machinery can't see a
  * storm-inflated slice number — r14 shipped `tpcds_price_chain` at
  * 179.4 s measured at bw 24.1 GB/s while clean hosts read 45-54. Budgets
  * live in `tools/tpcds_budgets.json` (committed; clean-host numbers
  * × ~1.5 headroom, per tier). A query that ends over its budget gets ONE
  * bounded clean-host re-measure (wait for the bw/cpu kernels to read
  * clean relative to the run's best, then fresh reps; overall min wins —
  * contention is strictly additive, so a faster re-measure is always
  * honest). Still-over queries land in `over_budget` in the JSON line, so
  * a storm rep can never again silently become a query's number of record.
  */
object TimeQueries {

  /** tools/tpcds_budgets.json: {"k100": {"name": sec, ...}, "k1000": {...}}.
    * Absent file or absent key → no gate for that query (first-measurement
    * mode). */
  private def loadBudgets(k: Int): Map[String, Double] = {
    val f = new java.io.File("tools/tpcds_budgets.json")
    if (!f.isFile) return Map.empty
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(f)
      val tier = root.get(s"k$k")
      if (tier == null) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        tier.fields().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[time] budgets unreadable: ${e.getMessage}")
        Map.empty
    }
  }

  def main(args: Array[String]): Unit = {
    val prefix = sys.env.getOrElse("TIME_PREFIX", "tpcds_")
    val ks = sys.env.getOrElse("TIME_K", "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("TIME_REPS", "2").toInt
    // TIME_EXCLUDE: comma list of names to skip, for queries whose tables
    // the scaled fixture does not synthesize (cb_regex_extract reads
    // documents.parquet — base-SF-only). Loud, never silent.
    val excluded = sys.env.get("TIME_EXCLUDE")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    if (excluded.nonEmpty)
      System.err.println(s"[time] excluding: ${excluded.toSeq.sorted.mkString(", ")}")
    val names = graft.SparkEntry.queries.keys.filter(_.startsWith(prefix))
      .filterNot(excluded).toSeq.sorted
    if (names.isEmpty) { // ADVICE r13: bws.max below throws on an empty match
      System.err.println(s"[time] no queries match TIME_PREFIX=$prefix")
      return
    }
    graft.Engine.preferShmLocalDir()
    def newSession() = graft.Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    var spark = newSession()
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // codegen/JIT warmup on the smallest fixture (same rationale as Bench)
    names.foreach { n =>
      try drain(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    graft.ops.Caches.releaseAll()
    (1 to 2).foreach { _ => graft.Bench.calibSec(); graft.Bench.bwGbps() }

    // the run's best host readings — the denominators for "clean"
    var bestBw = 0.0
    var bestCalib = Double.MaxValue
    def probe(): (Double, Double) = {
      val bw = graft.Bench.bwGbps(); val c = graft.Bench.calibSec()
      bestBw = math.max(bestBw, bw); bestCalib = math.min(bestCalib, c)
      (bw, c)
    }

    /** Same contract as Bench's awaitCleanHost: two consecutive clean
      * samples ≥5 s apart before resuming; proceed regardless at the
      * deadline so a permanently slow host can't hang the run. */
    def awaitCleanHost(maxWaitSec: Int = 150): Unit = {
      val deadline = System.nanoTime() + maxWaitSec * 1000000000L
      var streak = 0
      while (System.nanoTime() < deadline) {
        val (bw, c) = probe()
        if (bw >= 0.70 * bestBw && c <= 1.25 * bestCalib) {
          streak += 1
          if (streak >= 2) return
          Thread.sleep(5000)
        } else {
          streak = 0
          System.err.println(f"[time] host slow (bw $bw%.1f vs best $bestBw%.1f, " +
            f"calib $c%.3f vs best $bestCalib%.3f) — waiting")
          Thread.sleep(15000)
        }
      }
      System.err.println("[time] clean-host wait expired — measuring anyway")
    }

    def measure(dir: String, n: String, r: Int): Seq[Double] =
      (1 to r).map { _ =>
        val t0 = System.nanoTime()
        try {
          val df = graft.SparkEntry.queries(n)(spark, dir)
          drain(df)
          if (sys.env.contains("TIME_EXPLAIN"))
            println(s"=== $n ===\n" +
              df.queryExecution.executedPlan.toString.take(14000))
        } finally graft.ops.Caches.releaseAll(blocking = true)
        (System.nanoTime() - t0) / 1e9
      }

    for (k <- ks) {
      val budgets = loadBudgets(k)
      val dir = graft.Bench.ensureScaled(spark, "/root/testdata/sf0.1", k)
      // host-weather telemetry next to every query (same kernels as Bench):
      // a number recorded without its bw context is unusable for A/Bs —
      // r13's q95 shape "A/B" swung 63→116 s on pure host drift
      var overBudget = List.empty[String]
      val times = names.map { n =>
        val (bw0, calib0) = probe()
        var secs = measure(dir, n, reps)
        var bw = bw0; var calib = calib0
        // budget gate: one bounded clean-host re-measure, overall min wins
        if (budgets.get(n).exists(b => secs.min > b)) {
          System.err.println(f"[time] $n ${secs.min}%.1f s over budget " +
            f"${budgets(n)}%.1f s (bw $bw0%.1f) — clean-host re-measure")
          awaitCleanHost()
          if (!spark.sparkContext.isStopped) spark.stop()
          System.gc()
          spark = newSession()
          val (bw1, calib1) = probe()
          secs ++= measure(dir, n, reps)
          bw = math.max(bw, bw1); calib = math.min(calib, calib1)
          if (budgets.get(n).exists(b => secs.min > b)) overBudget ::= n
        }
        (n, secs.min, bw, calib)
      }
      val total = times.map(_._2).sum
      val bws = times.map(_._3)
      val overJson = overBudget.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
      println(f"""{"metric":"time_$prefix","k":$k,"total_sec":$total%.3f,"bw_best_gbps":${bws.max}%.1f,"bw_worst_gbps":${bws.min}%.1f,"over_budget":$overJson,"queries":{${times.map { case (n, s, _, _) => f""""$n":$s%.3f""" }.mkString(",")}},"bw_gbps":{${times.map { case (n, _, b, _) => f""""$n":$b%.1f""" }.mkString(",")}},"calib":{${times.map { case (n, _, _, c) => f""""$n":$c%.3f""" }.mkString(",")}}}""")
    }
    spark.stop()
  }
}
