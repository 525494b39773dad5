package graft.tools

/** Time an arbitrary subset of `SparkEntry.queries` at a Bench scaled tier
  * (VERDICT r12 #3: the TPC-DS slice must be "timed at the scaled tiers").
  * Prints one JSON line per tier, same shape as Bench's per-query maps, so
  * the numbers can be recorded in SURVEY / quiet artifacts.
  *
  *   TIME_PREFIX=tpcds_ TIME_K=100,1000 sbt "runMain graft.tools.TimeQueries"
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val prefix = sys.env.getOrElse("TIME_PREFIX", "tpcds_")
    val ks = sys.env.getOrElse("TIME_K", "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("TIME_REPS", "2").toInt
    val names = graft.SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
    if (names.isEmpty) { // ADVICE r13: bws.max below throws on an empty match
      System.err.println(s"[time] no queries match TIME_PREFIX=$prefix")
      return
    }
    graft.Engine.preferShmLocalDir()
    val spark = graft.Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // codegen/JIT warmup on the smallest fixture (same rationale as Bench)
    names.foreach { n =>
      try drain(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    graft.ops.Caches.releaseAll()
    for (k <- ks) {
      val dir = graft.Bench.ensureScaled(spark, "/root/testdata/sf0.1", k)
      // host-weather telemetry next to every query (same kernels as Bench):
      // a number recorded without its bw context is unusable for A/Bs —
      // this session's q95 shape "A/B" swung 63→116 s on pure host drift
      val times = names.map { n =>
        val bw = graft.Bench.bwGbps()
        val calib = graft.Bench.calibSec()
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try {
            val df = graft.SparkEntry.queries(n)(spark, dir)
            drain(df)
            if (sys.env.contains("TIME_EXPLAIN"))
              println(s"=== $n (k=$k) ===\n" +
                df.queryExecution.executedPlan.toString.take(14000))
          } finally graft.ops.Caches.releaseAll(blocking = true)
          (System.nanoTime() - t0) / 1e9
        }
        (n, secs.min, bw, calib)
      }
      val total = times.map(_._2).sum
      val bws = times.map(_._3)
      println(f"""{"metric":"time_$prefix","k":$k,"total_sec":$total%.3f,"bw_best_gbps":${bws.max}%.1f,"bw_worst_gbps":${bws.min}%.1f,"queries":{${times.map { case (n, s, _, _) => f""""$n":$s%.3f""" }.mkString(",")}},"bw_gbps":{${times.map { case (n, _, b, _) => f""""$n":$b%.1f""" }.mkString(",")}},"calib":{${times.map { case (n, _, _, c) => f""""$n":$c%.3f""" }.mkString(",")}}}""")
    }
    spark.stop()
  }
}
