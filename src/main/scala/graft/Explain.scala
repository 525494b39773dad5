package graft

/** Plan-inspection main: prints the formatted executed plan of named
  * queries against a data dir (defaults to the headline set at sf0.1).
  * Usage: runMain graft.Explain <dir> <query...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else (1 to 10).map(i => s"q$i")
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { n =>
      println(s"\n========== $n @ $dir ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
