package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan audit (r12): run every TPC-H query at the k=100 fixture
  * and report, per query, how many DISTINCT materialized stages scan each
  * base table — the instrument that exposed q15/q17 silently computing
  * their expensive subtree twice. A table appearing in two distinct
  * ShuffleQueryStage subtrees (not a ReusedQueryStage reference) means the
  * scan+work runs twice per execution. */
object AuditPlans {
  private def walk(p: SparkPlan, seen: java.util.IdentityHashMap[SparkPlan, Boolean],
      out: scala.collection.mutable.Buffer[SparkPlan]): Unit = {
    if (seen.containsKey(p)) return
    seen.put(p, true)
    out += p
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    kids.foreach(walk(_, seen, out))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = graft.Bench.ensureScaled(spark, "/root/testdata/sf0.1",
      sys.env.getOrElse("AUDIT_K", "100").toInt)
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
    val only: Set[String] = sys.env.get("AUDIT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    for (i <- 1 to 22; q = s"q$i" if only.isEmpty || only(q)) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        df.collect() // finalize AQE
        val nodes = scala.collection.mutable.Buffer[SparkPlan]()
        walk(df.queryExecution.executedPlan, new java.util.IdentityHashMap, nodes)
        // distinct stage instances that contain a FileScan of each table
        val scans = nodes.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        val byTable = tables.map { t =>
          t -> scans.count(_.relation.location.rootPaths.exists(_.toString.contains(s"/$t.parquet")))
        }.filter(_._2 > 0)
        val stages = nodes.collect { case s: QueryStageExec => s }
        val reused = nodes.count(_.getClass.getSimpleName.contains("Reused"))
        val inmem = nodes.collect {
          case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
        }
        println(s"AUDIT $q scans={${byTable.map { case (t, n) => s"$t:$n" }.mkString(",")}} " +
          s"stages=${stages.size} reused=$reused inMemReads=${inmem.size}")
        if (sys.env.contains("AUDIT_PRINT"))
          println(df.queryExecution.executedPlan.toString.take(12000))
      } catch {
        case e: Throwable => println(s"AUDIT $q FAILED ${e.getMessage}")
      } finally graft.ops.Caches.releaseAll()
    }
    spark.stop()
  }
}
