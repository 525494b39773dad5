package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Per-query physical-resource profile at a given SF dir: wall seconds,
  * input bytes, shuffle read/write bytes, and spill bytes, summed from
  * task metrics. The diagnostic companion to [[Bench]] — bench answers
  * "how fast", this answers "WHY that fast" (is a regression shuffle
  * growth, spill onset, or scan width?).
  *
  * Usage: runMain graft.Profile <sfDir> [q1 q8 q9 ...] */
object Profile {

  private final class Metrics extends SparkListener {
    val input = new LongAdder; val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder; val memSpill = new LongAdder
    val diskSpill = new LongAdder
    // per-stage [execRunMs, cpuMs, shufRead, shufWrite, spill, input, tasks]
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.add(m.inputMetrics.bytesRead)
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
        val a = stages.computeIfAbsent(t.stageId, _ => new Array[Long](7))
        a.synchronized {
          a(0) += m.executorRunTime; a(1) += m.executorCpuTime / 1000000
          a(2) += m.shuffleReadMetrics.totalBytesRead
          a(3) += m.shuffleWriteMetrics.bytesWritten
          a(4) += m.memoryBytesSpilled + m.diskBytesSpilled
          a(5) += m.inputMetrics.bytesRead; a(6) += 1
        }
      }
    }
    def printTopStages(n: Int): Unit = {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2(0)).take(n).foreach { case (id, a) =>
        println(f"  stage $id%4d run=${a(0) / 1000.0}%8.1fs cpu=${a(1) / 1000.0}%8.1fs tasks=${a(6)}%4d shufR=${a(2) / 1e9}%6.2fG shufW=${a(3) / 1e9}%6.2fG spill=${a(4) / 1e9}%6.2fG input=${a(5) / 1e9}%6.2fG")
      }
    }
    def reset(): Unit = {
      Seq(input, shuffleRead, shuffleWrite, memSpill, diskSpill).foreach(_.reset())
      stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else (1 to 10).map(i => s"q$i")
    // measurement harness: RAM-backed shuffle dirs for run-to-run
    // determinism (library sessions stay disk-backed — ADVICE r7)
    Engine.preferShmLocalDir()
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: classloading + page cache, not measured
    names.foreach { n =>
      try drain(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    // SPARK_GRAFT_PROFILE_EXPLAIN=1: print the executed plan before the
    // timed drain — lets a shape question (reused exchange? broadcast?)
    // be answered in the same pass as the numbers
    val explain = sys.env.getOrElse("SPARK_GRAFT_PROFILE_EXPLAIN", "0") == "1"
    names.foreach { name =>
      metrics.reset()
      if (explain) {
        val df = SparkEntry.queries(name)(spark, dir)
        println(s"==== $name plan ====")
        df.explain("formatted")
        graft.ops.Caches.releaseAll()
      }
      val t0 = System.nanoTime()
      try drain(SparkEntry.queries(name)(spark, dir))
      finally graft.ops.Caches.releaseAll() // drop query-leased cached blocks
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the listener bus drain task-end events
      def gb(a: LongAdder) = a.sum / 1e9
      println(f"""{"q":"$name","sec":$sec%.2f,"input_gb":${gb(metrics.input)}%.2f,"shuffle_read_gb":${gb(metrics.shuffleRead)}%.2f,"shuffle_write_gb":${gb(metrics.shuffleWrite)}%.2f,"spill_mem_gb":${gb(metrics.memSpill)}%.2f,"spill_disk_gb":${gb(metrics.diskSpill)}%.2f}""")
      // SPARK_GRAFT_PROFILE_STAGES=N: print the N heaviest stages by
      // executor run time — the WHERE for a regression the totals only
      // date (run≫cpu = IO/scheduling; spill>0 = memory; big shufR on a
      // small stage = exchange placement)
      sys.env.get("SPARK_GRAFT_PROFILE_STAGES").map(_.toInt).filter(_ > 0)
        .foreach(metrics.printTopStages)
    }
    spark.stop()
  }
}
