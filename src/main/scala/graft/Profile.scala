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
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.add(m.inputMetrics.bytesRead)
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
      }
    }
    def reset(): Unit =
      Seq(input, shuffleRead, shuffleWrite, memSpill, diskSpill).foreach(_.reset())
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
    }
    spark.stop()
  }
}
