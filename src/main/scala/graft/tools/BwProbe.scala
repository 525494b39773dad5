package graft.tools
/** One-shot host-weather probe: prints the Bench bw/cpu kernels. */
object BwProbe { def main(a: Array[String]): Unit =
  println(f"bw=${graft.Bench.bwGbps()}%.1f calib=${graft.Bench.calibSec()}%.3f") }
