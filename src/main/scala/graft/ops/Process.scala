package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, udf}

/** run_process (ref `daft/functions/process.py`): run an external command
  * per row — argv tokens from columns/literals — and expose its stdout as
  * a column. Executes on the executor (ProcessBuilder, no shell unless
  * asked; shell mode enables pipes at the usual injection caveats).
  * on_error: "raise" fails the task, anything else yields null. */
object Process {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  def runProcess(args: Seq[Column], shell: Boolean = false,
      onError: String = "log"): Column = {
    val raise = onError == "raise"
    val f = udf { (argv: Seq[String]) =>
      try {
        val tokens =
          if (shell) Seq("/bin/sh", "-c", argv.mkString(" "))
          else argv
        val pb = new ProcessBuilder(tokens: _*)
        val p = pb.start()
        p.getOutputStream.close()
        // Drain stderr on its own thread: a command writing more than the
        // OS pipe buffer (~64KB) there would otherwise block, and stdout
        // never reaches EOF → the task hangs. Kept SEPARATE from stdout —
        // merging would interleave diagnostics into the data column.
        val errBuf = new java.io.ByteArrayOutputStream()
        val drainer = new Thread(() => p.getErrorStream.transferTo(errBuf))
        drainer.setDaemon(true)
        drainer.start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        val code = p.waitFor()
        drainer.join(10000)
        if (code != 0) {
          val err = errBuf.toString("UTF-8").take(4096)
          throw new RuntimeException(s"process exited $code: $tokens; stderr: $err")
        }
        Some(out)
      } catch {
        case e: Exception =>
          if (raise) throw e
          else {
            log.warn(s"run_process failed for argv=$argv: ${e.getMessage}")
            None
          }
      }
    }
    f(array(args: _*))
  }
}
