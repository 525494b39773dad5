package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter for local
    // iteration (builder-only; the driver always passes two args, so the
    // official manifest still covers every registered key)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = Engine.session()
    new java.io.File(outDir).mkdirs()
    // Per-query outcome, recorded for EVERY registered key. A query that
    // throws during DataFrame CONSTRUCTION (not just execution) used to
    // leave no trace in outDir and silently vanish from CORRECTNESS_r*.json
    // — in r6 that hid 7 red rows. The manifest makes a dropped row loud:
    // every key appears exactly once, with `err` set on failure.
    val outcomes = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        outcomes(name) = None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        outcomes(name) = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
      }
      finally graft.ops.Caches.releaseAll() // drop query-leased cached blocks
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val manifest = outcomes
      .map { case (k, err) => s"${q(k)}: ${err.map(q).getOrElse("null")}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manifest)
    val failed = outcomes.collect { case (k, Some(_)) => k }
    System.err.println(
      s"[verify] ${outcomes.size} registered, ${outcomes.size - failed.size} ok" +
        (if (failed.nonEmpty) s", FAILED: ${failed.mkString(", ")}" else ""))
    spark.stop()
  }
}
