ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daftspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DuckDB JDBC driver found pre-warmed in the local coursier cache (probe
// documented in SURVEY §8.7): discovered by filename glob so no repository
// URL is hard-coded and no resolution is attempted (COURSIER_MODE=offline).
// Backs read_sql.
Compile / unmanagedJars ++= {
  val cacheRoot = file(sys.props.getOrElse("user.home", "/root")) / ".cache" / "coursier"
  (cacheRoot ** "duckdb_jdbc-*.jar").get.headOption.map(Attributed.blank(_)).toSeq
}
Test / fork := true
run / fork := true
// The driver greps the bench's ONE-LINE JSON from stdout; sbt's default
// LoggedOutput wraps forked stdout as "[info] {...}" which is unparseable
// (BENCH_r13/r14/r15 all have parsed:null). StdoutOutput inherits the
// forked process's stdout/stderr directly — no prefix. Bench additionally
// writes the same JSON to bench_result.json as a belt-and-braces copy.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// 24g default: the machine has 128 GiB and the k=1000 bench tier (13 GB
// parquet input) needs sort + broadcast headroom across 32 local tasks —
// at 8g the q16 SMJ sort and the q18 AQE broadcast build both hit
// UNABLE_TO_ACQUIRE_MEMORY. Max heap is reserved lazily, so tests and
// small runs pay nothing for the larger ceiling.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
