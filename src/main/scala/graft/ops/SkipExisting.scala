package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** skip_existing (ref `dataframe.py:3233`): filter out rows whose key(s)
  * already exist in previously-written output — the incremental-pipeline
  * "don't reprocess" step.
  *
  * The reference builds a Ray actor-sharded key filter (each actor holds a
  * shard of existing keys and filters incoming batches over RPC). The
  * Spark-first shape is declarative: read the existing paths, project +
  * distinct the key columns, LEFT ANTI join. Catalyst/AQE then picks the
  * physical strategy by measured size — a small key set broadcasts (the
  * map-side filter the reference's actors emulate), a fact-scale key set
  * shuffles both sides hash-partitioned (the sharding the reference does
  * by hand), and the distinct projection bounds the build side at
  * |unique keys|, not |existing rows|. At 100 TB nothing here collects to
  * the driver.
  *
  * Missing paths are permissive like the reference: none exist → the
  * frame is returned unchanged; a subset exists → filter against that
  * subset. Null keys never match an existing key (SQL equality), so
  * null-keyed rows are always kept — same as the reference's hash lookup
  * on materialized key tuples never matching absent entries.
  */
object SkipExisting {

  /** Supported existing-data formats, as in the reference (parquet, csv,
    * json/jsonl/ndjson — `dataframe.py:3310-3323`). */
  private def normalizeFormat(format: String): String =
    format.trim.toLowerCase match {
      case "parquet"                      => "parquet"
      case "csv"                          => "csv"
      case "json" | "jsonl" | "ndjson"    => "json"
      case other =>
        throw new IllegalArgumentException(
          s"skip_existing: unsupported format '$other' (parquet|csv|json)")
    }

  def skipExisting(df: DataFrame, existingPaths: Seq[String],
      keyColumns: Seq[String], format: String = "parquet",
      readerOptions: Map[String, String] = Map.empty): DataFrame = {
    require(existingPaths.nonEmpty && existingPaths.forall(_.nonEmpty),
      "skip_existing: existing_path must be a non-empty list of non-empty paths")
    require(keyColumns.nonEmpty, "skip_existing: at least one key column")
    keyColumns.foreach { k =>
      require(df.columns.contains(k),
        s"skip_existing: key column '$k' not in ${df.columns.mkString(", ")}")
    }
    val spark = df.sparkSession
    val fmt = normalizeFormat(format)

    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val present = existingPaths.filter { p =>
      val path = new Path(p)
      path.getFileSystem(hadoopConf).exists(path)
    }
    if (present.isEmpty) return df
    if (present.size < existingPaths.size) {
      // a WARNING like the reference's (ADVICE r11: the previous
      // SparkContext local property was never cleared and leaked to every
      // later job on the thread)
      System.err.println(
        s"[graft] skip_existing: only ${present.size}/${existingPaths.size} " +
          s"existing paths found; missing: " +
          existingPaths.filterNot(present.toSet).mkString(", "))
    }

    val existing = spark.read.format(fmt).options(readerOptions).load(present: _*)
    keyColumns.foreach { k =>
      require(existing.columns.contains(k),
        s"skip_existing: key column '$k' not in existing data " +
          s"(${existing.columns.mkString(", ")})")
    }
    // Rename the build side so self-referential column names can't
    // ambiguate the join condition.
    val keyed = keyColumns.foldLeft(
      existing.select(keyColumns.map(col): _*).distinct()) {
      (d, k) => d.withColumnRenamed(k, s"__existing_$k")
    }
    val cond = keyColumns.map(k => df(k) === keyed(s"__existing_$k"))
      .reduce(_ && _)
    df.join(keyed, cond, "left_anti")
  }
}
