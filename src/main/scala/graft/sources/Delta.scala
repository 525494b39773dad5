package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta Lake source/sink implemented from the OPEN PROTOCOL — the
  * `_delta_log` transaction log of newline-delimited JSON actions plus
  * parquet checkpoints (public spec: delta.io PROTOCOL.md; ref surface
  * `daft/io/_delta_lake.py` `read_deltalake` / `write_deltalake`). The
  * connector jars are absent in this environment (SURVEY §8.7 probe), so —
  * like [[Warc]] and [[Mcap]] — the format is implemented from its spec,
  * not wrapped.
  *
  * Protocol subset:
  *  - state reconstruction: latest checkpoint (via `_last_checkpoint`) +
  *    replay of the JSON commits after it; `add` actions keyed by path,
  *    `remove` cancels a prior `add`.
  *  - actions understood: `protocol`, `metaData` (schemaString is
  *    Spark-schema JSON per the spec), `add` (including its
  *    `deletionVector` descriptor — inline, relative-UUID, and absolute
  *    storage; see [[DeltaDeletionVectors]]), `remove`, `commitInfo` (and
  *    `txn`, ignored). Unknown reader features (e.g. column mapping) are
  *    rejected explicitly rather than silently misread; deletion vectors
  *    are applied at read as a (path, row-ordinal) anti-join and written
  *    by [[deleteVectors]] (merge-on-read DELETE).
  *  - time travel: `versionAsOf` replays the log only up to that version.
  *
  * Scale shape (100 TB posture):
  *  - The log replay is driver-side — same as every production Delta
  *    implementation: the log is KBs-to-MBs of metadata describing TBs of
  *    data, and file listing is always driver/planner work in Spark.
  *    Checkpoints keep replay O(commits since checkpoint), not O(history).
  *  - Data is read as ONE parquet scan over the active file set (column
  *    pruning + predicate pushdown reach the scan as usual). Partition
  *    columns — absent from the files, present only as `partitionValues`
  *    strings in the log — are re-attached by a BROADCAST join against
  *    the tiny file→partition-values map keyed on the hidden
  *    `_metadata.file_path` column, NOT by unioning one scan per
  *    partition (which would explode the plan at 10k partitions).
  *  - Partition pruning happens before the scan: `partitionFilter` culls
  *    the file list during planning, so pruned files are never opened.
  */
object Delta {

  private def mapper = new ObjectMapper()

  final case class AddFile(
      path: String,
      partitionValues: Map[String, String],
      size: Long,
      modificationTime: Long,
      stats: Option[String] = None,
      dv: Option[DeltaDeletionVectors.Descriptor] = None)

  /** Reconstructed table state at a version. `appTxns` is the latest
    * `txn` action version per application id (the spec's idempotent-
    * writer mechanism — a streaming sink records its batch id here and
    * skips batches at or below it on restart). */
  final case class Snapshot(
      tablePath: String,
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile],
      appTxns: Map[String, Long] = Map.empty) {
    def dataSchema: StructType =
      StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
  }

  /** Spark-side shape of the `deletionVector` struct (used for the
    * checkpoint add column; field order per PROTOCOL.md). */
  private val dvStructType = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  private def dvFromRow(r: Row, idx: Int): Option[DeltaDeletionVectors.Descriptor] =
    if (idx < 0 || r.isNullAt(idx)) None
    else {
      val d = r.getStruct(idx)
      Some(DeltaDeletionVectors.Descriptor(
        d.getString(0), d.getString(1),
        if (d.isNullAt(2)) None else Some(d.getInt(2)),
        d.getInt(3), d.getLong(4)))
    }

  private def logDir(tablePath: String): Path = Paths.get(tablePath, "_delta_log")

  private def commitFile(tablePath: String, v: Long): Path =
    logDir(tablePath).resolve(f"$v%020d.json")

  private def checkpointFile(tablePath: String, v: Long): Path =
    logDir(tablePath).resolve(f"$v%020d.checkpoint.parquet")

  /** Latest committed version, or -1 for a nonexistent table. Checkpoint
    * files count as committed versions too — the spec allows JSON commits
    * at or before a checkpoint to be cleaned up. */
  def latestVersion(tablePath: String): Long = {
    val dir = logDir(tablePath)
    if (!Files.isDirectory(dir)) return -1L
    val stream = Files.list(dir)
    val versions =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect {
          case n if n.endsWith(".json") && n.length == 25 =>
            n.stripSuffix(".json").toLong
          case n if n.endsWith(".checkpoint.parquet") =>
            n.stripSuffix(".checkpoint.parquet").toLong
        }
        .toSeq
      finally stream.close()
    if (versions.isEmpty) -1L else versions.max
  }

  // ---------------------------------------------------------------- reader

  /** Reconstructed log state with the checkpoint's (possibly huge) add
    * set kept DISTRIBUTED: `ckptAdds` is a DataFrame over the checkpoint
    * parquet (one row per live file), and only the JSON commits after the
    * checkpoint are replayed on the driver. Driver memory is therefore
    * O(commits since checkpoint) + O(files that survive pruning), never
    * O(all live files) — at millions of files × stats JSON a full
    * driver-side materialization would be multi-GB of heap. */
  private[graft] final case class State(
      tablePath: String,
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      appTxns: Map[String, Long],
      ckptAdds: Option[DataFrame],
      tailAdds: Seq[AddFile]) {
    def dataSchema: StructType =
      StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
  }

  private[graft] def state(
      spark: SparkSession, tablePath: String, versionAsOf: Option[Long] = None): State = {
    val latest = latestVersion(tablePath)
    require(latest >= 0, s"not a Delta table (no _delta_log): $tablePath")
    val target = versionAsOf.getOrElse(latest)
    require(target <= latest && target >= 0,
      s"version $target out of range [0, $latest] for $tablePath")

    // Start from the newest checkpoint at-or-before the target version.
    val ckptVersion: Option[Long] = {
      val lc = logDir(tablePath).resolve("_last_checkpoint")
      val fromHint =
        if (Files.exists(lc))
          Some(mapper.readTree(Files.readAllBytes(lc)).get("version").asLong)
        else None
      fromHint.filter(v => v <= target && Files.exists(checkpointFile(tablePath, v)))
    }

    val appTxns = mutable.Map.empty[String, Long]
    var schemaString: String = null
    var partitionCols: Seq[String] = Nil
    def applyMeta(schema: String, parts: Seq[String]): Unit = {
      schemaString = schema; partitionCols = parts
    }
    def applyProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
      val unsupported = readerFeatures
        .filterNot(Set("timestampNtz", "v2Checkpoint", "deletionVectors"))
      require(minReader <= 3 && unsupported.isEmpty,
        s"unsupported Delta reader requirement: minReaderVersion=$minReader features=$unsupported " +
          "(e.g. column mapping is not implemented)")
    }

    // Checkpoint: protocol / metaData / txn rows are O(1) / O(writer apps)
    // — collect only those. The add rows (one per live file) stay in a
    // DataFrame; remove tombstones (other writers retain them for vacuum
    // bookkeeping) cancel adds via an anti-join, also distributed.
    val rawCkptAdds: Option[DataFrame] = ckptVersion.map { cv =>
      val ck = spark.read.parquet(checkpointFile(tablePath, cv).toString)
      val cols = ck.columns.toSet
      // protocol + metaData + txn rows are O(1)/O(writer apps): gather
      // them in ONE job over the checkpoint instead of one scan each
      val headCols = Seq("protocol", "metaData", "txn").filter(cols)
      if (headCols.nonEmpty) {
        val headRows = ck
          .where(headCols.map(c => col(c).isNotNull).reduce(_ || _))
          .select(headCols.map(col): _*)
          .collect()
        def structOf(row: Row, name: String): Option[Row] = {
          val i = row.fieldIndex(name)
          if (row.isNullAt(i)) None else Some(row.getStruct(i))
        }
        headRows.foreach { row =>
          if (headCols.contains("protocol")) structOf(row, "protocol").foreach { p =>
            val feats =
              if (p.schema.fieldNames.contains("readerFeatures") && !p.isNullAt(p.fieldIndex("readerFeatures")))
                p.getSeq[String](p.fieldIndex("readerFeatures"))
              else Nil
            applyProtocol(p.getInt(p.fieldIndex("minReaderVersion")), feats)
          }
          if (headCols.contains("metaData")) structOf(row, "metaData").foreach { m =>
            applyMeta(m.getString(m.fieldIndex("schemaString")),
              m.getSeq[String](m.fieldIndex("partitionColumns")))
          }
          if (headCols.contains("txn")) structOf(row, "txn").foreach { t =>
            appTxns(t.getString(t.fieldIndex("appId"))) = t.getLong(t.fieldIndex("version"))
          }
        }
      }
      val addsSchema = StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("stats", StringType),
        StructField("deletionVector", dvStructType)))
      val adds =
        if (!cols("add"))
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], addsSchema)
        else {
          val addFields = ck.schema("add").dataType.asInstanceOf[StructType].fieldNames.toSet
          ck.where(col("add").isNotNull).select(
            col("add.path").as("path"),
            col("add.partitionValues").as("partitionValues"),
            col("add.size").as("size"),
            col("add.modificationTime").as("modificationTime"),
            (if (addFields("stats")) col("add.stats") else lit(null).cast(StringType)).as("stats"),
            (if (addFields("deletionVector")) col("add.deletionVector").cast(dvStructType)
             else lit(null).cast(dvStructType)).as("deletionVector"))
        }
      if (cols("remove"))
        adds.join(
          ck.where(col("remove").isNotNull).select(col("remove.path").as("__rm")),
          col("path") === col("__rm"), "left_anti")
      else adds
    }

    // Driver-side tail replay: final per-path outcome of every JSON
    // action after the checkpoint (Some = live add, None = removed).
    val touched = mutable.LinkedHashMap.empty[String, Option[AddFile]]
    val replayFrom = ckptVersion.map(_ + 1).getOrElse(0L)
    (replayFrom to target).foreach { v =>
      val f = commitFile(tablePath, v)
      require(Files.exists(f), s"missing Delta commit $v for $tablePath")
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          val p = node.get("protocol")
          val feats = Option(p.get("readerFeatures")).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
          applyProtocol(p.get("minReaderVersion").asInt, feats)
        }
        if (node.has("metaData")) {
          val m = node.get("metaData")
          applyMeta(m.get("schemaString").asText,
            m.get("partitionColumns").elements().asScala.map(_.asText).toSeq)
        }
        if (node.has("add")) {
          val a = node.get("add")
          val pv = Option(a.get("partitionValues")).map { o =>
            o.properties().asScala.map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText)).toMap
          }.getOrElse(Map.empty[String, String])
          val path = a.get("path").asText
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
            DeltaDeletionVectors.Descriptor(
              d.get("storageType").asText,
              d.get("pathOrInlineDv").asText,
              Option(d.get("offset")).filterNot(_.isNull).map(_.asInt),
              d.get("sizeInBytes").asInt,
              d.get("cardinality").asLong)
          }
          touched(path) = Some(AddFile(path, pv, a.get("size").asLong,
            Option(a.get("modificationTime")).map(_.asLong).getOrElse(0L),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText), dv))
        }
        if (node.has("remove")) touched(node.get("remove").get("path").asText) = None
        if (node.has("txn")) {
          val t = node.get("txn")
          appTxns(t.get("appId").asText) = t.get("version").asLong
        }
      }
    }

    require(schemaString != null, s"Delta log of $tablePath has no metaData action")
    // A checkpoint add for a path the tail touched (re-added or removed)
    // is superseded; the filter ships the touched set with the task.
    val touchedPaths = touched.keySet.toSet
    val ckptAdds = rawCkptAdds.map { df =>
      if (touchedPaths.isEmpty) df
      else {
        val untouched = udf((p: String) => !touchedPaths.contains(p))
        df.filter(untouched(col("path")))
      }
    }
    State(tablePath, target,
      DataType.fromJson(schemaString).asInstanceOf[StructType],
      partitionCols, appTxns.toMap, ckptAdds, touched.values.flatten.toSeq)
  }

  /** Materialize the live file list, applying partition- and stats-based
    * pruning BEFORE anything is collected to the driver. */
  private def collectAdds(
      st: State,
      partitionFilter: Map[String, String] => Boolean = _ => true,
      dataFilter: Option[Column] = None): Seq[AddFile] = {
    val keepStats: (Option[String], Map[String, String]) => Boolean =
      dataFilter.map(DeltaStats.keep(_, st.schema, st.partitionColumns))
        .getOrElse((_, _) => true)
    val fromCkpt = st.ckptAdds.toSeq.flatMap { df =>
      // only the stats prune runs distributed: its closure captures a
      // serializable Catalyst expression by construction, while the
      // caller-supplied partitionFilter function may capture anything —
      // it stays on the driver, applied to the (already pruned) survivors
      val ks = keepStats
      val keepUdf = udf { (pv: Map[String, String], stats: String) =>
        ks(Option(stats), Option(pv).getOrElse(Map.empty[String, String]))
      }
      df.filter(keepUdf(col("partitionValues"), col("stats"))).collect().map { r =>
        AddFile(
          r.getString(r.fieldIndex("path")),
          Option(r.getMap[String, String](r.fieldIndex("partitionValues")))
            .map(_.toMap).getOrElse(Map.empty),
          r.getLong(r.fieldIndex("size")),
          r.getLong(r.fieldIndex("modificationTime")),
          if (r.isNullAt(r.fieldIndex("stats"))) None else Some(r.getString(r.fieldIndex("stats"))),
          dvFromRow(r, r.schema.fieldNames.indexOf("deletionVector")))
      }.filter(f => partitionFilter(f.partitionValues))
    }
    fromCkpt ++ st.tailAdds.filter(f =>
      partitionFilter(f.partitionValues) && keepStats(f.stats, f.partitionValues))
  }

  /** Reconstruct the snapshot at `versionAsOf` (default: latest). `spark`
    * is needed only when state must be loaded from a parquet checkpoint.
    * Materializes the FULL file list — maintenance paths (compact /
    * vacuum / checkpoint) need it; the scan path goes through [[state]] +
    * pruned [[collectAdds]] instead. */
  def snapshot(spark: SparkSession, tablePath: String, versionAsOf: Option[Long] = None): Snapshot = {
    val st = state(spark, tablePath, versionAsOf)
    Snapshot(st.tablePath, st.version, st.schema, st.partitionColumns,
      collectAdds(st), st.appTxns)
  }

  /** Read a Delta table as a DataFrame.
    *
    * @param versionAsOf      time travel to this log version
    * @param partitionFilter  planning-time pruning over the log's
    *                         partitionValues — pruned files are never read
    * @param dataFilter       planning-time file skipping over per-file
    *                         min/max/nullCount stats ([[DeltaStats.prune]]);
    *                         ALSO applied as a row filter, so results are
    *                         identical with or without stats — skipping
    *                         only changes which files are opened
    */
  def read(
      spark: SparkSession,
      tablePath: String,
      versionAsOf: Option[Long] = None,
      partitionFilter: Map[String, String] => Boolean = _ => true,
      dataFilter: Option[Column] = None): DataFrame = {
    val st = state(spark, tablePath, versionAsOf)
    val live = collectAdds(st, partitionFilter, dataFilter)
    val df = readFiles(spark, tablePath, st.schema, st.partitionColumns, live)
    dataFilter.fold(df)(df.filter)
  }

  /** Scan a live file set, applying any deletion vectors (PROTOCOL.md
    * §Deletion Vectors): a row survives iff its (file, ordinal) is not in
    * its file's DV. The tombstone side is decoded on EXECUTORS (one task
    * per DV'd file) and anti-joined on (path, `_metadata.row_index`) —
    * driver holds only descriptors; the tombstone volume is proportional
    * to deleted rows, so Catalyst broadcasts it when small and shuffles
    * at billion-tombstone scale. */
  private def readFiles(
      spark: SparkSession,
      tablePath: String,
      schema: StructType,
      partCols: Seq[String],
      live: Seq[AddFile]): DataFrame = {
    if (!live.exists(_.dv.isDefined))
      PartitionedFiles.readWithPartitions(
        spark, schema, partCols,
        live.map(f => absolutePath(tablePath, f.path)),
        live.map(_.partitionValues))
    else {
      val data = PartitionedFiles.readWithPartitions(
        spark, schema, partCols,
        live.map(f => absolutePath(tablePath, f.path)),
        live.map(_.partitionValues),
        sourceCol = Some("__graft_src"), posCol = Some("__graft_pos"))
      minusDvTombstones(spark, tablePath, data, live)
        .drop("__graft_src", "__graft_pos")
    }
  }

  /** Anti-join `data` (must carry `__graft_src`/`__graft_pos`) against
    * the deletion vectors of `files`. No-op when none has a DV. */
  private def minusDvTombstones(
      spark: SparkSession, tablePath: String,
      data: DataFrame, files: Seq[AddFile]): DataFrame = {
    val withDv = files.flatMap(f => f.dv.map(d =>
      (Paths.get(absolutePath(tablePath, f.path)).normalize.toString, d)))
    if (withDv.isEmpty) return data
    val tp = tablePath
    val rows = spark.sparkContext
      .parallelize(withDv, math.min(withDv.size, 64))
      .flatMap { case (p, d) =>
        DeltaDeletionVectors.positions(tp, d).map(pos => Row(p, pos)) }
    val tombstones = spark.createDataFrame(rows, StructType(Seq(
      StructField("__del_path", StringType), StructField("__del_pos", LongType))))
    data.join(tombstones,
      data("__graft_src") === col("__del_path") &&
        data("__graft_pos") === col("__del_pos"),
      "left_anti")
  }

  /** The file subset [[read]] would open for `dataFilter` — exposed so
    * tests (and planners) can assert skipping effectiveness. */
  def filesForScan(spark: SparkSession, tablePath: String, dataFilter: Column): Seq[AddFile] = {
    val st = state(spark, tablePath)
    collectAdds(st, dataFilter = Some(dataFilter))
  }

  private[graft] def readSnapshot(
      spark: SparkSession,
      snap: Snapshot,
      partitionFilter: Map[String, String] => Boolean = _ => true,
      dataFilter: Option[Column] = None): DataFrame = {
    val partLive = snap.files.filter(f => partitionFilter(f.partitionValues))
    val live = dataFilter.fold(partLive)(
      DeltaStats.prune(partLive, _, snap.schema, snap.partitionColumns))
    readFiles(spark, snap.tablePath, snap.schema, snap.partitionColumns, live)
  }

  private def absolutePath(tablePath: String, rel: String): String = {
    val decoded = java.net.URLDecoder.decode(rel, "UTF-8")
    if (decoded.startsWith("/") || decoded.contains("://")) decoded
    else s"$tablePath/$decoded"
  }

  // ---------------------------------------------------------------- writer

  /** Write `df` as a Delta commit. `mode` is `"append"` (default),
    * `"overwrite"` (logically removes every live file, then adds), or
    * `"errorifexists"`. Creates the table (version 0 with protocol +
    * metaData) when the log doesn't exist yet.
    *
    * Commit protocol per the spec: data files land first, then the
    * `vNNN.json` log entry is published by an atomic same-filesystem
    * rename that fails if the version already exists (optimistic
    * concurrency — a losing writer retries against the next version). */
  def write(
      df: DataFrame,
      tablePath: String,
      mode: String = "append",
      partitionBy: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Long = {
    val spark = df.sparkSession
    val existing = latestVersion(tablePath)
    require(existing < 0 || mode != "errorifexists", s"Delta table already exists: $tablePath")
    val partCols =
      if (existing < 0) partitionBy
      else {
        val s = snapshot(spark, tablePath)
        require(partitionBy.isEmpty || partitionBy == s.partitionColumns,
          s"partitionBy $partitionBy does not match table partitioning ${s.partitionColumns}")
        if (mode == "append")
          PartitionedFiles.requireSameSchema(s.schema, df.schema, s"delta append to $tablePath")
        s.partitionColumns
      }

    // 1. data files: stage through a scratch dir (hive-layout for
    //    partitioned writes), then move parts into the table layout.
    val now = System.currentTimeMillis()
    // add.path is percent-encoded per the spec ("relative path, encoded
    // as a URL") so readers' decode restores the on-disk literal even
    // for partition values containing '%', '+', spaces, or non-ASCII
    val staged = PartitionedFiles.stageAndMove(df, tablePath, partCols)
    val dataSchema = StructType(df.schema.filterNot(f => partCols.contains(f.name)))
    val statsByRel = DeltaStats.collect(spark, tablePath, staged, dataSchema)
    val added = staged.map(f => AddFile(PartitionedFiles.percentEncodePath(f.relPath),
      f.partitionValues, f.sizeBytes, now, statsByRel.get(f.relPath)))

    // 2. publish the commit, retrying on version races.
    var attempt = math.max(existing, -1L) + 1
    var committed = -1L
    while (committed < 0) {
      val removes: Seq[String] =
        if (mode == "overwrite" && attempt > 0) snapshot(spark, tablePath).files.map(_.path) else Nil
      val lines = mutable.ArrayBuffer.empty[String]
      val om = mapper
      if (attempt == 0) {
        lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
        lines += metaDataJson(om, df.schema, partCols)
      } else if (mode == "overwrite") {
        lines += metaDataJson(om, df.schema, partCols)
      }
      removes.foreach { p =>
        val o = om.createObjectNode()
        val r = o.putObject("remove")
        r.put("path", p); r.put("deletionTimestamp", now); r.put("dataChange", true)
        lines += om.writeValueAsString(o)
      }
      added.foreach(a => lines += addJson(om, a, dataChange = true))
      txn.foreach { case (appId, v) =>
        val o = om.createObjectNode()
        val t = o.putObject("txn")
        t.put("appId", appId); t.put("version", v); t.put("lastUpdated", now)
        lines += om.writeValueAsString(o)
      }
      val ci = om.createObjectNode()
      val info = ci.putObject("commitInfo")
      info.put("timestamp", now); info.put("operation", if (mode == "overwrite") "WRITE OVERWRITE" else "WRITE")
      lines += om.writeValueAsString(ci)

      Files.createDirectories(logDir(tablePath))
      val tmp = logDir(tablePath).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      try {
        // hard-link claim: atomic EEXIST, never a silent rename-overwrite
        AtomicClaim.publish(tmp, commitFile(tablePath, attempt))
        committed = attempt
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp); attempt += 1 // lost the race; recompute removes
      }
    }
    committed
  }

  /** One `add` action line (shared by write / rewrite / DML commits);
    * emits the `deletionVector` struct when the file carries one. */
  private def addJson(om: ObjectMapper, a: AddFile, dataChange: Boolean): String = {
    val o = om.createObjectNode()
    val ad = o.putObject("add")
    ad.put("path", a.path)
    val pv = ad.putObject("partitionValues")
    a.partitionValues.foreach { case (k, v) => if (v == null) pv.putNull(k) else pv.put(k, v) }
    ad.put("size", a.size); ad.put("modificationTime", a.modificationTime)
    ad.put("dataChange", dataChange)
    a.stats.foreach(ad.put("stats", _))
    a.dv.foreach { d =>
      val dn = ad.putObject("deletionVector")
      dn.put("storageType", d.storageType)
      dn.put("pathOrInlineDv", d.pathOrInlineDv)
      d.offset.foreach(off => { dn.put("offset", off); () })
      dn.put("sizeInBytes", d.sizeInBytes)
      dn.put("cardinality", d.cardinality)
    }
    om.writeValueAsString(o)
  }

  private def metaDataJson(om: ObjectMapper, schema: StructType, partCols: Seq[String]): String = {
    val o = om.createObjectNode()
    val m = o.putObject("metaData")
    m.put("id", UUID.randomUUID().toString)
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns"); partCols.foreach(pc.add)
    m.putObject("configuration")
    m.put("createdTime", System.currentTimeMillis())
    om.writeValueAsString(o)
  }

  /** Small-file compaction (the OPTIMIZE operation): rewrite each
    * partition's files into ~`targetFileBytes` outputs and commit the
    * swap with `dataChange=false` adds + removes — per the spec, readers
    * streaming change feeds skip such commits, and time travel still
    * works because the old files stay on disk until [[vacuum]].
    *
    * At 100 TB this is the essential companion to streaming ingest: a
    * micro-batch sink produces one small file per batch per partition,
    * and scans degrade linearly with file count until compaction folds
    * them back to ~128 MB objects. Only partitions with more than one
    * file are rewritten. */
  def compact(
      spark: SparkSession,
      tablePath: String,
      targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val snap = snapshot(spark, tablePath)
    val byPartition = snap.files.groupBy(_.partitionValues)
    val toCompact = byPartition.filter(_._2.size > 1)
    if (toCompact.isEmpty) return snap.version

    val now = System.currentTimeMillis()
    val removed = toCompact.values.flatten.toSeq
    val staged = inParallel(toCompact.toSeq) { case (pv, files) =>
      val bytes = files.map(_.size).sum
      val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val slice = readSnapshot(spark, snap.copy(files = files))
        .coalesce(n)
      PartitionedFiles.stageAndMove(slice, tablePath, snap.partitionColumns)
    }.flatten
    // ONE stats pass over every rewritten file, not one job per partition
    val statsByRel = DeltaStats.collect(spark, tablePath, staged, snap.dataSchema)
    val added = staged.map(f => AddFile(PartitionedFiles.percentEncodePath(f.relPath),
      f.partitionValues, f.sizeBytes, now, statsByRel.get(f.relPath)))

    commitRewrite(spark, tablePath, snap.version, removed, added, now, "OPTIMIZE")
  }

  /** Run per-partition rewrite work with bounded concurrent Spark job
    * submission — a sequential loop means one scheduler round-trip per
    * partition, which at 10k partitions dominates the rewrite. Spark's
    * scheduler interleaves the concurrent jobs' tasks across executors. */
  private def inParallel[A, B](items: Seq[A], slots: Int = 8)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(slots, items.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.traverse(items)(a => Future(f(a))), Duration.Inf)
    finally pool.shutdown()
  }

  /** Publish a dataChange=false rewrite (the OPTIMIZE commit shape):
    * removes + adds, retrying on version races. If a concurrent commit
    * removed any file this rewrite covers, publishing would resurrect
    * overwritten rows — abort instead (a rewrite is only an
    * optimization), deleting the staged outputs. */
  private def commitRewrite(
      spark: SparkSession,
      tablePath: String,
      startVersion: Long,
      removed: Seq[AddFile],
      added: Seq[AddFile],
      now: Long,
      operation: String): Long = {
    val om = mapper
    val lines = mutable.ArrayBuffer.empty[String]
    removed.foreach { f =>
      val o = om.createObjectNode()
      val r = o.putObject("remove")
      r.put("path", f.path); r.put("deletionTimestamp", now); r.put("dataChange", false)
      lines += om.writeValueAsString(o)
    }
    added.foreach(a => lines += addJson(om, a, dataChange = false))
    val ci = om.createObjectNode()
    val info = ci.putObject("commitInfo")
    info.put("timestamp", now); info.put("operation", operation)
    lines += om.writeValueAsString(ci)

    var attempt = startVersion + 1
    var committed = -1L
    while (committed < 0) {
      val tmp = logDir(tablePath).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      try { AtomicClaim.publish(tmp, commitFile(tablePath, attempt)); committed = attempt }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp)
        val latest = snapshot(spark, tablePath)
        val stillLive = latest.files.map(_.path).toSet
        if (!removed.forall(f => stillLive.contains(f.path))) {
          added.foreach(a =>
            Files.deleteIfExists(Paths.get(absolutePath(tablePath, a.path))))
          return latest.version
        }
        attempt = latest.version + 1
      }
    }
    committed
  }

  /** OPTIMIZE ZORDER BY (production Delta's multi-dimensional
    * clustering): rewrite every partition with rows ordered by the
    * interleaved z-value of `zorderBy` ([[DeltaStats.zValue]]), so every
    * output file gets a tight min/max box in ALL listed dimensions at
    * once — [[DeltaStats.prune]] then answers a point/range predicate on
    * any of them by opening a small fraction of the files. Old files stay
    * until [[vacuum]]; the commit is dataChange=false like [[compact]].
    * Supported dimension types: numeric, date, timestamp. */
  def optimizeZorder(
      spark: SparkSession,
      tablePath: String,
      zorderBy: Seq[String],
      targetFileBytes: Long = 128L << 20): Long = {
    val snap = snapshot(spark, tablePath)
    require(zorderBy.nonEmpty, "zorderBy must list at least one column")
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    zorderBy.foreach { c =>
      require(snap.schema.fieldNames.contains(c), s"no such column: $c")
      require(!snap.partitionColumns.contains(c),
        s"cannot z-order by partition column $c (directories already segregate it)")
    }
    if (snap.files.isEmpty) return snap.version

    // Per-dimension numeric view (dates/timestamps → epoch numbers).
    val dims: Seq[Column] = zorderBy.map { c =>
      snap.schema(c).dataType match {
        case DateType => unix_date(col(c)).cast(DoubleType)
        case TimestampType => unix_micros(col(c)).cast(DoubleType)
        case _: NumericType => col(c).cast(DoubleType)
        case other => throw new IllegalArgumentException(
          s"zorder column $c has unsupported type ${other.catalogString}")
      }
    }

    val now = System.currentTimeMillis()
    val byPartition = snap.files.groupBy(_.partitionValues)
    val staged = inParallel(byPartition.toSeq) { case (_, files) =>
      val slice = readSnapshot(spark, snap.copy(files = files))
      val rangeAggs = dims.zipWithIndex.flatMap { case (d, i) =>
        Seq(min(d).as(s"__lo$i"), max(d).as(s"__hi$i")) }
      val r = slice.agg(rangeAggs.head, rangeAggs.tail: _*).collect()(0)
      val ranged = dims.zipWithIndex.map { case (d, i) =>
        def at(n: String) = if (r.isNullAt(r.fieldIndex(n))) 0.0 else r.getDouble(r.fieldIndex(n))
        d -> (at(s"__lo$i"), at(s"__hi$i"))
      }
      val bytes = files.map(_.size).sum
      val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val clustered = slice
        .withColumn("__z", DeltaStats.zValue(ranged))
        .repartitionByRange(n, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
      PartitionedFiles.stageAndMove(clustered, tablePath, snap.partitionColumns)
    }.flatten
    // ONE stats pass over every rewritten file, not one job per partition
    val statsByRel = DeltaStats.collect(spark, tablePath, staged, snap.dataSchema)
    val added = staged.map(f => AddFile(PartitionedFiles.percentEncodePath(f.relPath),
      f.partitionValues, f.sizeBytes, now, statsByRel.get(f.relPath)))
    commitRewrite(spark, tablePath, snap.version, snap.files, added, now, "OPTIMIZE ZORDER")
  }

  /** Row-level DELETE via copy-on-write (the spec's remove + rewritten
    * add commit shape; production Delta's default DELETE mode): files
    * whose stats prove no row can match are untouched, candidate files
    * are probed with ONE distributed per-file match count, and only
    * files actually containing matches are rewritten without the
    * matching rows. NULL predicate results keep the row (SQL DELETE
    * semantics). Returns (committed version, rows deleted).
    *
    * At 100 TB this is the compliance-delete shape a training corpus
    * needs: a point delete on a z-ordered/clustered column rewrites a
    * handful of files, not the table. */
  def delete(spark: SparkSession, tablePath: String, pred: Column): (Long, Long) = {
    rewriteRows(spark, tablePath, pred, "DELETE",
      (slice, hit) => slice.filter(!hit))
  }

  /** Row-level DELETE via deletion vectors (merge-on-read; PROTOCOL.md
    * §Deletion Vectors): matching rows are tombstoned by row ordinal —
    * the write cost is proportional to DELETED rows, not touched files
    * ([[delete]] is the copy-on-write alternative; at 100 TB a point
    * delete under CoW rewrites gigabytes, under MoR kilobytes). Each
    * touched file is re-added with a descriptor whose bitmap is the UNION
    * of its previous DV and the new tombstones (one DV per file, per
    * spec). Blobs ≤ `inlineMaxBytes` inline ("i"); larger ones share one
    * `deletion_vector_<uuid>.bin` ("u" multi-DV file). The commit carries
    * the table-features protocol (minReader 3 / minWriter 7 +
    * deletionVectors). Returns (version, rows newly deleted). */
  def deleteVectors(spark: SparkSession, tablePath: String, pred: Column,
      inlineMaxBytes: Int = 512): (Long, Long) = {
    val snap = snapshot(spark, tablePath)
    val hit = coalesce(pred, lit(false))
    val candidates = DeltaStats.prune(snap.files, pred, snap.schema, snap.partitionColumns)
    if (candidates.isEmpty) return (snap.version, 0L)
    def normPath(f: AddFile): String =
      Paths.get(absolutePath(tablePath, f.path)).normalize.toString
    // one distributed pass: new tombstone ordinals per file (previously
    // tombstoned rows excluded, so a repeated DELETE is a no-op and
    // cardinalities stay exact)
    val newPositions: Map[String, Array[Long]] = minusDvTombstones(spark, tablePath,
        PartitionedFiles.readWithPartitions(
          spark, snap.schema, snap.partitionColumns,
          candidates.map(f => absolutePath(tablePath, f.path)),
          candidates.map(_.partitionValues),
          sourceCol = Some("__graft_src"), posCol = Some("__graft_pos")),
        candidates)
      .filter(hit)
      .groupBy(col("__graft_src"))
      .agg(collect_list(col("__graft_pos")).as("__ps"))
      .collect()
      .map(r => Paths.get(r.getString(0)).normalize.toString -> r.getSeq[Long](1).toArray)
      .toMap
    val touched = candidates.filter(f =>
      newPositions.getOrElse(normPath(f), Array.empty[Long]).nonEmpty)
    if (touched.isEmpty) return (snap.version, 0L)
    val deleted = touched.map(f => newPositions(normPath(f)).length.toLong).sum

    // merged blob per touched file: previous DV ∪ new tombstones
    val blobs: Seq[(AddFile, Array[Byte], Long)] = touched.map { f =>
      val prev = f.dv.map(DeltaDeletionVectors.positions(tablePath, _))
        .getOrElse(Array.empty[Long])
      val all = (prev ++ newPositions(normPath(f))).distinct.sorted
      (f, DeltaDeletionVectors.serialize(all), all.length.toLong)
    }
    val big = blobs.filter(_._2.length > inlineMaxBytes)
    val bigDescriptors: Map[String, DeltaDeletionVectors.Descriptor] =
      if (big.isEmpty) Map.empty
      else big.map(_._1.path)
        .zip(DeltaDeletionVectors.writeDvFile(tablePath, big.map(b => (b._2, b._3))))
        .toMap
    val withDv: Seq[AddFile] = blobs.map { case (f, blob, card) =>
      val d = bigDescriptors.getOrElse(f.path,
        DeltaDeletionVectors.inlineDescriptor(blob, card))
      f.copy(dv = Some(d), modificationTime = System.currentTimeMillis())
    }
    // protocol action is idempotent (last one wins) — declaring the
    // table-features requirement with every DV commit keeps this path
    // stateless about what earlier commits declared
    val protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""
    val v = commitDml(spark, tablePath, snap, touched, withDv,
      System.currentTimeMillis(), "DELETE", Some(pred), Seq(protocolLine))
    (v, deleted)
  }

  /** Row-level UPDATE via copy-on-write: `set` maps column name →
    * replacement expression, applied where `pred` holds (NULL = row
    * kept unchanged, SQL UPDATE semantics). Partition columns may be
    * updated — rewritten rows land in their new partition directories.
    * Returns (committed version, rows updated). */
  def update(
      spark: SparkSession,
      tablePath: String,
      set: Map[String, Column],
      pred: Column): (Long, Long) = {
    require(set.nonEmpty, "update requires at least one column assignment")
    rewriteRows(spark, tablePath, pred, "UPDATE",
      (slice, hit) => {
        val bad = set.keySet -- slice.columns.toSet
        require(bad.isEmpty, s"no such columns: ${bad.mkString(", ")}")
        val fields = slice.schema.fields.map { f =>
          set.get(f.name) match {
            case Some(e) =>
              when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }
        slice.select(fields.toSeq: _*)
      })
  }

  /** MERGE INTO by equality key (the upsert shape every CDC / dedup
    * pipeline needs): source rows whose `key` matches a table row
    * replace that row; the rest insert. Copy-on-write — the source's
    * key range stats-prunes the candidate files, a distributed semi-join
    * finds the files actually containing matches, and only those
    * rewrite (unmatched old rows + updated matches + inserts land as new
    * files). The source must be key-unique (multiple matches per target
    * row is ambiguous — same contract as production Delta MERGE); the
    * TARGET may hold duplicate keys, and each duplicate row is updated
    * in place like production MERGE's WHEN MATCHED UPDATE. Returns
    * (version, rows updated, rows inserted). */
  def merge(
      spark: SparkSession,
      tablePath: String,
      source: DataFrame,
      key: String): (Long, Long, Long) = {
    val snap = snapshot(spark, tablePath)
    require(snap.schema.fieldNames.contains(key), s"no such key column: $key")
    PartitionedFiles.requireSameSchema(snap.schema, source.schema, s"delta merge into $tablePath")
    val src = source.persist()
    try {
      val dup = src.groupBy(col(key)).count().filter(col("count") > 1).limit(1).count()
      require(dup == 0, s"merge source has duplicate values of $key — ambiguous matches")

      // key-range narrowing: files outside [min(src.key), max(src.key)]
      // cannot contain a match
      val r = src.agg(min(col(key)).as("lo"), max(col(key)).as("hi")).collect()(0)
      val candidates =
        if (r.isNullAt(0)) Seq.empty[AddFile]
        else DeltaStats.prune(snap.files,
          col(key) >= lit(r.get(0)) && col(key) <= lit(r.get(1)),
          snap.schema, snap.partitionColumns)
      def normPath(f: AddFile): String =
        Paths.get(absolutePath(tablePath, f.path)).normalize.toString

      val matchedPerFile: Map[String, Long] =
        if (candidates.isEmpty) Map.empty
        else minusDvTombstones(spark, tablePath,
            PartitionedFiles.readWithPartitions(
              spark, snap.schema, snap.partitionColumns,
              candidates.map(f => absolutePath(tablePath, f.path)),
              candidates.map(_.partitionValues),
              sourceCol = Some("__graft_src"), posCol = Some("__graft_pos")),
            candidates)
          .join(src.select(col(key)), Seq(key), "left_semi")
          .groupBy(col("__graft_src")).count()
          .collect()
          .map(rw => Paths.get(rw.getString(0)).normalize.toString -> rw.getLong(1))
          .toMap
      val touched = candidates.filter(f => matchedPerFile.getOrElse(normPath(f), 0L) > 0L)
      val updated = matchedPerFile.valuesIterator.sum

      val now = System.currentTimeMillis()
      val ordered = snap.schema.fieldNames.map(col).toSeq
      val touchedRows =
        if (touched.isEmpty) None
        else Some(readSnapshot(spark, snap.copy(files = touched)))
      // number of src rows that found a match (src is key-unique, so this
      // is the distinct matched-key count); the rest insert. With
      // duplicate TARGET keys updated > matchedSrcRows — each duplicate
      // target row is updated in place, so inserted never goes negative.
      val matchedSrcRows = touchedRows.fold(0L)(tr =>
        tr.select(col(key)).join(src.select(col(key)), Seq(key), "left_semi")
          .agg(countDistinct(col(key))).collect()(0).getLong(0))
      val inserted = src.count() - matchedSrcRows

      // merge output for the rewritten region, reference MERGE semantics:
      // old rows that matched no source key survive; EACH matched target
      // row (including duplicates of the same key) is replaced by its
      // source row's values; source rows matching nothing insert once.
      val keepOld = touchedRows
        .map(_.join(src.select(col(key)), Seq(key), "left_anti"))
        .getOrElse(src.limit(0))
      val updatedRows = touchedRows
        .map(_.select(col(key)).join(src, Seq(key)))
        .getOrElse(src.limit(0))
      val insertRows = touchedRows
        .map(tr => src.join(tr.select(col(key)), Seq(key), "left_anti"))
        .getOrElse(src)
      val newData = keepOld.select(ordered: _*)
        .unionByName(updatedRows.select(ordered: _*))
        .unionByName(insertRows.select(ordered: _*))
      val staged = PartitionedFiles.stageAndMove(newData, tablePath, snap.partitionColumns)
      val statsByRel = DeltaStats.collect(spark, tablePath, staged, snap.dataSchema)
      val added = staged.map(f => AddFile(PartitionedFiles.percentEncodePath(f.relPath),
        f.partitionValues, f.sizeBytes, now, statsByRel.get(f.relPath)))
      // a concurrent append inside the source's key range would hold rows
      // this MERGE should have matched — conflict on retry (see commitDml)
      val mergePred =
        if (r.isNullAt(0)) None
        else Some(col(key) >= lit(r.get(0)) && col(key) <= lit(r.get(1)))
      val v = commitDml(spark, tablePath, snap, touched, added, now, "MERGE", mergePred)
      (v, updated, inserted)
    } finally { src.unpersist(); () }
  }

  private def rewriteRows(
      spark: SparkSession,
      tablePath: String,
      pred: Column,
      operation: String,
      rewrite: (DataFrame, Column) => DataFrame): (Long, Long) = {
    val snap = snapshot(spark, tablePath)
    val hit = coalesce(pred, lit(false))
    // phase 1: stats narrow to files that MIGHT contain matches
    val candidates = DeltaStats.prune(snap.files, pred, snap.schema, snap.partitionColumns)
    if (candidates.isEmpty) return (snap.version, 0L)
    def normPath(f: AddFile): String =
      Paths.get(absolutePath(tablePath, f.path)).normalize.toString
    // phase 2: one distributed pass counts matches per candidate file
    // (minus DV-tombstoned rows — a CoW DML on a DV table must neither
    // count nor resurrect already-deleted rows)
    val matches: Map[String, Long] = minusDvTombstones(spark, tablePath,
        PartitionedFiles.readWithPartitions(
          spark, snap.schema, snap.partitionColumns,
          candidates.map(f => absolutePath(tablePath, f.path)),
          candidates.map(_.partitionValues),
          sourceCol = Some("__graft_src"), posCol = Some("__graft_pos")),
        candidates)
      .groupBy(col("__graft_src"))
      .agg(sum(when(hit, 1L).otherwise(0L)).as("__m"))
      .collect()
      .map(r => Paths.get(r.getString(0)).normalize.toString -> r.getLong(1))
      .toMap
    val touched = candidates.filter(f => matches.getOrElse(normPath(f), 0L) > 0L)
    val changed = matches.valuesIterator.sum
    if (touched.isEmpty) return (snap.version, 0L)
    // phase 3: rewrite ONLY the touched files
    val now = System.currentTimeMillis()
    val slice = readSnapshot(spark, snap.copy(files = touched))
    val staged = PartitionedFiles.stageAndMove(
      rewrite(slice, hit), tablePath, snap.partitionColumns)
    val statsByRel = DeltaStats.collect(spark, tablePath, staged, snap.dataSchema)
    val added = staged.map(f => AddFile(PartitionedFiles.percentEncodePath(f.relPath),
      f.partitionValues, f.sizeBytes, now, statsByRel.get(f.relPath)))

    val v = commitDml(spark, tablePath, snap, touched, added, now, operation, Some(pred))
    (v, changed)
  }

  /** dataChange=true removes + adds commit with version-race retry; a
    * concurrent commit that removed any rewritten file makes the DML
    * non-serializable → refuse (delete the staged outputs, throw). */
  /** Serializability check for a DML retrying after a version race.
    * Conflict when (1) any file this DML rewrites is no longer live (a
    * concurrent rewrite of the same rows won), or (2) a concurrent commit
    * ADDED files that could contain rows matching the DML predicate —
    * this DML never saw those rows, so committing over them is not
    * serializable (delta-spark's ConcurrentAppendException). Stats-prune
    * is conservative: a new file without stats counts as a possible
    * match; `pred = None` treats ANY concurrent add as a conflict. */
  private[graft] def dmlConflict(
      start: Snapshot,
      latest: Snapshot,
      removed: Seq[AddFile],
      pred: Option[Column]): Boolean = {
    // identity is (path, deletionVector): a concurrent MoR delete re-adds
    // the same path with a new DV — committing a rewrite built against
    // the old DV would silently resurrect its tombstoned rows
    val stillLive = latest.files.map(f => f.path -> f.dv).toMap
    if (!removed.forall(f => stillLive.get(f.path).contains(f.dv))) return true
    val startPaths = start.files.map(_.path).toSet
    val newlyAdded = latest.files.filterNot(f => startPaths.contains(f.path))
    pred match {
      case _ if newlyAdded.isEmpty => false
      case Some(p) => DeltaStats.prune(
        newlyAdded, p, latest.schema, latest.partitionColumns).nonEmpty
      case None => true
    }
  }

  private def commitDml(
      spark: SparkSession,
      tablePath: String,
      start: Snapshot,
      removed: Seq[AddFile],
      added: Seq[AddFile],
      now: Long,
      operation: String,
      pred: Option[Column],
      headLines: Seq[String] = Nil): Long = {
    val om = mapper
    val lines = mutable.ArrayBuffer.empty[String]
    lines ++= headLines
    removed.foreach { f =>
      val o = om.createObjectNode()
      val r = o.putObject("remove")
      r.put("path", f.path); r.put("deletionTimestamp", now); r.put("dataChange", true)
      lines += om.writeValueAsString(o)
    }
    added.foreach(a => lines += addJson(om, a, dataChange = true))
    val ci = om.createObjectNode()
    val info = ci.putObject("commitInfo")
    info.put("timestamp", now); info.put("operation", operation)
    lines += om.writeValueAsString(ci)

    var attempt = start.version + 1
    var committed = -1L
    while (committed < 0) {
      val tmp = logDir(tablePath).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      try { AtomicClaim.publish(tmp, commitFile(tablePath, attempt)); committed = attempt }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp)
        val latest = snapshot(spark, tablePath)
        if (dmlConflict(start, latest, removed, pred)) {
          added.foreach(a =>
            Files.deleteIfExists(Paths.get(absolutePath(tablePath, a.path))))
          throw new IllegalStateException(
            s"$operation conflicts with a concurrent commit on $tablePath — retry the operation")
        }
        attempt = latest.version + 1
      }
    }
    committed
  }

  /** Physically delete data files no longer referenced by the CURRENT
    * snapshot (the VACUUM operation). Time travel to versions whose
    * files were vacuumed stops working — that is vacuum's documented
    * contract. `retainMillis` (default 7 days, like production Delta)
    * protects files an in-flight writer has landed but not yet
    * committed: only unreferenced files OLDER than the window are
    * deleted, and active `.staging-*` dirs are never touched. Returns
    * the number of files deleted. */
  def vacuum(spark: SparkSession, tablePath: String,
      retainMillis: Long = 7L * 24 * 3600 * 1000): Int = {
    val snap = snapshot(spark, tablePath)
    // live = data files plus their deletion-vector .bin files — a DV
    // referenced by a live add must survive, an orphaned DV (its file was
    // rewritten) is vacuumable garbage like the data file itself
    val live: Set[String] = (snap.files
      .map(f => absolutePath(tablePath, f.path)) ++
      snap.files.flatMap(_.dv).filter(d => d.storageType == "u" || d.storageType == "p")
        .map(d => DeltaDeletionVectors.absolutePath(tablePath, d)))
      .map(p => Paths.get(p).normalize.toString).toSet
    val root = Paths.get(tablePath)
    val cutoff = System.currentTimeMillis() - math.max(retainMillis, 0L)
    var deleted = 0
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && {
        val n = p.getFileName.toString
        n.endsWith(".parquet") || n.endsWith(".bin")
      })
      .filterNot(_.startsWith(root.resolve("_delta_log")))
      .filterNot(p => p.iterator().asScala.exists(_.toString.startsWith(".staging-")))
      .filterNot(p => live.contains(p.normalize.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach { p => Files.delete(p); deleted += 1 }
    deleted
  }

  /** Write a parquet checkpoint of the current state plus the
    * `_last_checkpoint` hint, so future reads replay only commits after
    * it (spec §checkpoints, single-file classic form).
    *
    * The add rows flow DataFrame→parquet without ever materializing on
    * the driver: checkpointing a table that already has a (possibly
    * huge) checkpoint unions the previous checkpoint's distributed add
    * set with the small driver-side JSON tail — same O(tail) driver
    * posture as [[state]]. */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    val st = state(spark, tablePath)
    val pvType = MapType(StringType, StringType)
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", pvType),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", dvStructType)))
    val ckSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", addType),
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType))))))

    // driver-side rows: protocol + metaData + txns + the JSON-tail adds.
    // A table using DVs keeps its table-features protocol through the
    // checkpoint — downgrading to (1,2) would hide the requirement from
    // feature-checking readers.
    val usesDv = st.tailAdds.exists(_.dv.isDefined) ||
      st.ckptAdds.exists(df => !df.filter(col("deletionVector").isNotNull).isEmpty)
    val protocolRow =
      if (usesDv) Row(3, 7, Seq("deletionVectors"), Seq("deletionVectors"))
      else Row(1, 2, null, null)
    val headRows: Seq[Row] =
      Row(protocolRow, null, null, null) +:
      Row(null, Row(UUID.randomUUID().toString, st.schema.json, st.partitionColumns,
        System.currentTimeMillis()), null, null) +:
      (st.tailAdds.map { f =>
        val dvRow = f.dv.map(d =>
          Row(d.storageType, d.pathOrInlineDv, d.offset.map(Int.box).orNull,
            d.sizeInBytes, d.cardinality)).orNull
        Row(null, null,
          Row(f.path, f.partitionValues, f.size, f.modificationTime, true, f.stats.orNull, dvRow),
          null)
      } ++
       st.appTxns.toSeq.map { case (app, v) => Row(null, null, null, Row(app, v)) })
    val head = spark.createDataFrame(
      spark.sparkContext.parallelize(headRows, 1), ckSchema)
    // distributed rows: the previous checkpoint's surviving adds
    val ck = st.ckptAdds match {
      case Some(adds) =>
        val wrapped = adds.select(
          lit(null).cast(ckSchema("protocol").dataType).as("protocol"),
          lit(null).cast(ckSchema("metaData").dataType).as("metaData"),
          struct(col("path"), col("partitionValues"), col("size"),
            col("modificationTime"), lit(true).as("dataChange"), col("stats"),
            col("deletionVector")).as("add"),
          lit(null).cast(ckSchema("txn").dataType).as("txn"))
        head.unionByName(wrapped)
      case None => head
    }
    val scratch = Paths.get(tablePath, s".ckpt-${UUID.randomUUID()}")
    ck.coalesce(1).write.parquet(scratch.toString)
    val part = Files.walk(scratch).iterator().asScala
      .find(p => p.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, checkpointFile(tablePath, st.version), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(scratch)
    val nRows = spark.read.parquet(checkpointFile(tablePath, st.version).toString).count()
    val hint = s"""{"version":${st.version},"size":$nRows}"""
    Files.write(logDir(tablePath).resolve("_last_checkpoint"), hint.getBytes(StandardCharsets.UTF_8))
    st.version
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))

  private[graft] def deleteTable(tablePath: String): Unit =
    deleteRecursively(Paths.get(tablePath))
}
