package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Delta, DeltaStats}

/** File-level data skipping over Delta `add.stats`: collection on write,
  * conservative pruning per predicate shape, cross-writer timestamp
  * formats, float binary-vs-decimal domains, narrowing casts, NaN stats,
  * z-order clustering, and a randomized never-drop-a-matching-file
  * property against a brute-force oracle. */
class DeltaStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_deltastats_spec_$tag"
    Delta.deleteTable(p)
    p
  }

  test("writes attach spec-shaped stats; range-clustered files are skipped") {
    val path = freshDir("attach")
    val df = (0 until 400).map(i => (i.toLong, s"s_$i", i * 0.5))
      .toDF("id", "name", "score")
      .repartitionByRange(4, col("id"))
    Delta.write(df, path)
    val snap = Delta.snapshot(spark, path)
    assert(snap.files.size == 4)
    assert(snap.files.forall(_.stats.isDefined), "every add must carry stats")
    val st = DeltaStats.parseStats(snap.files.head.stats.get, snap.schema)
    assert(st.numRecords.contains(100L))
    assert(st.min.keySet == Set("id", "name", "score"))

    val opened = Delta.filesForScan(spark, path, col("id") === 5L)
    assert(opened.size == 1, s"point probe should open 1 of 4 files, opened ${opened.size}")
    // results identical with and without skipping
    val viaSkip = Delta.read(spark, path, dataFilter = Some(col("id") === 5L))
    assert(viaSkip.select("name").as[String].collect().toSeq == Seq("s_5"))
  }

  test("each supported predicate shape skips without changing results") {
    val path = freshDir("shapes")
    val df = (0 until 300).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"k_${i % 50}%03d", i * 1.5, i % 3 == 0)
    }.toDF("id", "name", "score", "flag").repartitionByRange(3, col("id"))
    Delta.write(df, path)
    val full = Delta.read(spark, path).cache()
    val total = Delta.snapshot(spark, path).files.size

    val preds: Seq[Column] = Seq(
      col("id") === 250L, col("id") < 100L, col("id") <= 99L, col("id") > 250L,
      col("id") >= 200L, col("id").isin(5L, 105L, 205L),
      col("name").isNull, col("name").isNotNull,
      col("name").startsWith("k_0"), col("score") > 300.0,
      col("id") < 100L && col("score") > 30.0, col("id") < 100L || col("id") > 280L,
      !col("id").between(50L, 260L), col("flag") === true)
    preds.foreach { p =>
      val pruned = Delta.filesForScan(spark, path, p)
      assert(pruned.size <= total)
      val got = Delta.read(spark, path, dataFilter = Some(p))
        .select("id").as[Long].collect().sorted.toSeq
      val want = full.filter(p).select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"skipping changed results for $p")
    }
    // and at least the range shapes actually skip something
    assert(Delta.filesForScan(spark, path, col("id") === 250L).size == 1)
    assert(Delta.filesForScan(spark, path, col("id") < 100L).size == 1)
    full.unpersist()
  }

  test("files with no stats, partial stats, or unknown predicates are kept") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val noStats = Delta.AddFile("f1", Map.empty, 1L, 0L, None)
    val partial = Delta.AddFile("f2", Map.empty, 1L, 0L,
      Some("""{"numRecords":10,"minValues":{"a":5},"maxValues":{"a":9},"nullCount":{"a":0}}"""))
    val files = Seq(noStats, partial)
    // no stats → kept; stats present but predicate over un-statted column → kept
    assert(DeltaStats.prune(files, col("a") === 7L, schema, Nil).map(_.path) == Seq("f1", "f2"))
    assert(DeltaStats.prune(files, col("b") === "x", schema, Nil).map(_.path) == Seq("f1", "f2"))
    // stats present and provably disjoint → only the stats-less file stays
    assert(DeltaStats.prune(files, col("a") === 3L, schema, Nil).map(_.path) == Seq("f1"))
    // unsupported leaf (arithmetic) → conservative keep
    assert(DeltaStats.prune(files, col("a") + lit(1L) === 4L, schema, Nil).size == 2)
  }

  test("partition values prune with typed comparison, including timestamps") {
    val schema = StructType(Seq(
      StructField("p", IntegerType), StructField("ts", TimestampType), StructField("v", LongType)))
    val f = Delta.AddFile("f", Map("p" -> "10", "ts" -> "2024-03-01 12:00:00"), 1L, 0L, None)
    assert(DeltaStats.prune(Seq(f), col("p") === 10, schema, Seq("p", "ts")).size == 1)
    assert(DeltaStats.prune(Seq(f), col("p") === 9, schema, Seq("p", "ts")).isEmpty)
    assert(DeltaStats.prune(Seq(f), col("p") > 2, schema, Seq("p", "ts")).size == 1)
    val lit1 = lit(java.sql.Timestamp.valueOf("2024-03-01 12:00:00"))
    val lit2 = lit(java.sql.Timestamp.valueOf("2024-03-01 12:00:01"))
    assert(DeltaStats.prune(Seq(f), col("ts") === lit1, schema, Seq("p", "ts")).size == 1)
    assert(DeltaStats.prune(Seq(f), col("ts") === lit2, schema, Seq("p", "ts")).isEmpty)
  }

  test("timestamp stats parse in both writer formats (space-UTC and ISO-T-offset)") {
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    def fileWith(min: String, max: String) = Delta.AddFile("f", Map.empty, 1L, 0L, Some(
      s"""{"numRecords":5,"minValues":{"ts":"$min"},"maxValues":{"ts":"$max"},"nullCount":{"ts":0}}"""))
    val ours = fileWith("2024-03-01 00:00:00.000000", "2024-03-02 00:00:00.000000")
    val sparkFmt = fileWith("2024-03-01T01:00:00.000+01:00", "2024-03-01T19:00:00.000-05:00")
    val probeIn = lit(java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:00:00Z")))
    val probeOut = lit(java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T00:00:00Z")))
    for (f <- Seq(ours, sparkFmt)) {
      assert(DeltaStats.prune(Seq(f), col("ts") <= probeIn, schema, Nil).size == 1)
      assert(DeltaStats.prune(Seq(f), col("ts") === probeOut, schema, Nil).isEmpty)
    }
    // unparseable → keep
    val garbage = fileWith("not-a-time", "also-no")
    assert(DeltaStats.prune(Seq(garbage), col("ts") === probeOut, schema, Nil).size == 1)
  }

  test("NaN/Infinity stats never prune; finite stats on the same column do") {
    val schema = StructType(Seq(StructField("d", DoubleType)))
    val nanFile = Delta.AddFile("f", Map.empty, 1L, 0L, Some(
      """{"numRecords":3,"minValues":{"d":"-Infinity"},"maxValues":{"d":"NaN"},"nullCount":{"d":0}}"""))
    // a min of "-Infinity" must NOT decode as 0 and prune d < -100
    assert(DeltaStats.prune(Seq(nanFile), col("d") < -100.0, schema, Nil).size == 1)
    val finite = Delta.AddFile("g", Map.empty, 1L, 0L, Some(
      """{"numRecords":3,"minValues":{"d":1.5},"maxValues":{"d":2.5},"nullCount":{"d":0}}"""))
    assert(DeltaStats.prune(Seq(finite), col("d") < -100.0, schema, Nil).isEmpty)
  }

  test("float stats compare in the binary domain: equality on a stored value survives") {
    val path = freshDir("float")
    Delta.write(Seq(0.1f, 0.2f, 0.3f).toDF("f"), path)
    // 0.1f widens to 0.100000001490…; decimal-text comparison would prune it
    assert(Delta.filesForScan(spark, path, col("f") === 0.1f).nonEmpty)
    assert(Delta.read(spark, path, dataFilter = Some(col("f") === 0.1f)).count() == 1)
    // and a genuinely out-of-range probe still prunes
    assert(Delta.filesForScan(spark, path, col("f") > 1.0f).isEmpty)
  }

  test("float stats in float-shortest-decimal text (delta-spark form) are not mis-pruned") {
    val schema = StructType(Seq(StructField("f", FloatType)))
    // delta-spark serializes a float stat as the FLOAT's shortest decimal
    // ("0.3"), which parses as a double strictly below 0.3f — rounding
    // through the float domain must recover the exact stored value
    val f = Delta.AddFile("f", Map.empty, 1L, 0L, Some(
      """{"numRecords":2,"minValues":{"f":0.3},"maxValues":{"f":0.3},"nullCount":{"f":0}}"""))
    assert(DeltaStats.prune(Seq(f), col("f") === 0.3f, schema, Nil).size == 1)
    assert(DeltaStats.prune(Seq(f), col("f") > 0.2f, schema, Nil).size == 1)
    assert(DeltaStats.prune(Seq(f), col("f") > 0.4f, schema, Nil).isEmpty)
  }

  test("narrowing casts are not looked through; up-casts are") {
    val schema = StructType(Seq(StructField("d", DoubleType), StructField("i", IntegerType)))
    val f = Delta.AddFile("f", Map.empty, 1L, 0L, Some(
      """{"numRecords":2,"minValues":{"d":5.4,"i":10},"maxValues":{"d":5.6,"i":20},"nullCount":{"d":0,"i":0}}"""))
    // cast(d as int) = 5 matches d ∈ [5.0, 6.0) — [5.4, 5.6] may contain matches
    assert(DeltaStats.prune(Seq(f), col("d").cast("int") === 5, schema, Nil).size == 1)
    // up-cast int→long is order- and value-preserving → prune applies
    assert(DeltaStats.prune(Seq(f), col("i").cast("long") === 5L, schema, Nil).isEmpty)
    assert(DeltaStats.prune(Seq(f), col("i").cast("long") === 15L, schema, Nil).size == 1)
  }

  test("property: pruning never drops a file containing a matching row") {
    val rnd = new scala.util.Random(42)
    val path = freshDir("prop")
    val rows = (0 until 600).map { i =>
      val id: java.lang.Long = if (rnd.nextInt(20) == 0) null else rnd.nextLong() % 1000L
      val s: String = if (rnd.nextInt(10) == 0) null else s"w${rnd.nextInt(30)}"
      val d: java.lang.Double = rnd.nextInt(25) match {
        case 0 => null
        case 1 => Double.NaN
        case 2 => Double.PositiveInfinity
        case _ => rnd.nextDouble() * 200 - 100
      }
      Row(id, s, d)
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType), StructField("d", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .repartition(6) // random-ish splits: files overlap in every column
    Delta.write(df, path)

    val withFile = Delta.read(spark, path)
      .withColumn("__f", col("_metadata.file_path")).cache()
    def litL() = lit(rnd.nextLong() % 1000L)
    def litD() = lit(rnd.nextDouble() * 200 - 100)
    def leaf(): Column = rnd.nextInt(9) match {
      case 0 => col("id") === litL()
      case 1 => col("id") < litL()
      case 2 => col("id") >= litL()
      case 3 => col("d") < litD()
      case 4 => col("d") > litD()
      case 5 => col("s") === s"w${rnd.nextInt(30)}"
      case 6 => col("s").startsWith("w1")
      case 7 => col("id").isNull
      case 8 => col("d").isNotNull
    }
    def pred(depth: Int): Column =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => pred(depth - 1) && pred(depth - 1)
        case 1 => pred(depth - 1) || pred(depth - 1)
        case 2 => !pred(depth - 1)
      }
    (0 until 40).foreach { i =>
      val p = pred(rnd.nextInt(3))
      val kept = Delta.filesForScan(spark, path, p)
        .map(f => Paths.get(path, f.path).toRealPath().toString).toSet
      val matching = withFile.filter(p).select("__f").distinct().as[String].collect()
        .map(u => Paths.get(new java.net.URI(u).getPath).toRealPath().toString)
      val dropped = matching.filterNot(kept)
      assert(dropped.isEmpty,
        s"iteration $i: predicate $p matched rows in pruned-away files: ${dropped.mkString(",")}")
    }
    withFile.unpersist()
  }

  test("optimizeZorder clusters both dimensions; point probes open a fraction of files") {
    val path = freshDir("zorder")
    val rnd = new scala.util.Random(7)
    // shuffled grid: every pre-zorder file spans the full range of both dims
    val df = rnd.shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x, y))))
      .toDF("x", "y").repartition(16)
    Delta.write(df, path)
    val before = Delta.filesForScan(spark, path, col("x") === 13).size
    assert(before == 16, "pre-zorder, a point probe must open every file")

    val total = Delta.snapshot(spark, path).files.map(_.size).sum
    Delta.optimizeZorder(spark, path, Seq("x", "y"), targetFileBytes = total / 16)
    val files = Delta.snapshot(spark, path).files.size
    assert(files >= 8, s"expected a multi-file layout after zorder, got $files")
    val xOpen = Delta.filesForScan(spark, path, col("x") === 13).size
    val yOpen = Delta.filesForScan(spark, path, col("y") === 44).size
    assert(xOpen <= files / 2, s"x probe opened $xOpen of $files")
    assert(yOpen <= files / 2, s"y probe opened $yOpen of $files")
    // rewrite is lossless and time travel still works
    assert(Delta.read(spark, path).count() == 64 * 64)
    assert(Delta.read(spark, path,
      dataFilter = Some(col("x") === 13 && col("y") === 44)).count() == 1)
  }

  test("50k-file checkpoint reconciles distributed; driver collects only survivors") {
    val path = freshDir("bigckpt")
    // seed a real table so metaData/protocol exist, then checkpoint
    Delta.write(Seq((0L, "seed")).toDF("id", "tag"), path)
    Delta.checkpoint(spark, path)
    // graft a synthetic 50k-file checkpoint over it: per-file stats give
    // each file a distinct [id, id] box — planning metadata only, no data
    val n = 50000
    val schema = Delta.snapshot(spark, path).schema
    val addType = StructType(Seq(
      StructField("path", StringType), StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType), StructField("stats", StringType)))
    val ckSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType), StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType), StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)), StructField("createdTime", LongType)))),
      StructField("add", addType)))
    val meta = Row(null, Row("synthetic", schema.json, Seq.empty[String], 0L), null)
    val proto = Row(Row(1, 2), null, null)
    val adds = (0 until n).map { i =>
      val stats = s"""{"numRecords":1,"minValues":{"id":$i},"maxValues":{"id":$i},"nullCount":{"id":0}}"""
      Row(null, null, Row(f"part-$i%06d.parquet", Map.empty[String, String], 10L, 0L, true, stats))
    }
    val ck = spark.createDataFrame(
      spark.sparkContext.parallelize(proto +: meta +: adds, 4), ckSchema)
    val ckPath = Paths.get(path, "_delta_log", f"${2L}%020d.checkpoint.parquet")
    val scratch = Paths.get(path, ".ck-scratch")
    ck.coalesce(1).write.parquet(scratch.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.walk(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(ckPath.getParent)
    Files.move(part, ckPath)
    Files.write(Paths.get(path, "_delta_log", "_last_checkpoint"),
      s"""{"version":2,"size":${n + 2}}""".getBytes("UTF-8"))
    // fabricated version-2 state → versions 0/1 JSON need not be replayed,
    // but latestVersion must see v2: the checkpoint file itself counts

    val st = Delta.state(spark, path)
    assert(st.version == 2 && st.tailAdds.isEmpty && st.ckptAdds.isDefined,
      "post-checkpoint state must keep the add set distributed")
    val hit = Delta.filesForScan(spark, path, col("id") === 31337L)
    assert(hit.map(_.path) == Seq("part-031337.parquet"),
      s"stats pruning over the distributed checkpoint must isolate one file, got ${hit.size}")
  }
}
