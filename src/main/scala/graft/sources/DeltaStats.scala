package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Per-file column statistics + data skipping for [[Delta]] — the spec's
  * `add.stats` JSON (`numRecords` / `minValues` / `maxValues` /
  * `nullCount`, delta.io PROTOCOL.md §Per-file Statistics; ref surface
  * `daft/io/_delta_lake.py` relies on the same stats for its scan
  * pruning).
  *
  * Scale shape: this is THE mechanism that makes a 100 TB Delta table
  * queryable — partition pruning cuts whole directories, but file-level
  * min/max skipping cuts inside a partition, so a point/range query over
  * a clustered column opens dozens of files instead of tens of
  * thousands. Stats are collected in ONE distributed pass over the
  * just-written files (grouped by `_metadata.file_path` — no per-file
  * jobs), and pruning is driver-side interval arithmetic over the log's
  * metadata, exactly where production Delta does it (the planner already
  * owns the file list).
  *
  * Pruning is conservative: a file is dropped only when the predicate is
  * provably false for every row given the file's min/max/nullCount;
  * anything unrecognized keeps the file. Supported leaves: =, <, <=, >,
  * >=, <=> , IN, IS NULL, IS NOT NULL, STARTSWITH, under AND/OR/NOT, on
  * numeric / string / boolean / date / timestamp columns (including
  * partition columns, whose min = max = the partition value).
  */
private[graft] object DeltaStats {

  private def mapper = new ObjectMapper()

  /** Column types whose min/max participate in skipping. */
  def skippable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  // ------------------------------------------------------------ collection

  /** Raw per-file aggregates from ONE distributed pass: relPath →
    * (numRecords, per-column (field, min, max, nullCount)) with min/max as
    * plain JVM values. Shared by the Delta stats-JSON writer and the
    * Iceberg manifest-bounds writer. */
  final case class RawFileStats(numRecords: Long, cols: Seq[(StructField, Any, Any, Long)])

  def collectRaw(
      spark: SparkSession,
      tableRoot: String,
      files: Seq[PartitionedFiles.StagedFile],
      dataSchema: StructType): Map[String, RawFileStats] = {
    if (files.isEmpty) return Map.empty
    val statCols = dataSchema.fields.filter(f => skippable(f.dataType)).toSeq
    val root = java.nio.file.Paths.get(tableRoot).normalize
    val paths = files.map(f => root.resolve(f.relPath).toString)

    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
      statCols.flatMap { f =>
        Seq(
          min(col(f.name)).as(s"__min_${f.name}"),
          max(col(f.name)).as(s"__max_${f.name}"),
          sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nc_${f.name}"))
      }
    val perFile = spark.read.schema(dataSchema).parquet(paths: _*)
      .groupBy(col("_metadata.file_path").as("__p"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()

    perFile.map { row =>
      val abs = PartitionedFiles.percentDecode(
        row.getString(0).replaceFirst("^file:(//)?", ""))
      val rel = root.relativize(java.nio.file.Paths.get(abs).normalize).toString
      val cols = statCols.map { f =>
        (f,
          row.get(row.fieldIndex(s"__min_${f.name}")),
          row.get(row.fieldIndex(s"__max_${f.name}")),
          row.getLong(row.fieldIndex(s"__nc_${f.name}")))
      }
      rel -> RawFileStats(row.getLong(row.fieldIndex("__n")), cols)
    }.toMap
  }

  /** One distributed pass computing per-file stats for every staged file;
    * returns relPath -> stats JSON (the Delta add.stats form). `dataSchema`
    * is the table schema minus partition columns (what the files actually
    * contain). */
  def collect(
      spark: SparkSession,
      tableRoot: String,
      files: Seq[PartitionedFiles.StagedFile],
      dataSchema: StructType): Map[String, String] =
    collectRaw(spark, tableRoot, files, dataSchema).map { case (rel, raw) =>
      val om = mapper
      val o = om.createObjectNode()
      o.put("numRecords", raw.numRecords)
      val mins = o.putObject("minValues")
      val maxs = o.putObject("maxValues")
      val ncs = o.putObject("nullCount")
      raw.cols.foreach { case (f, mi, ma, nc) =>
        def putVal(node: com.fasterxml.jackson.databind.node.ObjectNode, v: Any): Unit = v match {
          case null => ()
          case b: Boolean => node.put(f.name, b)
          case b: Byte => node.put(f.name, b.toLong)
          case s: Short => node.put(f.name, s.toLong)
          case i: Int => node.put(f.name, i.toLong)
          case l: Long => node.put(f.name, l)
          case fl: Float => node.put(f.name, fl.toDouble)
          case d: Double => node.put(f.name, d)
          case d: java.math.BigDecimal => node.put(f.name, d)
          case d: java.sql.Date => node.put(f.name, d.toString)
          case t: java.sql.Timestamp => node.put(f.name, tsFmt.format(t.toInstant))
          case s: String => node.put(f.name, s)
          case other => node.put(f.name, other.toString)
        }
        putVal(mins, mi); putVal(maxs, ma)
        ncs.put(f.name, nc)
      }
      rel -> om.writeValueAsString(o)
    }

  // --------------------------------------------------------------- pruning

  /** Parsed per-file stats in a comparable domain: numerics as
    * BigDecimal, everything else as its lexicographically-ordered string
    * form (ISO dates/timestamps sort correctly as text). */
  final case class FileStat(
      numRecords: Option[Long],
      min: Map[String, Any],
      max: Map[String, Any],
      nullCount: Map[String, Long])

  /** Epoch-micros for a stats/partition timestamp string. Writers differ:
    * this engine emits `uuuu-MM-dd HH:mm:ss.SSSSSS` UTC, delta-spark emits
    * ISO-8601 with a `T` separator and a zone offset — lexicographic
    * comparison across the two formats is unsound, so everything is
    * normalized to epoch-micros. None = unparseable → caller keeps the
    * file (conservative). */
  private[sources] def tsMicros(s: String): Option[Long] = {
    val t = s.trim.replace(' ', 'T')
    def micros(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), (i.getNano / 1000).toLong)
    try Some(micros(java.time.OffsetDateTime.parse(t).toInstant))
    catch {
      case _: Exception =>
        try Some(micros(java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)))
        catch { case _: Exception => None }
    }
  }

  /** None = stat unusable for this type (e.g. NaN/Infinity serialized as a
    * quoted string, unparseable timestamp) → treat as absent, keep file.
    *
    * Float/double stats go through the BINARY value (round the JSON text
    * to the nearest double, then expand exactly): the stat text "0.1" is
    * shortest-decimal for the stored binary 0.1000000000000000055…, and
    * comparing the decimal text against an exact binary literal would
    * wrongly prune equality probes on the stored value. */
  private def parseDomain(node: JsonNode, dt: DataType): Option[Any] = dt match {
    case FloatType =>
      // round the text to the nearest FLOAT first: a float stat serialized
      // as float-shortest-decimal (delta-spark) parses as a double strictly
      // below the true float value, which would tighten the interval and
      // wrongly prune; parseFloat→widen recovers the exact binary float
      // for both float-shortest and double-widened writer forms
      if (!node.isNumber) None
      else {
        val f = java.lang.Float.parseFloat(node.asText)
        if (java.lang.Float.isFinite(f)) Some(new java.math.BigDecimal(f.toDouble): java.math.BigDecimal)
        else None
      }
    case DoubleType =>
      if (!node.isNumber) None
      else {
        val d = node.asDouble
        if (java.lang.Double.isFinite(d)) Some(new java.math.BigDecimal(d): java.math.BigDecimal)
        else None
      }
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
      if (node.isNumber) Some(node.decimalValue(): java.math.BigDecimal) else None
    case BooleanType => Some(if (node.asBoolean) "true" else "false")
    case TimestampType =>
      tsMicros(node.asText).map(m => new java.math.BigDecimal(m): java.math.BigDecimal)
    case _ => Some(node.asText)
  }

  def parseStats(json: String, schema: StructType): FileStat = {
    val byName = schema.map(f => f.name -> f.dataType).toMap
    val node = mapper.readTree(json)
    def vals(field: String): Map[String, Any] =
      Option(node.get(field)).map { o =>
        o.properties().asScala.flatMap { e =>
          for {
            dt <- byName.get(e.getKey)
            v <- parseDomain(e.getValue, dt)
          } yield e.getKey -> v
        }.toMap
      }.getOrElse(Map.empty)
    val ncs = Option(node.get("nullCount")).map { o =>
      o.properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
    }.getOrElse(Map.empty[String, Long])
    FileStat(Option(node.get("numRecords")).map(_.asLong), vals("minValues"), vals("maxValues"), ncs)
  }

  /** Convert a predicate literal into the same comparable domain as
    * [[parseDomain]]; None = unsupported, caller keeps the file. */
  private def litDomain(value: Any, dt: DataType): Option[Any] = (value, dt) match {
    case (null, _) => None
    // exact binary value, matching parseDomain's float/double domain;
    // a Float literal widens exactly via doubleValue
    case (n: Number, FloatType | DoubleType) =>
      val d = n.doubleValue
      if (java.lang.Double.isFinite(d)) Some(new java.math.BigDecimal(d)) else None
    case (n: Number, ByteType | ShortType | IntegerType | LongType | _: DecimalType) =>
      Some(new java.math.BigDecimal(n.toString))
    case (d: Decimal, _: DecimalType) => Some(d.toJavaBigDecimal)
    case (s, StringType) => Some(s.toString) // UTF8String or String
    case (b: Boolean, BooleanType) => Some(if (b) "true" else "false")
    // Catalyst internal forms: DateType = days since epoch, TimestampType = micros
    case (days: Integer, DateType) => Some(java.time.LocalDate.ofEpochDay(days.toLong).toString)
    case (micros: java.lang.Long, TimestampType) =>
      Some(new java.math.BigDecimal(micros.longValue))
    case _ => None
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => 0
  }

  /** Per-file view merging data-column stats with partition values (for
    * which min = max = the value and nullCount is all-or-nothing). */
  private final class FileView(
      stat: Option[FileStat],
      pv: Map[String, String],
      schema: StructType,
      partCols: Set[String]) {
    private val byName = schema.map(f => f.name -> f.dataType).toMap
    private def pvDomain(c: String): Option[Any] =
      pv.get(c).filter(_ != null).flatMap { s =>
        byName.get(c).flatMap {
          case FloatType =>
            try Some(new java.math.BigDecimal(java.lang.Float.parseFloat(s).toDouble))
            catch { case _: NumberFormatException => None }
          case DoubleType =>
            try Some(new java.math.BigDecimal(java.lang.Double.parseDouble(s)))
            catch { case _: NumberFormatException => None }
          case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
            try Some(new java.math.BigDecimal(s)) catch { case _: NumberFormatException => None }
          case TimestampType => tsMicros(s).map(m => new java.math.BigDecimal(m))
          case _ => Some(s)
        }
      }
    def minOf(c: String): Option[Any] =
      if (partCols(c)) pvDomain(c) else stat.flatMap(_.min.get(c))
    def maxOf(c: String): Option[Any] =
      if (partCols(c)) pvDomain(c) else stat.flatMap(_.max.get(c))
    def nullCountOf(c: String): Option[Long] =
      if (partCols(c))
        numRecords.map(n => if (pv.get(c).contains(null) || pv.get(c).isEmpty) n else 0L)
      else stat.flatMap(_.nullCount.get(c))
    def numRecords: Option[Long] = stat.flatMap(_.numRecords)
    /** True when stats prove the column has at least one non-null row. */
    def definitelyAllNull(c: String): Boolean =
      (for (n <- numRecords; nc <- nullCountOf(c)) yield nc >= n).getOrElse(false)
  }

  /** Attribute behind `e`, looking through up-casts only: a narrowing
    * cast (e.g. double→int) changes which values satisfy a predicate —
    * `cast(d as int) = 5` matches d∈[5.0,6.0) — so min/max reasoning in
    * the child's domain would wrongly drop files. `dts` supplies the
    * source column type (the expression tree may be unresolved). */
  private def nameOf(e: Expression, dts: Map[String, DataType]): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case c: Cast =>
      nameOf(c.child, dts).filter { n =>
        dts.get(n).exists(src => src == c.dataType || Cast.canUpCast(src, c.dataType))
      }
    case _ => None
  }

  /** Could any row of the file match `pred`? Conservative tri-state
    * collapsed to Boolean (unknown = true = keep). */
  private def mightMatch(pred: Expression, f: FileView, dts: Map[String, DataType]): Boolean = {
    def rangeOverlaps(c: String, v: Any, op: (Int, Int) => Boolean): Boolean = {
      if (f.definitelyAllNull(c)) return false
      (f.minOf(c), f.maxOf(c)) match {
        case (Some(mi), Some(ma)) => op(cmp(mi, v), cmp(ma, v))
        case _ => true
      }
    }
    def litOf(c: String, l: Literal): Option[Any] =
      dts.get(c).flatMap(dt => litDomain(l.value, dt))

    pred match {
      case And(a, b) => mightMatch(a, f, dts) && mightMatch(b, f, dts)
      case Or(a, b) => mightMatch(a, f, dts) || mightMatch(b, f, dts)
      case Not(IsNull(e)) => mightMatch(IsNotNull(e), f, dts)
      case Not(IsNotNull(e)) => mightMatch(IsNull(e), f, dts)
      case EqualTo(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litOf(c, l))
          yield rangeOverlaps(c, v, (lo, hi) => lo <= 0 && hi >= 0)).getOrElse(true)
      case EqualTo(l: Literal, e) => mightMatch(EqualTo(e, l), f, dts)
      case EqualNullSafe(e, l: Literal) if l.value != null => mightMatch(EqualTo(e, l), f, dts)
      case LessThan(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litOf(c, l))
          yield rangeOverlaps(c, v, (lo, _) => lo < 0)).getOrElse(true)
      case LessThan(l: Literal, e) => mightMatch(GreaterThan(e, l), f, dts)
      case LessThanOrEqual(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litOf(c, l))
          yield rangeOverlaps(c, v, (lo, _) => lo <= 0)).getOrElse(true)
      case LessThanOrEqual(l: Literal, e) => mightMatch(GreaterThanOrEqual(e, l), f, dts)
      case GreaterThan(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litOf(c, l))
          yield rangeOverlaps(c, v, (_, hi) => hi > 0)).getOrElse(true)
      case GreaterThan(l: Literal, e) => mightMatch(LessThan(e, l), f, dts)
      case GreaterThanOrEqual(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litOf(c, l))
          yield rangeOverlaps(c, v, (_, hi) => hi >= 0)).getOrElse(true)
      case GreaterThanOrEqual(l: Literal, e) => mightMatch(LessThanOrEqual(e, l), f, dts)
      case In(e, list) if list.forall(_.isInstanceOf[Literal]) =>
        nameOf(e, dts) match {
          case Some(c) =>
            list.exists(l => mightMatch(EqualTo(e, l.asInstanceOf[Literal]), f, dts)) ||
              list.exists(l => litOf(c, l.asInstanceOf[Literal]).isEmpty)
          case None => true
        }
      case IsNull(e) =>
        nameOf(e, dts).flatMap(c => f.nullCountOf(c)).forall(_ > 0)
      case IsNotNull(e) =>
        nameOf(e, dts).forall(c => !f.definitelyAllNull(c))
      case StartsWith(e, l: Literal) =>
        (for (c <- nameOf(e, dts); v <- litDomain(l.value, StringType).map(_.toString)) yield {
          if (f.definitelyAllNull(c)) false
          else (f.minOf(c), f.maxOf(c)) match {
            case (Some(mi: String), Some(ma: String)) =>
              mi.take(v.length) <= v && v <= ma.take(v.length)
            case _ => true
          }
        }).getOrElse(true)
      case _ => true
    }
  }

  /** Resolve `pred` against `schema` through Spark's analyzer — a Spark 4
    * Column carries a ColumnNode tree (`UnresolvedFunction("=", …)`), not
    * the Catalyst predicate nodes [[mightMatch]] understands, so the
    * predicate is planted in a Filter over an empty relation of the
    * table's schema and the analyzed condition is extracted. Coercion
    * casts the analyzer wraps around literals are then constant-folded
    * back to plain literals. Must run on the driver with an active
    * session. */
  private def resolvedPredicate(pred: Column, schema: StructType): Expression = {
    val spark = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException("stats pruning requires an active SparkSession"))
    val empty = spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    val cond = Bridge.analyzedPlan(empty.filter(pred))
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .getOrElse(Literal.TrueLiteral)
    cond.transformUp {
      case e if e.foldable && !e.isInstanceOf[Literal] =>
        try Literal.create(e.eval(), e.dataType)
        catch { case _: Exception => e } // ANSI eval error → leave unknown, keeps the file
    }
  }

  /** Per-file keep decision, usable both driver-side ([[prune]]) and as a
    * distributed filter over a file-list DataFrame (the returned closure
    * captures only serializable state: the Catalyst expression, the
    * schema, and name maps). */
  def keep(
      pred: Column,
      schema: StructType,
      partitionColumns: Seq[String]): (Option[String], Map[String, String]) => Boolean = {
    val dts = schema.map(f => f.name -> f.dataType).toMap
    val partSet = partitionColumns.toSet
    val e = resolvedPredicate(pred, schema)
    (stats, pv) =>
      mightMatch(e, new FileView(stats.map(parseStats(_, schema)), pv, schema, partSet), dts)
  }

  /** Cull `files` to those that might contain rows matching `pred`. */
  def prune(
      files: Seq[Delta.AddFile],
      pred: Column,
      schema: StructType,
      partitionColumns: Seq[String]): Seq[Delta.AddFile] = {
    val k = keep(pred, schema, partitionColumns)
    files.filter(af => k(af.stats, af.partitionValues))
  }

  // --------------------------------------------------------------- z-order

  /** Z-value column for multi-dimensional clustering: each numeric-view
    * dimension is min-max scaled to 16 bits, then the bits are
    * interleaved MSB-first into a Long. Range-partitioning + sorting by
    * this value gives every output file a tight min/max box in EVERY
    * dimension, so [[prune]] works on all of them at once — the OPTIMIZE
    * ZORDER BY of the spec. `dims` maps each dimension's numeric column
    * to its (min, max) over the data being rewritten. */
  def zValue(dims: Seq[(Column, (Double, Double))]): Column = {
    require(dims.nonEmpty && dims.size <= 4, s"zorder supports 1-4 columns, got ${dims.size}")
    val buckets: Seq[Column] = dims.map { case (dim, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      val scaled = (dim.cast(DoubleType) - lit(lo)) / lit(span) * lit(65535.0)
      // clamp BEFORE the int cast: ANSI mode rejects overflowing casts
      coalesce(least(greatest(scaled, lit(0.0)), lit(65535.0)).cast(IntegerType), lit(0))
    }
    interleaveBits(array(buckets: _*))
  }

  /** MSB-first bit interleave of up to 4 16-bit bucket indices. A UDF is
    * justified here (SURVEY §7.1): variable-arity bit weaving has no
    * builtin, and it runs once per row during OPTIMIZE only. */
  private val interleaveBits = udf { (xs: Seq[Int]) =>
    var z = 0L
    var bit = 15
    while (bit >= 0) {
      var i = 0
      while (i < xs.length) {
        z = (z << 1) | ((xs(i) >> bit) & 1L)
        i += 1
      }
      bit -= 1
    }
    z
  }
}
