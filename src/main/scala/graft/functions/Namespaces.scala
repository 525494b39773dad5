package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric namespace — mirrors `daft/functions/numeric.py`. Everything is a
  * Spark builtin except clip and fill_nan (composed). */
object Num {
  def absCol(c: Column): Column = abs(c)
  def ceilCol(c: Column): Column = ceil(c)
  def floorCol(c: Column): Column = floor(c)
  def clip(c: Column, lo: Column, hi: Column): Column = greatest(least(c, hi), lo)
  def sign(c: Column): Column = signum(c)
  def negate(c: Column): Column = -c
  def roundCol(c: Column, scale: Int): Column = round(c, scale)
  def sqrtCol(c: Column): Column = sqrt(c)
  def cbrtCol(c: Column): Column = cbrt(c)
  def log2Col(c: Column): Column = log2(c)
  def log10Col(c: Column): Column = log10(c)
  def ln(c: Column): Column = log(c)
  def log1pCol(c: Column): Column = log1p(c)
  def logBase(base: Double, c: Column): Column = log(base, c)
  def expCol(c: Column): Column = exp(c)
  def expm1Col(c: Column): Column = expm1(c)
  def powCol(a: Column, b: Column): Column = pow(a, b)
  def pmodCol(a: Column, b: Column): Column = pmod(a, b)
  def factorialCol(c: Column): Column = factorial(c)
  def hypotCol(a: Column, b: Column): Column = hypot(a, b)
  def pi(): Column = lit(math.Pi)
  def e(): Column = lit(math.E)
  def binCol(c: Column): Column = bin(c)
  def convCol(c: Column, from: Int, to: Int): Column = conv(c, from, to)
  def tryDivide(a: Column, b: Column): Column = try_divide(a, b)
  def isNan(c: Column): Column = isnan(c)
  def notNan(c: Column): Column = !isnan(c)
  def isInf(c: Column): Column = c === Double.PositiveInfinity || c === Double.NegativeInfinity
  def fillNan(c: Column, v: Column): Column = nanvl(c, v)
  def between(c: Column, lo: Column, hi: Column): Column = c >= lo && c <= hi
  // trig + hyperbolic + inverse — direct Spark builtins
  def sinCol(c: Column): Column = sin(c);   def cosCol(c: Column): Column = cos(c)
  def tanCol(c: Column): Column = tan(c);   def asinCol(c: Column): Column = asin(c)
  def acosCol(c: Column): Column = acos(c); def atanCol(c: Column): Column = atan(c)
  def atan2Col(y: Column, x: Column): Column = atan2(y, x)
  def sinhCol(c: Column): Column = sinh(c); def coshCol(c: Column): Column = cosh(c)
  def tanhCol(c: Column): Column = tanh(c)
  def asinhCol(c: Column): Column = asinh(c)
  def acoshCol(c: Column): Column = acosh(c)
  def atanhCol(c: Column): Column = atanh(c)
  // reciprocal trig (ref functions/numeric.py:90-104: csc/sec/cot)
  def cotCol(c: Column): Column = lit(1.0) / tan(c)
  def cscCol(c: Column): Column = lit(1.0) / sin(c)
  def secCol(c: Column): Column = lit(1.0) / cos(c)
  def radiansCol(c: Column): Column = radians(c)
  def degreesCol(c: Column): Column = degrees(c)
}

/** Datetime namespace — mirrors `daft/functions/datetime.py` (all Spark
  * builtins). */
object Dt {
  def date(c: Column): Column = to_date(c)
  def day(c: Column): Column = dayofmonth(c)
  def hourCol(c: Column): Column = hour(c)
  def minuteCol(c: Column): Column = minute(c)
  def secondCol(c: Column): Column = second(c)
  def monthCol(c: Column): Column = month(c)
  def quarterCol(c: Column): Column = quarter(c)
  def yearCol(c: Column): Column = year(c)
  def dayOfWeek(c: Column): Column = dayofweek(c)
  def dayOfMonth(c: Column): Column = dayofmonth(c)
  def dayOfYear(c: Column): Column = dayofyear(c)
  def weekOfYear(c: Column): Column = weekofyear(c)
  def unixDate(c: Column): Column = unix_date(to_date(c))
  // inverse (ref datetime.py date_from_unix_date): epoch days → DATE
  def dateFromUnixDate(c: Column): Column = date_from_unix_date(c)
  def strftime(c: Column, fmt: String): Column = date_format(c, fmt)
  def toDate(c: Column, fmt: String): Column = to_date(c, fmt)
  def toDatetime(c: Column, fmt: String): Column = to_timestamp(c, fmt)
  def dateTrunc(unit: String, c: Column): Column = date_trunc(unit, c)
  def toUnixEpoch(c: Column): Column = unix_timestamp(c)
  def fromUnixEpoch(c: Column): Column = from_unixtime(c)
  def currentDate(): Column = current_date()
  def currentTimestamp(): Column = current_timestamp()
  def dateAdd(c: Column, days: Int): Column = date_add(c, days)
  def dateSub(c: Column, days: Int): Column = date_sub(c, days)
  def dateDiff(a: Column, b: Column): Column = datediff(a, b)
  def addMonths(c: Column, n: Int): Column = add_months(c, n)
  def monthsBetween(a: Column, b: Column): Column = months_between(a, b)
  def lastDay(c: Column): Column = last_day(c)
  def nextDay(c: Column, dow: String): Column = next_day(c, dow)
  def makeDate(y: Column, m: Column, d: Column): Column = make_date(y, m, d)
  def timestampSeconds(c: Column): Column = timestamp_seconds(c)
  def timestampMillis(c: Column): Column = timestamp_millis(c)
  def timestampMicros(c: Column): Column = timestamp_micros(c)
  def fromUtcTimestamp(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  def toUtcTimestamp(c: Column, tz: String): Column = to_utc_timestamp(c, tz)
  def totalSeconds(interval: Column): Column = interval.cast("long")
  // r9 API-sweep closures (ref datetime.py):
  /** make_timestamp(y, mo, d, h, mi, s) — session-zone timestamp. */
  def makeTimestamp(y: Column, mo: Column, d: Column,
      h: Column, mi: Column, s: Column): Column = make_timestamp(y, mo, d, h, mi, s)
  /** Sub-second microsecond component [0, 999999]. The cast admits
    * TIMESTAMP_NTZ inputs (unix_micros rejects them); instant-preserving
    * under the session's pinned-UTC zone, and the sub-second component is
    * zone-invariant regardless. */
  def microsecond(c: Column): Column =
    pmod(unix_micros(c.cast("timestamp")), lit(1000000L))
  /** ANSI datepart/date_part by field name. */
  def datePart(field: String, c: Column): Column = date_part(lit(field), c)
  // duration totals (ref total_days/hours/minutes/...; the seconds
  // convention above is the anchor, the rest are exact integer scalings)
  def totalDays(interval: Column): Column =
    floor(totalSeconds(interval) / lit(86400L)).cast("long")
  def totalHours(interval: Column): Column =
    floor(totalSeconds(interval) / lit(3600L)).cast("long")
  def totalMinutes(interval: Column): Column =
    floor(totalSeconds(interval) / lit(60L)).cast("long")
  /** Exact interval length in microseconds. Scaling totalSeconds would
    * truncate sub-second components first (ref total_milliseconds returns 1
    * for a 1000µs duration, datetime.py:783-826); instead add the interval
    * to the epoch and read back micros — exact for any day-time interval. */
  private def intervalMicros(interval: Column): Column = {
    import org.apache.spark.sql.types.DayTimeIntervalType
    // SECOND-to-SECOND cast: duration-preserving for interval inputs
    // (micros precision), seconds-count for integral inputs — so the
    // totals accept both representations like totalSeconds does
    val iv = interval.cast(DayTimeIntervalType(DayTimeIntervalType.SECOND))
    unix_micros(timestamp_micros(lit(0L)) + iv)
  }
  def totalMilliseconds(interval: Column): Column =
    floor(intervalMicros(interval) / lit(1000L)).cast("long")
  def totalMicroseconds(interval: Column): Column = intervalMicros(interval)
  /** Nanosecond component (ref datetime.py:278). Spark timestamps carry
    * microsecond precision, so this is the µs component ×1000 — identical
    * to the reference on any µs-precision input. */
  def nanosecond(c: Column): Column = microsecond(c) * lit(1000L)
  /** Millisecond component [0, 999] (ref datetime.py millisecond). */
  def millisecond(c: Column): Column =
    floor(microsecond(c) / lit(1000L)).cast("long")
  /** Time-of-day extraction (ref datetime.py time()). Spark has no
    * standalone Time type on stable surfaces; the reference-compatible
    * projection is the HH:mm:ss.SSSSSS wall-clock string. */
  def timeOfDay(c: Column): Column =
    date_format(c.cast("timestamp"), "HH:mm:ss.SSSSSS")
  def totalNanoseconds(interval: Column): Column =
    intervalMicros(interval) * lit(1000L)
  /** Zone conversion, defined on the input's WALL-CLOCK (ref
    * datetime.py:1144): the wall-clock (TIMESTAMP_NTZ directly; TIMESTAMP
    * via its session-zone rendering — UTC under graft's pinned session, so
    * the default `fromTz=UTC` is instant-preserving for instants) is
    * interpreted in `fromTz` and converted to the `toTz` wall-clock,
    * returned as TIMESTAMP_NTZ (Spark has no per-column zone label).
    * Pass `fromTz` ONLY for naive inputs, exactly like the reference
    * ("if the timestamp has no timezone, from_timezone must be provided")
    * — an instant input combined with an explicit `fromTz` is
    * re-interpreted in that zone, not preserved. */
  def convertTimeZone(c: Column, toTz: String, fromTz: Option[String] = None): Column =
    // default fromTz = the SESSION zone (ADVICE r11): a TIMESTAMP input's
    // cast-to-ntz wall-clock is rendered in the session zone, so
    // re-interpreting it in that same zone preserves the instant under ANY
    // session timezone — a hardcoded "UTC" was only correct because graft
    // pins spark.sql.session.timeZone=UTC
    convert_timezone(fromTz.map(lit).getOrElse(current_timezone()), lit(toTz),
      c.cast("timestamp_ntz"))
  /** Wall-clock-preserving zone relabel (ref datetime.py:1160): the result
    * is the instant whose wall-clock in `tz` equals the input's wall-clock.
    * With no tz the zone is dropped: the wall-clock comes back as
    * TIMESTAMP_NTZ. */
  def replaceTimeZone(c: Column, tz: Option[String] = None): Column = tz match {
    case Some(z) => to_utc_timestamp(c.cast("timestamp_ntz"), z)
    case None    => c.cast("timestamp_ntz")
  }
  /** UTC timestamp from components (ref datetime.py:1750): components are
    * interpreted in `tz` (UTC when absent) and the result is an instant. */
  def makeTimestampLtz(y: Column, mo: Column, d: Column, h: Column,
      mi: Column, s: Column, tz: Option[String] = None): Column = tz match {
    case Some(z) => make_timestamp_ltz(y, mo, d, h, mi, s, lit(z))
    case None    => make_timestamp_ltz(y, mo, d, h, mi, s, lit("UTC"))
  }
}

/** List namespace — mirrors `daft/functions/list.py` (Spark higher-order
  * functions). */
object Lists {
  def listJoin(c: Column, sep: String): Column = array_join(c, sep)
  def flattenCol(c: Column): Column = flatten(c)
  def listCount(c: Column): Column = size(c)
  def listSum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double"))
  def listMean(c: Column): Column = listSum(c) / size(c).cast("double")
  def listMin(c: Column): Column = array_min(c)
  def listMax(c: Column): Column = array_max(c)
  def listBoolAnd(c: Column): Column = forall(c, x => x)
  def listBoolOr(c: Column): Column = exists(c, x => x)
  def listSort(c: Column): Column = sort_array(c)
  def listSortDesc(c: Column): Column = sort_array(c, asc = false)
  def listDistinct(c: Column): Column = array_distinct(c)
  def listMap(c: Column, f: Column => Column): Column = transform(c, f)
  def listFilter(c: Column, f: Column => Column): Column = filter(c, f)
  def listAppend(c: Column, v: Column): Column = array_append(c, v)
  def listContains(c: Column, v: Column): Column = array_contains(c, v)
  def seq(from: Column, to: Column, step: Column): Column = sequence(from, to, step)
  def listSlice(c: Column, start: Int, len: Int): Column = slice(c, start, len)
  /** Fixed-size chunking of a list (ref list.py chunk). */
  def chunk(c: Column, n: Int): Column =
    transform(
      sequence(lit(0), ((size(c) - 1) / n).cast("int")),
      i => slice(c, i * n + 1, lit(n)))
  /** value_counts as a sorted array of (value, count) structs. */
  def valueCounts(c: Column): Column =
    sort_array(transform(array_distinct(c),
      v => struct(v.as("value"),
        aggregate(c, lit(0L), (acc, x) => acc + when(x === v, 1L).otherwise(0L)).as("count"))))
}

/** Horizontal (across-columns) aggregation — mirrors
  * `daft/functions/columnar.py`, which defines columns_* as
  * to_list(cols).list_agg(). Null elements are skipped (the reference's
  * list aggregations operate on valid values); all-null rows yield null. */
object Columnar {
  private def valid(cols: Seq[Column]): Column =
    filter(array(cols: _*), x => x.isNotNull)
  /** Sum in the inputs' COMMON type (ADVICE r11: the reference's
    * to_list().list_sum() keeps integer dtype for integer inputs): the
    * fold zero is element_at(v,1)*0 — typed by the array's element type —
    * so all-int columns sum as ints while any double input coerces the
    * array (and the sum) to double. The when-guard keeps the zero
    * expression unevaluated on empty arrays. */
  def columnsSum(cols: Column*): Column = {
    val v = valid(cols)
    when(size(v) > 0,
      aggregate(v, element_at(v, lit(1)) * lit(0), (acc, x) => acc + x))
  }
  def columnsMean(cols: Column*): Column = {
    val v = valid(cols)
    when(size(v) > 0,
      aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double")) /
        size(v).cast("double"))
  }
  def columnsAvg(cols: Column*): Column = columnsMean(cols: _*)
  def columnsMin(cols: Column*): Column = array_min(array(cols: _*))
  def columnsMax(cols: Column*): Column = array_max(array(cols: _*))
}

/** JSON namespace — mirrors `daft/functions/str.py` serialize/jq/json_* via
  * Spark's JSON builtins. */
object Json {
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)
  def jsonTuple(c: Column, fields: String*): Column = json_tuple(c, fields: _*)
  def jsonArrayLength(c: Column): Column = json_array_length(c)
  def jsonObjectKeys(c: Column): Column = json_object_keys(c)
  def fromJson(c: Column, schema: org.apache.spark.sql.types.DataType): Column =
    from_json(c, schema)
  def toJson(c: Column): Column = to_json(c)
  // ref str.py serialize/deserialize/try_deserialize (format="json" is the
  // only published format): serialize = to_json; deserialize = from_json,
  // whose Spark semantics are already null-on-malformed — so the try_
  // variant IS the base behavior, aliased for surface parity
  def serializeJson(c: Column): Column = to_json(c)
  def deserializeJson(c: Column, schema: org.apache.spark.sql.types.DataType): Column =
    from_json(c, schema)
  def tryDeserializeJson(c: Column, schema: org.apache.spark.sql.types.DataType): Column =
    from_json(c, schema)
  def schemaOfJson(sample: String): Column = schema_of_json(sample)
}

/** Struct/Map namespace — mirrors `daft/functions/struct.py` + map helpers. */
object Structs {
  /** unnest (ref expressions.py:206): flatten a struct column's fields
    * into top-level columns — Spark's star expansion on the struct. */
  def unnest(df: org.apache.spark.sql.DataFrame, structCol: String): org.apache.spark.sql.DataFrame =
    df.select(df.columns.filter(_ != structCol).map(col).toSeq :+ col(s"$structCol.*"): _*)
  def toStruct(cols: Column*): Column = struct(cols: _*)
  def get(c: Column, field: String): Column = c.getField(field)
  def mapGet(m: Column, key: Column): Column = element_at(m, key)
  def mapKeys(m: Column): Column = map_keys(m)
  def mapValues(m: Column): Column = map_values(m)
  def mapFromArrays(k: Column, v: Column): Column = map_from_arrays(k, v)
  def mapEntries(m: Column): Column = map_entries(m)
}

/** Partitioning helpers — mirrors `daft/functions/partition.py` (Iceberg-
  * style transforms). */
object Partitioning {
  def days(c: Column): Column = date_trunc("day", c).cast("date")
  def hours(c: Column): Column = date_trunc("hour", c)
  def months(c: Column): Column = date_format(c, "yyyy-MM")
  def years(c: Column): Column = year(c)
  def bucket(n: Int, c: Column): Column = pmod(hash(c), lit(n))
  def truncate(w: Int, c: Column): Column =
    (floor(c.cast("double") / w) * w).cast("long")
}
