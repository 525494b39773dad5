package graft.queries

import graft.Tables
import graft.functions.{Binary => GBin, Distance => GDist, Lists => GList, Misc => GMisc, Strings => GStr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function coverage — SURVEY.md §2.6: the reference's
  * `daft/functions` namespaces re-expressed over Spark builtins plus graft's
  * UDF layer for the gaps. Each query exercises one namespace end-to-end
  * with a DuckDB oracle. */
object Functions {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  // ---- strings: basics ----
  def fn_strings_basic(s: SparkSession, dir: String): DataFrame =
    t(s, dir).part
      .filter(col("p_partkey") <= 500)
      .select(
        col("p_partkey"),
        GStr.lower(col("p_type")).as("lower_t"),
        GStr.upper(col("p_name")).as("upper_n"),
        GStr.capitalize(col("p_name")).as("cap_n"),
        GStr.left(col("p_name"), 3).as("left3"),
        GStr.right(col("p_name"), 4).as("right4"),
        GStr.reverseStr(col("p_name")).as("rev_n"),
        length(col("p_name")).as("len_n"),
        GStr.lengthBytes(col("p_name")).as("len_bytes"),
        GStr.lpad(col("p_brand"), 10, "*").as("lpad_b"),
        GStr.rpad(col("p_brand"), 10, "#").as("rpad_b"),
        GStr.repeatStr(col("p_type"), 2).as("rep_t"),
        GStr.contains(col("p_name"), "red").as("has_red"),
        GStr.startswith(col("p_name"), "small").as("sw_small"),
        GStr.endswith(col("p_name"), "bolt").as("ew_bolt"),
        GStr.find(col("p_name"), "i").as("find_i"),
        GStr.substr(col("p_name"), lit(2), lit(4)).as("sub24"),
        GStr.concatWs("|", col("p_brand"), col("p_type")).as("joined"))
      .orderBy("p_partkey")

  val fnStringsBasicSql =
    """SELECT p_partkey,
      |  lower(p_type) AS lower_t, upper(p_name) AS upper_n,
      |  upper(substring(p_name,1,1)) || lower(substring(p_name,2)) AS cap_n,
      |  substring(p_name,1,3) AS left3,
      |  CASE WHEN length(p_name) <= 4 THEN p_name
      |       ELSE substring(p_name, length(p_name)-3) END AS right4,
      |  reverse(p_name) AS rev_n, length(p_name) AS len_n,
      |  octet_length(encode(p_name)) AS len_bytes,
      |  lpad(p_brand, 10, '*') AS lpad_b, rpad(p_brand, 10, '#') AS rpad_b,
      |  repeat(p_type, 2) AS rep_t,
      |  contains(p_name, 'red') AS has_red,
      |  starts_with(p_name, 'small') AS sw_small,
      |  p_name LIKE '%bolt' AS ew_bolt,
      |  instr(p_name, 'i') - 1 AS find_i,
      |  substring(p_name, 2, 4) AS sub24,
      |  p_brand || '|' || p_type AS joined
      |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin

  // ---- strings: case converters (graft UDFs; p_name is "<word> <word>") ----
  def fn_strings_case(s: SparkSession, dir: String): DataFrame =
    t(s, dir).part
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        GStr.camelCase(col("p_name")).as("camel"),
        GStr.snakeCase(col("p_name")).as("snake"),
        GStr.kebabCase(col("p_name")).as("kebab"),
        GStr.titleCase(col("p_name")).as("title"),
        GStr.normalize(concat(lit("  "), col("p_name"), lit("   x  "))).as("normalized"),
        // SCREAMING variants (r9 API-sweep closure)
        GStr.upperCamelCase(col("p_name")).as("ucamel"),
        GStr.upperSnakeCase(col("p_name")).as("usnake"),
        GStr.upperKebabCase(col("p_name")).as("ukebab"))
      .orderBy("p_partkey")

  val fnStringsCaseSql =
    """SELECT p_partkey,
      |  split_part(p_name,' ',1) ||
      |    upper(substring(split_part(p_name,' ',2),1,1)) ||
      |    substring(split_part(p_name,' ',2),2) AS camel,
      |  replace(p_name,' ','_') AS snake,
      |  replace(p_name,' ','-') AS kebab,
      |  upper(substring(split_part(p_name,' ',1),1,1)) || substring(split_part(p_name,' ',1),2)
      |    || ' ' ||
      |  upper(substring(split_part(p_name,' ',2),1,1)) || substring(split_part(p_name,' ',2),2)
      |    AS title,
      |  lower(trim(regexp_replace('  ' || p_name || '   x  ', '\s+', ' ', 'g'))) AS normalized,
      |  upper(substring(split_part(p_name,' ',1),1,1)) || substring(split_part(p_name,' ',1),2)
      |    || upper(substring(split_part(p_name,' ',2),1,1)) || substring(split_part(p_name,' ',2),2)
      |    AS ucamel,
      |  upper(replace(p_name,' ','_')) AS usnake,
      |  upper(replace(p_name,' ','-')) AS ukebab
      |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin

  // ---- strings: distances (graft UDFs vs DuckDB native metrics) ----
  def fn_strings_distance(s: SparkSession, dir: String): DataFrame =
    t(s, dir).part
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        GStr.levenshteinDist(col("p_name"), col("p_type")).as("lev"),
        GStr.hamming(GStr.left(col("p_name"), 5), GStr.left(col("p_type"), 5)).as("ham5"),
        GStr.jaro(col("p_name"), col("p_type")).as("jaro_sim"),
        GStr.jaroWinkler(col("p_name"), col("p_type")).as("jw_sim"),
        GStr.damerauLevenshtein(col("p_name"), col("p_brand")).as("dam_lev"))
      .orderBy("p_partkey")

  val fnStringsDistanceSql =
    """SELECT p_partkey,
      |  levenshtein(p_name, p_type) AS lev,
      |  hamming(substring(p_name,1,5), substring(p_type,1,5)) AS ham5,
      |  jaro_similarity(p_name, p_type) AS jaro_sim,
      |  jaro_winkler_similarity(p_name, p_type) AS jw_sim,
      |  damerau_levenshtein(p_name, p_brand) AS dam_lev
      |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin

  // ---- strings: regex family ----
  def fn_strings_regex(s: SparkSession, dir: String): DataFrame =
    t(s, dir).documents
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        GStr.regexpMatch(col("text"), "^[a-z]+ ").as("starts_word"),
        GStr.regexpExtract(col("text"), "([a-z]+)", 1).as("first_word"),
        GStr.regexpCount(col("text"), "data").as("n_data"),
        GStr.regexpReplace(col("text"), "[aeiou]", "_").as("devowel"),
        size(GStr.regexpExtractAll(col("text"), "\\b[a-z]{5}\\b", 0)).as("n_5letter"),
        GStr.countMatches(col("text"), "the").as("n_the"))
      .orderBy("doc_id")

  val fnStringsRegexSql =
    """SELECT doc_id,
      |  regexp_matches(text, '^[a-z]+ ') AS starts_word,
      |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
      |  len(regexp_extract_all(text, 'data')) AS n_data,
      |  regexp_replace(text, '[aeiou]', '_', 'g') AS devowel,
      |  len(regexp_extract_all(text, '\b[a-z]{5}\b')) AS n_5letter,
      |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS INT) AS n_the
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // ---- numeric ----
  def fn_numeric(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Num => N}
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        N.absCol(col("l_quantity") - 25).as("abs_v"),
        N.ceilCol(col("l_discount") * 100).as("ceil_v"),
        N.floorCol(col("l_tax") * 100).as("floor_v"),
        N.roundCol(col("l_extendedprice") / 1000, 2).as("round_v"),
        // transcendentals rounded to 6 on both sides: Java Math and DuckDB's
        // libm differ in the last ulp; values ≤1e4 so 1e-6 spacing is safe
        round(N.sqrtCol(col("l_quantity")), 6).as("sqrt_v"),
        round(N.cbrtCol(col("l_quantity")), 6).as("cbrt_v"),
        round(N.ln(col("l_extendedprice")), 6).as("ln_v"),
        round(N.log10Col(col("l_extendedprice")), 6).as("log10_v"),
        round(N.log2Col(col("l_quantity")), 6).as("log2_v"),
        round(N.expCol(col("l_discount")), 6).as("exp_v"),
        N.powCol(col("l_quantity"), lit(2)).as("pow_v"),
        N.pmodCol(col("l_orderkey"), lit(7)).as("mod_v"),
        N.sign(col("l_quantity") - 25).as("sign_v"),
        N.clip(col("l_quantity"), lit(10.0), lit(40.0)).as("clip_v"),
        round(N.sinCol(col("l_discount")), 6).as("sin_v"),
        round(N.atan2Col(col("l_discount"), col("l_tax") + 0.01), 6).as("atan2_v"),
        round(N.degreesCol(col("l_discount")), 6).as("deg_v"),
        round(N.hypotCol(col("l_quantity"), col("l_linenumber")), 6).as("hypot_v"),
        // reciprocal trig (r9 API-sweep closure); +0.5 keeps args off the
        // poles so the reciprocals stay well-conditioned at 6 decimals
        round(N.cotCol(col("l_discount") + 0.5), 6).as("cot_v"),
        round(N.cscCol(col("l_discount") + 0.5), 6).as("csc_v"),
        round(N.secCol(col("l_discount") + 0.5), 6).as("sec_v"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val fnNumericSql =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25) AS abs_v,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_v,
      |  CAST(floor(l_tax * 100) AS BIGINT) AS floor_v,
      |  round(l_extendedprice / 1000, 2) AS round_v,
      |  round(sqrt(l_quantity), 6) AS sqrt_v,
      |  round(cbrt(l_quantity), 6) AS cbrt_v,
      |  round(ln(l_extendedprice), 6) AS ln_v,
      |  round(log10(l_extendedprice), 6) AS log10_v,
      |  round(log2(l_quantity), 6) AS log2_v,
      |  round(exp(l_discount), 6) AS exp_v,
      |  pow(l_quantity, 2) AS pow_v,
      |  mod(l_orderkey, 7) AS mod_v,
      |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_v,
      |  greatest(least(l_quantity, 40.0), 10.0) AS clip_v,
      |  round(sin(l_discount), 6) AS sin_v,
      |  round(atan2(l_discount, l_tax + 0.01), 6) AS atan2_v,
      |  round(degrees(l_discount), 6) AS deg_v,
      |  round(sqrt(l_quantity*l_quantity + l_linenumber*l_linenumber), 6) AS hypot_v,
      |  round(1.0 / tan(l_discount + 0.5), 6) AS cot_v,
      |  round(1.0 / sin(l_discount + 0.5), 6) AS csc_v,
      |  round(1.0 / cos(l_discount + 0.5), 6) AS sec_v
      |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- datetime ----
  def fn_datetime(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Dt => D}
    t(s, dir).events
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        D.yearCol(col("ts")).as("y"),
        D.monthCol(col("ts")).as("mo"),
        D.day(col("ts")).as("d"),
        D.hourCol(col("ts")).as("h"),
        D.minuteCol(col("ts")).as("mi"),
        D.secondCol(col("ts")).as("sec"),
        D.quarterCol(col("ts")).as("q"),
        D.dayOfWeek(col("ts")).as("dow"),
        D.dayOfYear(col("ts")).as("doy"),
        D.weekOfYear(col("ts")).as("woy"),
        D.dateTrunc("month", col("ts")).cast("date").as("mo_start"),
        D.strftime(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"),
        D.toUnixEpoch(col("ts")).as("epoch_s"),
        D.dateAdd(col("ts"), 30).as("plus30d"),
        D.lastDay(col("ts")).as("eom"),
        D.addMonths(col("ts"), 2).as("plus2mo"),
        D.dateDiff(lit("2024-06-01").cast("date"), col("ts")).as("days_to_jun"),
        // unix_date/date_from_unix_date inverse pair (r9 API-sweep closure)
        D.dateFromUnixDate(D.unixDate(col("ts"))).as("unix_date_roundtrip"),
        // r9 API-sweep closures: component rebuild, sub-second micros,
        // ANSI datepart
        // cast to NTZ: the oracle's make_timestamp is tz-naive, and the
        // driver compares parquet dtypes via pandas where UTC-adjusted vs
        // naive timestamps differ even at identical instants (r9 red)
        D.makeTimestamp(year(col("ts")), month(col("ts")), dayofmonth(col("ts")),
          hour(col("ts")), minute(col("ts")), second(col("ts")).cast("double"))
          .cast("timestamp_ntz")
          .as("rebuilt_ts"),
        D.microsecond(col("ts")).as("micro"),
        D.datePart("hour", col("ts")).as("dp_hour"))
      .orderBy("event_id")
  }

  val fnDatetimeSql =
    """SELECT event_id,
      |  year(ts) AS y, month(ts) AS mo, day(ts) AS d,
      |  hour(ts) AS h, minute(ts) AS mi, CAST(second(ts) AS INT) AS sec,
      |  quarter(ts) AS q,
      |  dayofweek(ts) + 1 AS dow,
      |  dayofyear(ts) AS doy,
      |  weekofyear(ts) AS woy,
      |  CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS mo_start,
      |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M') AS fmt,
      |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
      |  CAST(CAST(ts AS TIMESTAMP) + INTERVAL 30 DAY AS DATE) AS plus30d,
      |  last_day(CAST(ts AS DATE)) AS eom,
      |  CAST(CAST(ts AS TIMESTAMP) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
      |  datediff('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_to_jun,
      |  CAST(ts AS DATE) AS unix_date_roundtrip,
      |  make_timestamp(CAST(year(ts) AS BIGINT), CAST(month(ts) AS BIGINT),
      |    CAST(day(ts) AS BIGINT), CAST(hour(ts) AS BIGINT),
      |    CAST(minute(ts) AS BIGINT), floor(second(ts))) AS rebuilt_ts,
      |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) % 1000000 AS BIGINT) AS micro,
      |  CAST(hour(ts) AS BIGINT) AS dp_hour
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  /** Timezone-aware datetime surface — round-11 API-sweep closure (ref
    * datetime.py:278 nanosecond, :875 total_nanoseconds, :1144
    * convert_time_zone, :1160 replace_time_zone, :1750 make_timestamp_ltz).
    * Fixed-offset zones keep the DuckDB oracle pure arithmetic (no ICU
    * dependency), and every output is a string or long so parquet dtypes
    * cannot drift (the r9 fn_datetime lesson). */
  def fn_datetime_tz(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Dt => D}
    val ts = col("ts")
    t(s, dir).events
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        D.nanosecond(ts).as("nanos"),
        D.totalNanoseconds(
          ts.cast("timestamp") - date_trunc("day", ts.cast("timestamp")))
          .as("day_nanos"),
        date_format(D.convertTimeZone(ts, "+05:30"), "yyyy-MM-dd HH:mm:ss")
          .as("ist_wall"),
        date_format(D.convertTimeZone(ts, "-08:00"), "yyyy-MM-dd HH:mm:ss")
          .as("pst_wall"),
        unix_timestamp(D.replaceTimeZone(ts, Some("+05:30")))
          .as("relabel_epoch"),
        date_format(D.replaceTimeZone(ts, None), "yyyy-MM-dd HH:mm:ss")
          .as("naive_wall"),
        unix_timestamp(D.makeTimestampLtz(
          year(ts), month(ts), dayofmonth(ts),
          hour(ts), minute(ts), second(ts).cast("double"), Some("+02:00")))
          .as("ltz_epoch"),
        D.millisecond(ts).as("milli"),
        D.timeOfDay(ts).as("tod"))
      .orderBy("event_id")
  }

  val fnDatetimeTzSql =
    """SELECT event_id,
      |  CAST((epoch_us(CAST(ts AS TIMESTAMP)) % 1000000) * 1000 AS BIGINT) AS nanos,
      |  CAST((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))) * 1000 AS BIGINT) AS day_nanos,
      |  strftime(CAST(ts AS TIMESTAMP) + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS ist_wall,
      |  strftime(CAST(ts AS TIMESTAMP) - INTERVAL 480 MINUTE, '%Y-%m-%d %H:%M:%S') AS pst_wall,
      |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - 19800 AS relabel_epoch,
      |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS naive_wall,
      |  CAST(floor(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))) AS BIGINT) - 7200 AS ltz_epoch,
      |  CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) % 1000000) / 1000) AS BIGINT) AS milli,
      |  strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S.%f') AS tod
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  /** Horizontal across-columns aggregation (ref columnar.py columns_*),
    * including null-skipping and the all-null → null contract. */
  def fn_columnar(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Columnar => C}
    val q = col("l_quantity").cast("double")
    val p = col("l_extendedprice").cast("double")
    val d = col("l_discount").cast("double")
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 200)
      .withColumn("maybe_tax",
        when(col("l_linenumber") % 2 === 0, col("l_tax").cast("double")))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(C.columnsSum(q, p, d), 4).as("h_sum"),
        round(C.columnsMean(q, p, d), 4).as("h_mean"),
        C.columnsMin(q, p, d).as("h_min"),
        C.columnsMax(q, p, d).as("h_max"),
        round(C.columnsSum(q, col("maybe_tax")), 4).as("h_sum_null"),
        round(C.columnsMean(q, col("maybe_tax")), 4).as("h_mean_null"),
        C.columnsSum(lit(null).cast("double"), lit(null).cast("double"))
          .as("h_all_null"),
        // dtype-parity pin (ADVICE r11): all-int inputs sum as ints, like
        // the reference's to_list().list_sum()
        C.columnsSum(col("l_orderkey"), col("l_linenumber").cast("bigint"))
          .as("h_sum_int"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val fnColumnarSql =
    """SELECT l_orderkey, l_linenumber,
      |  round(l_quantity + l_extendedprice + l_discount, 4) AS h_sum,
      |  round((l_quantity + l_extendedprice + l_discount) / 3.0, 4) AS h_mean,
      |  least(l_quantity, l_extendedprice, l_discount) AS h_min,
      |  greatest(l_quantity, l_extendedprice, l_discount) AS h_max,
      |  round(l_quantity + CASE WHEN l_linenumber % 2 = 0 THEN l_tax ELSE 0 END, 4) AS h_sum_null,
      |  round(CASE WHEN l_linenumber % 2 = 0 THEN (l_quantity + l_tax) / 2.0 ELSE l_quantity END, 4) AS h_mean_null,
      |  CAST(NULL AS DOUBLE) AS h_all_null,
      |  CAST(l_orderkey + l_linenumber AS BIGINT) AS h_sum_int
      |FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Magic-byte MIME sniffing (ref file_.py:134 / file.rs:441-495): each
    * doc_id selects one format's signature bytes, built identically in both
    * engines; the oracle states the expected MIME independently, so the
    * sniffer's decision chain is what's under test. Covers all 13 formats,
    * the HDF5 user-block offset, and the unknown → null contract. */
  def fn_mime(s: SparkSession, dir: String): DataFrame = {
    val samples = Seq(
      "89504E470D0A1A0A0000",             // PNG
      "FFD8FFE000104A464946",             // JPEG/JFIF
      "4749463839610100",                 // GIF89a
      "524946460A00000057454250",         // RIFF....WEBP
      "255044462D312E34",                 // %PDF-1.4
      "504B03041400",                     // ZIP local header
      "494433030000",                     // ID3-tagged MP3
      "FFFB9044",                         // MP3 frame sync
      "524946460A00000057415645",         // RIFF....WAVE
      "4F6767530002",                     // OggS
      "000000186674797069736F6D",         // ....ftypisom (MP4)
      "000001BA2100",                     // MPEG program stream
      "3C21444F43545950452068746D6C3E",   // <!DOCTYPE html>
      "3C68746D6C3E",                     // <html>
      "3C48544D4C3E",                     // <HTML>
      "894844460D0A1A0A00",               // HDF5 superblock at offset 0
      ("00" * 512) + "894844460D0A1A0A",  // HDF5 after a 512-byte user block
      "DEADBEEF")                         // unknown -> null
    val kase = col("doc_id") % samples.length
    val hexCol = samples.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (hx, i)) => when(kase === i, lit(hx)).otherwise(acc)
    }
    t(s, dir).documents
      .filter(col("doc_id") < 500)
      .select(col("doc_id"),
        graft.functions.Binary.guessMimeType(unhex(hexCol)).as("mime"))
      .orderBy("doc_id")
  }

  val fnMimeSql =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 18 AS INT)
      |    WHEN 0 THEN 'image/png'
      |    WHEN 1 THEN 'image/jpeg'
      |    WHEN 2 THEN 'image/gif'
      |    WHEN 3 THEN 'image/webp'
      |    WHEN 4 THEN 'application/pdf'
      |    WHEN 5 THEN 'application/zip'
      |    WHEN 6 THEN 'audio/mpeg'
      |    WHEN 7 THEN 'audio/mpeg'
      |    WHEN 8 THEN 'audio/wav'
      |    WHEN 9 THEN 'audio/ogg'
      |    WHEN 10 THEN 'video/mp4'
      |    WHEN 11 THEN 'video/mpeg'
      |    WHEN 12 THEN 'text/html'
      |    WHEN 13 THEN 'text/html'
      |    WHEN 14 THEN 'text/html'
      |    WHEN 15 THEN 'application/vnd.hdfgroup.hdf5'
      |    WHEN 16 THEN 'application/vnd.hdfgroup.hdf5'
      |    ELSE NULL
      |  END AS mime
      |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin

  // ---- lists (higher-order functions) ----
  def fn_lists(s: SparkSession, dir: String): DataFrame = {
    t(s, dir).documents
      .filter(col("doc_id") < 100)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        GList.listCount(col("toks")).as("n_toks"),
        GList.listJoin(GList.listSlice(col("toks"), 1, 3), "-").as("first3"),
        // arrays serialized to strings: the driver compare can't hash ndarrays
        GList.listJoin(GList.listSort(GList.listDistinct(col("toks"))), "|").as("uniq_sorted"),
        GList.listContains(col("toks"), lit("data")).as("has_data"),
        GList.listJoin(GList.listMap(col("toks"), x => upper(x)), "|").as("upper_toks"),
        GList.listJoin(GList.listFilter(col("toks"), x => length(x) > 4), "|").as("long_toks"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).as("total_chars"),
        GList.listMin(col("toks")).as("min_tok"),
        GList.listMax(col("toks")).as("max_tok"),
        size(GList.chunk(col("toks"), 5)).as("n_chunks"))
      .orderBy("doc_id")
  }

  val fnListsSql =
    """SELECT doc_id,
      |  len(string_split(text,' ')) AS n_toks,
      |  array_to_string(string_split(text,' ')[1:3], '-') AS first3,
      |  array_to_string(list_sort(list_distinct(string_split(text,' '))), '|') AS uniq_sorted,
      |  list_contains(string_split(text,' '), 'data') AS has_data,
      |  array_to_string(list_transform(string_split(text,' '), x -> upper(x)), '|') AS upper_toks,
      |  array_to_string(list_filter(string_split(text,' '), x -> length(x) > 4), '|') AS long_toks,
      |  CAST(list_aggregate(list_transform(string_split(text,' '), x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT) AS total_chars,
      |  list_aggregate(string_split(text,' '), 'min') AS min_tok,
      |  list_aggregate(string_split(text,' '), 'max') AS max_tok,
      |  CAST(ceil(len(string_split(text,' ')) / 5.0) AS INT) AS n_chunks
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // ---- json (incl. jq-style path expressions, ref str.py:56 .jq()) ----
  def fn_json(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Json => J, Jq}
    t(s, dir).events
      .filter(col("event_id") < 2000)
      // a nested document exercising field chains, quoting, and indexing
      .withColumn("doc", to_json(struct(
        struct(col("event_type").as("t")).as("meta"),
        array(col("event_id"), col("event_id") * 2).as("vals"))))
      .select(
        col("event_id"),
        J.jsonGet(col("props"), "$.k").cast("int").as("k_val"),
        array_join(J.jsonObjectKeys(col("props")), "|").as("keys"),
        J.fromJson(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_typed"),
        J.jsonArrayLength(lit("[1,2,3,4]")).as("arr_len"),
        Jq.jq(col("props"), ".k").as("jq_k"),
        Jq.jq(col("doc"), """."meta" | .t""").as("jq_meta"),
        Jq.jq(col("doc"), ".vals[-1]").as("jq_idx"))
      .orderBy("event_id")
  }

  val fnJsonSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
      |  array_to_string(json_keys(props), '|') AS keys,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
      |  CAST(json_array_length('[1,2,3,4]') AS INT) AS arr_len,
      |  CAST(json_extract(props, '$.k') AS VARCHAR) AS jq_k,
      |  '"' || event_type || '"' AS jq_meta,
      |  CAST(event_id * 2 AS VARCHAR) AS jq_idx
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  // ---- binary: encode/decode + compression round-trips ----
  def fn_binary(s: SparkSession, dir: String): DataFrame = {
    val bytes = GBin.encodeUtf8(col("p_name"))
    t(s, dir).part
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        GBin.encodeBase64(bytes).as("b64"),
        GBin.encodeHex(bytes).as("hexed"),
        GBin.decodeUtf8(GBin.decodeBase64(GBin.encodeBase64(bytes))).as("b64_roundtrip"),
        GBin.lengthBytes(col("p_name")).as("n_bytes"),
        GBin.decodeUtf8(GBin.decompress(GBin.compress(bytes, "gzip"), "gzip")).as("gzip_roundtrip"),
        GBin.decodeUtf8(GBin.decompress(GBin.compress(bytes, "zlib"), "zlib")).as("zlib_roundtrip"),
        (GBin.lengthBytes(GBin.compress(bytes, "gzip")) > 0).as("gzip_nonempty"),
        // try_ variants (r9): well-formed input round-trips; malformed
        // input (raw text as gzip, 0xFF as UTF-8) nulls instead of failing
        GBin.tryDecodeUtf8(GBin.tryDecompress(GBin.compress(bytes, "gzip"), "gzip"))
          .as("try_roundtrip"),
        GBin.tryDecompress(bytes, "gzip").isNull.as("try_bad_gzip_null"),
        GBin.tryDecodeUtf8(bytes).as("try_decode_ok"),
        GBin.tryDecodeUtf8(unhex(lit("FF"))).isNull.as("try_decode_bad_null"))
      .orderBy("p_partkey")
  }

  val fnBinarySql =
    """SELECT p_partkey,
      |  base64(encode(p_name)) AS b64,
      |  hex(encode(p_name)) AS hexed,
      |  p_name AS b64_roundtrip,
      |  octet_length(encode(p_name)) AS n_bytes,
      |  p_name AS gzip_roundtrip,
      |  p_name AS zlib_roundtrip,
      |  true AS gzip_nonempty,
      |  p_name AS try_roundtrip,
      |  true AS try_bad_gzip_null,
      |  p_name AS try_decode_ok,
      |  true AS try_decode_bad_null
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin

  // ---- conditional / null expressions (Expr::IfElse/IsIn/Between/...) ----
  def fn_conditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir).orders
      .filter(col("o_orderkey") < 3000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        col("o_orderstatus").isin("F", "P").as("is_done_or_pending"),
        col("o_totalprice").between(50000, 150000).as("in_band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
        (col("o_orderstatus") <=> lit("F")).as("nsafe_f"),
        try_divide(col("o_totalprice"), col("o_custkey") % 3).as("try_div"),
        col("o_orderkey").cast("string").as("key_str"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"))
      .orderBy("o_orderkey")

  val fnConditionalSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
      |  o_orderstatus IN ('F','P') AS is_done_or_pending,
      |  o_totalprice BETWEEN 50000 AND 150000 AS in_band,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
      |  o_orderstatus IS NOT DISTINCT FROM 'F' AS nsafe_f,
      |  CASE WHEN o_custkey % 3 = 0 THEN NULL
      |       ELSE o_totalprice / (o_custkey % 3) END AS try_div,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  try_cast(o_orderpriority AS INT) AS bad_cast
      |FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin

  // ---- hash functions: engine-specific values, injectivity invariants ----
  def fn_hash(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .agg(
        countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_exact"),
        (countDistinct(GMisc.hash64(col("l_partkey"), col("l_suppkey"))) ===
          countDistinct(col("l_partkey"), col("l_suppkey"))).as("h64_injective"),
        (countDistinct(GMisc.hash32(col("l_partkey"), col("l_suppkey"))) <=
          countDistinct(col("l_partkey"), col("l_suppkey"))).as("h32_sane"))

  val fnHashSql =
    """SELECT count(DISTINCT (l_partkey, l_suppkey)) AS nd_exact,
      |  true AS h64_injective, true AS h32_sane
      |FROM lineitem""".stripMargin

  /** UUIDv7 construction + timestamp-part extraction (ref misc.py `uuid`,
    * `extract_*_uuid7`): build v7 uuids whose 48-bit prefix encodes a
    * known millisecond value, then extract the parts back from the STRING
    * only — a cross-check of the RFC 9562 layout in both directions. The
    * random bits differ per run; only the extracted parts are compared. */
  def fn_uuid7(s: SparkSession, dir: String): DataFrame = {
    val ms = (col("o_orderkey") * lit(3061007L)).as("ms") // varies month/day/hour/min
    val u = GMisc.uuid7At(col("ms"))
    t(s, dir).orders.filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), ms)
      .withColumn("u", u)
      .select(
        col("o_orderkey"),
        (GMisc.uuid7Millis(col("u")) === col("ms")).as("ms_roundtrip"),
        GMisc.extractMonthUuid7(col("u")).as("mo"),
        GMisc.extractDayUuid7(col("u")).as("d"),
        GMisc.extractHourUuid7(col("u")).as("h"),
        GMisc.extractMinuteUuid7(col("u")).as("mi"))
      .orderBy("o_orderkey")
  }

  val fnUuid7Sql =
    """SELECT o_orderkey, true AS ms_roundtrip,
      |  month(epoch_ms(o_orderkey * 3061007)) AS mo,
      |  day(epoch_ms(o_orderkey * 3061007)) AS d,
      |  hour(epoch_ms(o_orderkey * 3061007)) AS h,
      |  minute(epoch_ms(o_orderkey * 3061007)) AS mi
      |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin

  /** value_counts over token lists (ref list.py value_counts): map of
    * element→count, exploded to rows for the oracle compare. */
  def fn_value_counts(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Lists => GLists}
    t(s, dir).documents.filter(col("doc_id") < 60)
      .select(col("doc_id"),
        explode(GLists.valueCounts(split(lower(col("text")), " "))).as("wc"))
      .select(col("doc_id"), col("wc.value").as("word"), col("wc.count").as("cnt"))
      .orderBy("doc_id", "word")
  }

  val fnValueCountsSql =
    """SELECT doc_id, word, count(*) AS cnt FROM (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents WHERE doc_id < 60)
      |GROUP BY doc_id, word ORDER BY doc_id, word""".stripMargin

  // ---- embedding distances (HOFs over array<float>) vs DuckDB list fns ----
  def fn_embedding_distance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).embeddings
    val a = e.filter(col("vec_id") < 15)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.filter(col("vec_id") >= 15 && col("vec_id") < 30)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .select(
        col("id_a"), col("id_b"),
        GDist.cosineSimilarity(col("va"), col("vb")).as("cos_sim"),
        GDist.dotProduct(col("va"), col("vb")).as("dot"),
        GDist.euclideanDistance(col("va"), col("vb")).as("l2"))
      .orderBy("id_a", "id_b")
  }

  val fnEmbeddingDistanceSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos_sim,
      |  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS dot,
      |  list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS l2
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < 15 AND b.vec_id >= 15 AND b.vec_id < 30
      |ORDER BY id_a, id_b""".stripMargin

  // ---- minhash/simhash invariants: exact duplicates collide, signature
  // length fixed, hamming(simhash self-dup)=0 ----
  def fn_minhash_simhash(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir).documents.filter(col("doc_id") < 100)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("mh", GMisc.minhash(col("toks"), 16))
      .withColumn("sh", GMisc.simhash(col("toks")))
    val dup = docs.select(col("doc_id").as("doc_id_b"), col("toks").as("toks_b"),
      col("mh").as("mh_b"), col("sh").as("sh_b"))
    docs.join(dup, col("doc_id") === col("doc_id_b"))
      .select(
        col("doc_id"),
        size(col("mh")).as("sig_len"),
        (col("mh") === col("mh_b")).as("mh_self_eq"),
        GMisc.simhashHamming(col("sh"), col("sh_b")).as("sh_self_dist"))
      .orderBy("doc_id")
  }

  val fnMinhashSimhashSql =
    """SELECT doc_id, 16 AS sig_len, true AS mh_self_eq, CAST(0 AS BIGINT) AS sh_self_dist
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** URL parsing (ref daft/functions/url.py parse_url; download/upload need
    * network IO — see Multimodal notes). Synthetic URLs built from table
    * columns, parsed with Spark's parse_url. */
  def fn_url(s: SparkSession, dir: String): DataFrame =
    t(s, dir).customer
      .filter(col("c_custkey") <= 300)
      .withColumn("url",
        concat(lit("https://shop.example.com/seg/"), lower(col("c_mktsegment")),
          lit("/cust?(id)="), col("c_custkey"), lit("&n="), col("c_nationkey")))
      .select(
        col("c_custkey"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("n")).as("q_n"))
      .orderBy("c_custkey")

  val fnUrlSql =
    """SELECT c_custkey,
      |  'https' AS proto,
      |  'shop.example.com' AS host,
      |  '/seg/' || lower(c_mktsegment) || '/cust' AS path,
      |  '(id)=' || c_custkey || '&n=' || c_nationkey AS query,
      |  CAST(c_nationkey AS VARCHAR) AS q_n
      |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin

  /** url.download + url.upload round-trip (ref daft/functions/url.py:44-149):
    * write each document's bytes to a file:// location with deterministic
    * names, download them back through the bounded-concurrency fetcher, and
    * verify content equality against the source column — a real-bytes value
    * oracle, not a plumbing check. */
  def fn_url_download(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlIO
    val base = s"/tmp/graft_urlio_${math.abs(dir.hashCode)}"
    val docs = t(s, dir).documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("fname"))
    val uploaded = UrlIO.upload(docs, "payload", base, "url", nameCol = Some("fname"))
    val fetched = UrlIO.download(uploaded, "url", "bytes", maxConnections = 8)
    fetched.select(
      col("doc_id"),
      decode(col("bytes"), "UTF-8").as("fetched_text"),
      octet_length(col("bytes")).as("n_bytes"))
      .orderBy("doc_id")
  }

  val fnUrlDownloadSql =
    """SELECT doc_id, text AS fetched_text,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** Bitwise namespace (ref daft/functions/bitwise.py: and/or/xor,
    * shift_left/shift_right) — all native Catalyst operators, codegen'd. */
  def fn_bitwise(s: SparkSession, dir: String): DataFrame =
    t(s, dir).lineitem
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("band"),
        (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("bor"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("bxor"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_partkey").cast("int"), 2).as("shr"),
        bitwise_not(col("l_linenumber")).as("bnot"),
        bit_count(col("l_partkey")).as("popcount"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")

  val fnBitwiseSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_orderkey & l_partkey AS band,
      |  l_orderkey | l_partkey AS bor,
      |  xor(l_orderkey, l_partkey) AS bxor,
      |  CAST(l_linenumber << 3 AS INT) AS shl,
      |  CAST(l_partkey >> 2 AS INT) AS shr,
      |  CAST(~l_linenumber AS INT) AS bnot,
      |  CAST(bit_count(l_partkey) AS INT) AS popcount
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin

  /** Spatial namespace (ref daft/functions/spatial.py
    * great_circle_distance): haversine over synthetic lat/lon derived from
    * table columns — a pure Column expression chain, codegen'd. */
  def fn_spatial(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Spatial
    t(s, dir).customer
      .filter(col("c_custkey") <= 300)
      .withColumn("lat1", (col("c_custkey") % 180) - 90.0)
      .withColumn("lon1", (col("c_custkey") % 360) - 180.0)
      .withColumn("lat2", (col("c_nationkey") * 7 % 180) - 90.0)
      .withColumn("lon2", (col("c_nationkey") * 13 % 360) - 180.0)
      .select(
        col("c_custkey"),
        round(Spatial.greatCircleDistance(
          col("lat1"), col("lon1"), col("lat2"), col("lon2")), 4).as("dist_km"))
      .orderBy("c_custkey")
  }

  val fnSpatialSql =
    """WITH pts AS (
      |  SELECT c_custkey,
      |    (c_custkey % 180) - 90.0 AS lat1, (c_custkey % 360) - 180.0 AS lon1,
      |    (c_nationkey * 7 % 180) - 90.0 AS lat2, (c_nationkey * 13 % 360) - 180.0 AS lon2
      |  FROM customer WHERE c_custkey <= 300)
      |SELECT c_custkey,
      |  round(2 * 6371.0088 * asin(sqrt(
      |    pow(sin(radians(lat2 - lat1) / 2), 2) +
      |    cos(radians(lat1)) * cos(radians(lat2)) *
      |    pow(sin(radians(lon2 - lon1) / 2), 2))), 4) AS dist_km
      |FROM pts ORDER BY c_custkey""".stripMargin

  /** Struct/Map namespace (ref daft/functions/struct.py + map helpers):
    * construction, field/key access, keys/values extraction. */
  def fn_struct_map(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Structs => St}
    t(s, dir).part
      .filter(col("p_partkey") <= 300)
      .withColumn("m", St.mapFromArrays(
        array(lit("brand"), lit("type")), array(col("p_brand"), col("p_type"))))
      .withColumn("st", St.toStruct(col("p_size").as("size"), col("p_retailprice").as("price")))
      .select(
        col("p_partkey"),
        St.mapGet(col("m"), lit("brand")).as("brand_val"),
        array_join(St.mapKeys(col("m")), ",").as("keys_joined"),
        array_join(St.mapValues(col("m")), ",").as("vals_joined"),
        St.get(col("st"), "size").as("size_field"),
        (St.get(col("st"), "price") * 2).as("price_x2"))
      .orderBy("p_partkey")
  }

  val fnStructMapSql =
    """SELECT p_partkey,
      |  map(['brand','type'], [p_brand, p_type])['brand'][1] AS brand_val,
      |  'brand,type' AS keys_joined,
      |  p_brand || ',' || p_type AS vals_joined,
      |  p_size AS size_field,
      |  p_retailprice * 2 AS price_x2
      |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin

  /** Partitioning transforms (ref daft/functions/partition.py: days/months/
    * years, iceberg bucket/truncate). Bucket values are hash-specific, so
    * the checked invariant is range + totality; the rest is exact. */
  def fn_partitioning(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Partitioning => P}
    t(s, dir).orders
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        P.days(col("o_orderdate")).as("p_day"),
        P.months(col("o_orderdate")).as("p_month"),
        P.years(col("o_orderdate")).as("p_year"),
        P.truncate(1000, col("o_totalprice")).as("p_price_trunc"),
        (P.bucket(16, col("o_custkey")) >= 0 && P.bucket(16, col("o_custkey")) < 16)
          .as("bucket_in_range"))
      .orderBy("o_orderkey")
  }

  val fnPartitioningSql =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS p_day,
      |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS p_month,
      |  year(o_orderdate) AS p_year,
      |  CAST(floor(o_totalprice / 1000) * 1000 AS BIGINT) AS p_price_trunc,
      |  true AS bucket_in_range
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin

  /** metrics() (ref `dataframe.py:247` — per-plan-node runtime stats after
    * materialization): run a bounded aggregation through
    * [[graft.ops.ExecMetrics.collectWithMetrics]] and read the scan/result
    * stats off the executed plan's SQLMetrics. The oracle pins the scan's
    * numOutputRows to the table row count (no filter, so pushdown can't
    * shrink it) and the result cardinality to the group count. */
  def fn_exec_metrics(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir).orders
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val (rows, m) = graft.ops.ExecMetrics.collectWithMetrics(q)
    val scanRows = graft.ops.ExecMetrics.metricSum(m, "Scan", "numOutputRows")
    import s.implicits._
    Seq((scanRows, rows.length.toLong, rows.map(_.getLong(1)).sum))
      .toDF("scan_rows", "result_rows", "total_n")
  }

  val fnExecMetricsSql =
    """SELECT CAST(count(*) AS BIGINT) AS scan_rows,
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS result_rows,
      |  CAST(count(*) AS BIGINT) AS total_n
      |FROM orders""".stripMargin

  val queries: Map[String, Q] = Map(
    "fn_exec_metrics" -> (fn_exec_metrics _),
    "fn_partitioning" -> (fn_partitioning _),
    "fn_struct_map" -> (fn_struct_map _),
    "fn_url" -> (fn_url _),
    "fn_url_download" -> (fn_url_download _),
    "fn_bitwise" -> (fn_bitwise _),
    "fn_spatial" -> (fn_spatial _),
    "fn_strings_basic" -> (fn_strings_basic _),
    "fn_strings_case" -> (fn_strings_case _),
    "fn_strings_distance" -> (fn_strings_distance _),
    "fn_strings_regex" -> (fn_strings_regex _),
    "fn_numeric" -> (fn_numeric _),
    "fn_datetime" -> (fn_datetime _),
    "fn_datetime_tz" -> (fn_datetime_tz _),
    "fn_columnar" -> (fn_columnar _),
    "fn_mime" -> (fn_mime _),
    "fn_lists" -> (fn_lists _),
    "fn_json" -> (fn_json _),
    "fn_binary" -> (fn_binary _),
    "fn_conditional" -> (fn_conditional _),
    "fn_hash" -> (fn_hash _),
    "fn_uuid7" -> (fn_uuid7 _),
    "fn_value_counts" -> (fn_value_counts _),
    "fn_embedding_distance" -> (fn_embedding_distance _),
    "fn_minhash_simhash" -> (fn_minhash_simhash _))

  val oracle: Map[String, String] = Map(
    "fn_exec_metrics" -> fnExecMetricsSql,
    "fn_partitioning" -> fnPartitioningSql,
    "fn_struct_map" -> fnStructMapSql,
    "fn_url" -> fnUrlSql,
    "fn_url_download" -> fnUrlDownloadSql,
    "fn_bitwise" -> fnBitwiseSql,
    "fn_spatial" -> fnSpatialSql,
    "fn_strings_basic" -> fnStringsBasicSql,
    "fn_strings_case" -> fnStringsCaseSql,
    "fn_strings_distance" -> fnStringsDistanceSql,
    "fn_strings_regex" -> fnStringsRegexSql,
    "fn_numeric" -> fnNumericSql,
    "fn_datetime" -> fnDatetimeSql,
    "fn_datetime_tz" -> fnDatetimeTzSql,
    "fn_columnar" -> fnColumnarSql,
    "fn_mime" -> fnMimeSql,
    "fn_lists" -> fnListsSql,
    "fn_json" -> fnJsonSql,
    "fn_binary" -> fnBinarySql,
    "fn_conditional" -> fnConditionalSql,
    "fn_hash" -> fnHashSql,
    "fn_uuid7" -> fnUuid7Sql,
    "fn_value_counts" -> fnValueCountsSql,
    "fn_embedding_distance" -> fnEmbeddingDistanceSql,
    "fn_minhash_simhash" -> fnMinhashSimhashSql)
}
