package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String function namespace — mirrors the reference's `daft/functions/str.py`
  * surface. ~90% delegates to codegen'd Spark builtins; the gaps (jaro /
  * jaro-winkler / damerau distances, case converters, count_matches) are
  * Scala UDFs (SURVEY §7.1: UDF first, promote hot paths to Expressions).
  */
object Strings {

  // ---- direct delegations (Spark builtins, fully codegen'd) ----
  def contains(c: Column, sub: String): Column = c.contains(sub)
  def split(c: Column, pat: String): Column = org.apache.spark.sql.functions.split(c, pat)
  def lower(c: Column): Column = org.apache.spark.sql.functions.lower(c)
  def upper(c: Column): Column = org.apache.spark.sql.functions.upper(c)
  def lstrip(c: Column): Column = ltrim(c)
  def rstrip(c: Column): Column = rtrim(c)
  def strip(c: Column): Column = trim(c)
  def reverseStr(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
  def capitalize(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c))))
  def left(c: Column, n: Int): Column = c.substr(lit(1), lit(n))
  def right(c: Column, n: Int): Column =
    when(length(c) <= n, c).otherwise(c.substr(length(c) - n + 1, lit(n)))
  def lpad(c: Column, len: Int, pad: String): Column =
    org.apache.spark.sql.functions.lpad(c, len, pad)
  def rpad(c: Column, len: Int, pad: String): Column =
    org.apache.spark.sql.functions.rpad(c, len, pad)
  def repeatStr(c: Column, n: Int): Column = org.apache.spark.sql.functions.repeat(c, n)
  def like(c: Column, pat: String): Column = c.like(pat)
  def ilike(c: Column, pat: String): Column = c.ilike(pat)
  def substr(c: Column, start: Column, len: Column): Column = c.substr(start, len)
  def endswith(c: Column, suffix: String): Column = c.endsWith(suffix)
  def startswith(c: Column, prefix: String): Column = c.startsWith(prefix)
  def lengthBytes(c: Column): Column = octet_length(c)
  def find(c: Column, sub: String): Column = instr(c, sub) - 1 // 0-based like the reference
  def translate(c: Column, from: String, to: String): Column =
    org.apache.spark.sql.functions.translate(c, from, to)
  def substringIndex(c: Column, delim: String, count: Int): Column =
    substring_index(c, delim, count)
  def soundexStr(c: Column): Column = soundex(c)
  def asciiStr(c: Column): Column = ascii(c)
  def chrStr(c: Column): Column = char(c)
  def space(n: Column): Column = repeat(lit(" "), n.cast("int"))
  def format(fmt: String, cols: Column*): Column = format_string(fmt, cols: _*)
  def concatWs(sep: String, cols: Column*): Column =
    concat_ws(sep, cols: _*)
  def normalize(c: Column): Column = // whitespace-collapse + trim + lowercase
    lower(trim(regexp_replace(c, "\\s+", " ")))

  // regex family (Java regex on the Spark side — keep patterns in the
  // RE2-compatible subset when oracle parity with DuckDB is required)
  def regexpMatch(c: Column, pat: String): Column = c.rlike(pat)
  def regexpExtract(c: Column, pat: String, group: Int): Column =
    regexp_extract(c, pat, group)
  def regexpExtractAll(c: Column, pat: String, group: Int): Column =
    regexp_extract_all(c, lit(pat), lit(group))
  def regexpReplace(c: Column, pat: String, rep: String): Column =
    regexp_replace(c, pat, rep)
  def regexpSplit(c: Column, pat: String): Column =
    org.apache.spark.sql.functions.split(c, pat)
  def regexpCount(c: Column, pat: String): Column = regexp_count(c, lit(pat))
  def countMatches(c: Column, sub: String): Column =
    when(length(lit(sub)) === 0, lit(0)).otherwise(
      ((length(c) - length(replace(c, lit(sub), lit("")))) / length(lit(sub))).cast("int"))
  def levenshteinDist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.levenshtein(a, b)

  // ---- case converters (ref str.py:645-699) — UDFs ----
  private def splitWords(s: String): Array[String] =
    s.split("[^A-Za-z0-9]+")
      .flatMap(_.split("(?<=[a-z0-9])(?=[A-Z])"))
      .filter(_.nonEmpty)

  val camelCaseUdf = udf { s: String =>
    if (s == null) null
    else {
      val w = splitWords(s)
      if (w.isEmpty) ""
      else (w.head.toLowerCase +: w.tail.map(x => x.head.toUpper + x.tail.toLowerCase)).mkString
    }
  }
  val snakeCaseUdf = udf { s: String =>
    if (s == null) null else splitWords(s).map(_.toLowerCase).mkString("_")
  }
  val kebabCaseUdf = udf { s: String =>
    if (s == null) null else splitWords(s).map(_.toLowerCase).mkString("-")
  }
  val titleCaseUdf = udf { s: String =>
    if (s == null) null
    else splitWords(s).map(x => x.head.toUpper + x.tail.toLowerCase).mkString(" ")
  }
  val upperCamelCaseUdf = udf { s: String =>
    if (s == null) null
    else splitWords(s).map(x => x.head.toUpper + x.tail.toLowerCase).mkString
  }
  def camelCase(c: Column): Column = camelCaseUdf(c)
  def snakeCase(c: Column): Column = snakeCaseUdf(c)
  def kebabCase(c: Column): Column = kebabCaseUdf(c)
  def titleCase(c: Column): Column = titleCaseUdf(c)
  // SCREAMING variants (ref str.py to_upper_{camel,snake,kebab}_case)
  def upperCamelCase(c: Column): Column = upperCamelCaseUdf(c)
  def upperSnakeCase(c: Column): Column = upper(snakeCaseUdf(c))
  def upperKebabCase(c: Column): Column = upper(kebabCaseUdf(c))

  // ---- string distances (ref str.py:1580-1730) — UDFs, semantics match
  // the standard definitions (and DuckDB's, used as the test oracle) ----

  /** Hamming distance; null when lengths differ (standard definition). */
  val hammingUdf = udf { (a: String, b: String) =>
    if (a == null || b == null || a.length != b.length) None
    else Some(a.zip(b).count { case (x, y) => x != y }.toLong)
  }
  def hamming(a: Column, b: Column): Column = hammingUdf(a, b)

  /** Jaro similarity (standard: match window = max(len)/2 - 1). */
  private[graft] def jaroSim(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bM(j) && a(i) == b(j)) { aM(i) = true; bM(j) = true; matches += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  val jaroUdf = udf { (a: String, b: String) =>
    if (a == null || b == null) None else Some(jaroSim(a, b))
  }
  def jaro(a: Column, b: Column): Column = jaroUdf(a, b)

  /** Jaro-Winkler similarity (p=0.1, boost threshold 0.7, prefix ≤ 4). */
  val jaroWinklerUdf = udf { (a: String, b: String) =>
    if (a == null || b == null) None
    else {
      val j = jaroSim(a, b)
      if (j <= 0.7) Some(j)
      else {
        val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
        Some(j + prefix * 0.1 * (1 - j))
      }
    }
  }
  def jaroWinkler(a: Column, b: Column): Column = jaroWinklerUdf(a, b)

  /** Damerau-Levenshtein (full, with adjacent transpositions). */
  val damerauUdf = udf { (a: String, b: String) =>
    if (a == null || b == null) None
    else {
      val (la, lb) = (a.length, b.length)
      val inf = la + lb
      val d = Array.ofDim[Int](la + 2, lb + 2)
      d(0)(0) = inf
      for (i <- 0 to la) { d(i + 1)(1) = i; d(i + 1)(0) = inf }
      for (j <- 0 to lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf }
      val last = scala.collection.mutable.Map[Char, Int]().withDefaultValue(0)
      for (i <- 1 to la) {
        var db = 0
        for (j <- 1 to lb) {
          val i1 = last(b(j - 1))
          val j1 = db
          val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
          d(i + 1)(j + 1) = math.min(
            math.min(d(i)(j) + cost, math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)),
            d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))
        }
        last(a(i - 1)) = i
      }
      Some(d(la + 1)(lb + 1).toLong)
    }
  }
  def damerauLevenshtein(a: Column, b: Column): Column = damerauUdf(a, b)
}
