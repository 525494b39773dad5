package graft

import graft.functions.{Distance => GDist, Misc => GMisc, Strings => GStr}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("jaro similarity matches known values") {
    assert(math.abs(GStr.jaroSim("martha", "marhta") - 0.9444444444444445) < 1e-12)
    assert(GStr.jaroSim("", "") == 1.0)
    assert(GStr.jaroSim("abc", "") == 0.0)
    assert(GStr.jaroSim("abc", "abc") == 1.0)
  }

  test("string distance UDFs on a DataFrame") {
    val df = Seq(("martha", "marhta"), ("ca", "abc"), ("abc", "abd"))
      .toDF("a", "b")
      .select(
        GStr.jaroWinkler($"a", $"b").as("jw"),
        GStr.damerauLevenshtein($"a", $"b").as("dl"),
        GStr.hamming($"a", $"b").as("ham"))
      .collect()
    assert(math.abs(df(0).getDouble(0) - 0.9611111111111111) < 1e-12) // martha/marhta
    assert(df(1).getLong(1) == 2) // ca->abc full damerau-levenshtein
    assert(df(2).getLong(2) == 1) // abc vs abd
    assert(df(1).isNullAt(2))     // hamming undefined for unequal lengths
  }

  test("case converters") {
    val r = Seq("hello worldFoo x9").toDF("s")
      .select(
        GStr.camelCase($"s"), GStr.snakeCase($"s"),
        GStr.kebabCase($"s"), GStr.titleCase($"s"))
      .head()
    assert(r.getString(0) == "helloWorldFooX9")
    assert(r.getString(1) == "hello_world_foo_x9")
    assert(r.getString(2) == "hello-world-foo-x9")
    assert(r.getString(3) == "Hello World Foo X9")
  }

  test("guessMimeType: every signature, the HDF5 user-block offsets, unknown -> null") {
    import graft.functions.Binary
    def mimeOfHex(hx: String): Option[String] = {
      val r = Seq(hx).toDF("h")
        .select(Binary.guessMimeType(unhex($"h")).as("m")).head()
      Option(r.getString(0))
    }
    assert(mimeOfHex("89504E470D0A1A0A00").contains("image/png"))
    assert(mimeOfHex("FFD8FFE0").contains("image/jpeg"))
    assert(mimeOfHex("47494638396101").contains("image/gif"))
    // RIFF disambiguation: WEBP vs WAVE by the byte at offset 8
    assert(mimeOfHex("524946460000000057454250").contains("image/webp"))
    assert(mimeOfHex("524946460000000057415645").contains("audio/wav"))
    // a short RIFF prefix (no offset-8 tag) matches neither
    assert(mimeOfHex("52494646").isEmpty)
    assert(mimeOfHex("25504446").contains("application/pdf"))
    assert(mimeOfHex("504B0304").contains("application/zip"))
    assert(mimeOfHex("494433").contains("audio/mpeg"))
    assert(mimeOfHex("FFFB90").contains("audio/mpeg"))
    assert(mimeOfHex("4F676753").contains("audio/ogg"))
    assert(mimeOfHex("0000001866747970").contains("video/mp4"))
    assert(mimeOfHex("000001BA").contains("video/mpeg"))
    assert(mimeOfHex("3C21444F4354595045").contains("text/html"))
    assert(mimeOfHex("3C68746D6C").contains("text/html"))
    assert(mimeOfHex("3C48544D4C").contains("text/html"))
    val hdf5 = "894844460D0A1A0A"
    assert(mimeOfHex(hdf5).contains("application/vnd.hdfgroup.hdf5"))
    // superblock after a user block at every documented offset
    for (off <- Seq(512, 1024, 2048, 4096))
      assert(mimeOfHex(("00" * off) + hdf5).contains("application/vnd.hdfgroup.hdf5"),
        s"offset $off")
    // offset 256 is NOT a valid superblock location
    assert(mimeOfHex(("00" * 256) + hdf5).isEmpty)
    assert(mimeOfHex("DEADBEEF").isEmpty)
    assert(mimeOfHex("").isEmpty)
  }

  test("columns_* horizontal aggregation: null skipping and all-null") {
    import graft.functions.{Columnar => C}
    val r = Seq((1.0, 4.0)).toDF("a", "b")
      .select(
        C.columnsSum($"a", $"b").as("s"),
        C.columnsMean($"a", $"b").as("m"),
        C.columnsMin($"a", $"b").as("lo"),
        C.columnsMax($"a", $"b").as("hi"),
        C.columnsSum($"a", lit(null).cast("double")).as("s_null"),
        C.columnsMean($"a", lit(null).cast("double")).as("m_null"),
        C.columnsSum(lit(null).cast("double"), lit(null).cast("double")).as("all_null"))
      .head()
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 2.5)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 1.0) // null element skipped, not poisoning
    assert(r.getDouble(5) == 1.0) // mean over the one valid value
    assert(r.isNullAt(6))         // no valid values -> null
  }

  test("timezone functions: convert preserves the instant, replace preserves the wall-clock") {
    import graft.functions.{Dt => D}
    val df = Seq("2024-03-10 12:00:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val r = df.select(
      date_format(D.convertTimeZone($"ts", "+05:30"), "yyyy-MM-dd HH:mm:ss").as("ist"),
      unix_timestamp(D.replaceTimeZone($"ts", Some("+05:30"))).as("relabel"),
      unix_timestamp($"ts").as("epoch"),
      D.nanosecond(to_timestamp(lit("2024-01-01 00:00:00.123456"))).as("nanos"),
      D.totalNanoseconds(to_timestamp(lit("2024-01-01 00:00:01.5")) -
        to_timestamp(lit("2024-01-01 00:00:00"))).as("dur_ns"),
      unix_timestamp(D.makeTimestampLtz(lit(2024), lit(3), lit(10), lit(12),
        lit(0), lit(0.0), Some("+02:00"))).as("ltz")).head()
    assert(r.getString(0) == "2024-03-10 17:30:00") // +5:30 wall-clock, same instant
    assert(r.getLong(1) == r.getLong(2) - 19800)    // same wall-clock read in +5:30
    assert(r.getLong(3) == 123456000L)
    assert(r.getLong(4) == 1500000000L)
    assert(r.getLong(5) == r.getLong(2) - 7200)     // components interpreted in +02:00
  }

  test("struct unnest flattens fields into top-level columns") {
    import graft.functions.Structs
    val df = Seq((1L, ("a", 2.5))).toDF("id", "s")
    val out = Structs.unnest(df, "s")
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.getDouble(2) == 2.5)
  }

  test("named-zone convert across the 2024 US DST boundary") {
    import graft.functions.{Dt => D}
    val df = Seq("2024-03-10 06:59:00", "2024-03-10 07:01:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val got = df.select(
      date_format(D.convertTimeZone($"ts", "America/New_York"), "HH:mm").as("wall"))
      .collect().map(_.getString(0)).toSeq
    // 06:59Z is 01:59 EST (-5); 07:01Z is 03:01 EDT (-4): the 2-5am gap
    assert(got == Seq("01:59", "03:01"))
  }

  test("convertTimeZone preserves the instant under a NON-UTC session zone") {
    // ADVICE r11: the default fromTz was a hardcoded 'UTC', only correct
    // because graft pins the session zone to UTC — it now derives from
    // current_timezone(), so a Tokyo session still converts instants right
    import graft.functions.{Dt => D}
    val old = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // Tokyo wall-clocks parsed in the Tokyo session = instants
      // 06:59Z / 07:01Z — the same pair as the DST test above
      val got = Seq("2024-03-10 15:59:00", "2024-03-10 16:01:00").toDF("s")
        .select(D.convertTimeZone(to_timestamp($"s"), "America/New_York").as("ny"))
        .select(date_format($"ny", "HH:mm"))
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("01:59", "03:01"),
        s"instant must survive a non-UTC session zone, got $got")
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("resilient udf: retries recover transients, error policies hold") {
    import graft.functions.ResilientUdf
    val attempts = scala.collection.concurrent.TrieMap.empty[Long, Int]
    def flaky(failures: Int)(x: Long): Long = {
      val n = attempts.updateWith(x) { c => Some(c.getOrElse(0) + 1) }.get
      if (n <= failures) throw new RuntimeException(s"transient #$n for $x")
      x * 10
    }
    // two transient failures per key, three attempts allowed -> succeeds
    attempts.clear()
    val ok = Seq(1L, 2L).toDF("x")
      .select(udf(ResilientUdf.resilient(flaky(2), maxRetries = 2)).apply($"x").as("y"))
      .collect().map(_.getLong(0)).sorted
    assert(ok.toSeq == Seq(10L, 20L))
    // always-failing + ignore -> null rows, no exception
    val nulls = Seq(3L).toDF("x")
      .select(udf(ResilientUdf.resilient((_: Long) => {
        throw new RuntimeException("boom"); 0L }, maxRetries = 1,
        onError = "ignore")).apply($"x"))
      .collect()
    assert(nulls.head.isNullAt(0))
    // always-failing + raise -> propagates
    intercept[Exception] {
      Seq(4L).toDF("x")
        .select(udf(ResilientUdf.resilient((_: Long) => {
          throw new RuntimeException("boom"); 0L })).apply($"x"))
        .collect()
    }
    intercept[IllegalArgumentException] {
      ResilientUdf.resilient((x: Long) => x, onError = "explode")
    }
  }

  test("resilient udf 'log' is bounded: 10k-failure column logs first-N then counts") {
    import graft.functions.ResilientUdf
    // drive the wrapped function directly on one thread (one task's view):
    // Spark would spread rows over tasks, hiding the per-task counter
    ResilientUdf.resetLogCounters()
    val g = ResilientUdf.resilient((_: Long) => {
      throw new RuntimeException("always"); 0L }, onError = "log")
    val n = 10000
    (0 until n).foreach(i => assert(g(i.toLong).isEmpty))
    val (logged, suppressed) = ResilientUdf.logCounters()
    assert(logged == ResilientUdf.MaxLoggedPerTask.toLong,
      s"full log lines capped at the per-task limit, got $logged")
    assert(suppressed == (n - ResilientUdf.MaxLoggedPerTask).toLong,
      s"every further failure counted, got $suppressed")
    ResilientUdf.resetLogCounters()
  }

  test("native cosine expression is bit-identical to the HOF formulation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.25f, 8.0f), Array(1.5f, 0.75f, -2.0f)))
      .toDF("a", "b")
      .select(
        GDist.cosineSimilarity($"a", $"b").as("hof"),
        GDist.cosineSimilarityNative($"a", $"b").as("native"))
      .collect()
    df.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // known value: cos((1,2,3),(3,2,1)) = 10/14
    assert(math.abs(df(0).getDouble(1) - 10.0 / 14.0) < 1e-15)
  }

  test("minhash signatures: identical inputs collide, k respected") {
    val s1 = GMisc.minhashSignature(Seq("a b c", "b c d"), 32, 1L)
    val s2 = GMisc.minhashSignature(Seq("b c d", "a b c"), 32, 1L) // order-insensitive
    assert(s1.length == 32 && s1.sameElements(s2))
    val s3 = GMisc.minhashSignature(Seq("x y z"), 32, 1L)
    assert(!s1.sameElements(s3))
  }

  test("simhash: identical token sets collide; hamming of disjoint sets > 0") {
    val a = GMisc.simhash64(Seq("a", "b", "c"), 0L)
    val b = GMisc.simhash64(Seq("c", "b", "a"), 0L)
    assert(a == b)
    val c = GMisc.simhash64(Seq("x", "y", "z", "w", "v"), 0L)
    assert(java.lang.Long.bitCount(a ^ c) > 0)
  }

  test("jq-lite: field chains, quoted keys, indices, iteration, pipes") {
    import graft.functions.Jq
    val doc = """{"a":{"b c":[1,2,{"d":"x"}]},"n":null}"""
    assert(Jq.eval(doc, """.a."b c"[0]""") == Some("1"))
    assert(Jq.eval(doc, """.a."b c"[-1].d""") == Some("\"x\""))
    assert(Jq.eval(doc, """.a | ."b c" | .[1]""") == Some("2"))
    assert(Jq.eval(doc, ".n") == Some("null"))
    assert(Jq.eval(doc, ".missing") == None)
    assert(Jq.eval(doc, """.a."b c"[]""").get.linesIterator.size == 3)
    assert(Jq.eval("not json", ".a") == None)
  }

  test("binary codecs round-trip") {
    val payload = "graft engine éü payload".getBytes("UTF-8")
    val df = Seq(Tuple1(payload)).toDF("b")
    for (codec <- Seq("gzip", "zlib", "deflate")) {
      val rt = df.select(
        graft.functions.Binary.decompress(
          graft.functions.Binary.compress($"b", codec), codec).as("rt"))
        .head().getAs[Array[Byte]]("rt")
      assert(rt.sameElements(payload), s"codec $codec failed round-trip")
    }
  }

  test("uuid v4/v7 format, v7 time ordering and distinctness") {
    import graft.functions.{Misc => GM}
    import org.apache.spark.sql.functions._
    val df = (1 to 200).toDF("i")
      .withColumn("u4", GM.uuidGen("v4"))
      .withColumn("u7", GM.uuidGen("v7"))
      .withColumn("u7At", GM.uuid7At(lit(1700000000123L)))
      .cache()
    val rows = df.collect()
    val hex = "[0-9a-f]"
    val v4re = s"$hex{8}-$hex{4}-4$hex{3}-[89ab]$hex{3}-$hex{12}".r
    val v7re = s"$hex{8}-$hex{4}-7$hex{3}-[89ab]$hex{3}-$hex{12}".r
    rows.foreach { r =>
      assert(v4re.matches(r.getAs[String]("u4")), r.getAs[String]("u4"))
      assert(v7re.matches(r.getAs[String]("u7")), r.getAs[String]("u7"))
    }
    assert(rows.map(_.getAs[String]("u4")).distinct.length == 200)
    assert(rows.map(_.getAs[String]("u7At")).distinct.length == 200, "random bits differ per row")
    // fixed-ms v7 decodes back to its timestamp
    val ms = df.select(GM.uuid7Millis(col("u7At"))).head().getLong(0)
    assert(ms == 1700000000123L)
    df.unpersist()
  }

  test("random_int stays in bounds, covers the range, and seeds reproduce") {
    import graft.functions.{Misc => GM}
    val vals = (1 to 2000).toDF("i")
      .select(GM.randomInt(-3, 4).as("r")).as[Long].collect()
    assert(vals.forall(v => v >= -3 && v <= 4))
    assert(vals.distinct.sorted.toSeq == (-3L to 4L), "all 8 values should appear in 2000 draws")
    intercept[IllegalArgumentException](GM.randomInt(5, 4))
  }

  test("audio resample preserves duration and tone shape") {
    import graft.ops.Audio
    val rate = 8000f
    val secs = 0.5
    val sine = Array.tabulate((rate * secs).toInt)(i =>
      math.sin(2 * math.Pi * 440 * i / rate).toFloat)
    val clip = Audio.AudioClip(sine, rate, 1)
    for (target <- Seq(4000f, 16000f, 11025f)) {
      val rs = Audio.resample(clip, target)
      assert(rs.sampleRate == target)
      assert(math.abs(rs.durationSec - secs) < 0.01, s"duration drift at $target")
      // a resampled pure tone keeps its RMS (~1/sqrt(2) for sine)
      val rms = math.sqrt(rs.samples.foldLeft(0.0)((a, x) => a + x.toDouble * x) / rs.samples.length)
      assert(math.abs(rms - 1 / math.sqrt(2)) < 0.02, s"rms $rms at $target")
    }
  }
  test("r9 API-sweep closures: totals, try_encode, SCREAMING cases, reciprocal trig") {
    import graft.functions.{Binary => GBin, Dt => GDt, Num => GNum}
    // duration totals scale exactly from the seconds anchor
    val iv = Seq(90061L).toDF("secs") // 1d 1h 1m 1s
      .select(col("secs").cast("long").as("s"))
    val t = iv.select(
      GDt.totalDays(col("s")).as("d"), GDt.totalHours(col("s")).as("h"),
      GDt.totalMinutes(col("s")).as("m"),
      GDt.totalMilliseconds(col("s")).as("ms"),
      GDt.totalMicroseconds(col("s")).as("us")).head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3), t.getLong(4)) ==
      ((1L, 25L, 1501L, 90061000L, 90061000000L)))
    // sub-second components must survive (ref total_milliseconds returns 1
    // for a 1000µs duration, datetime.py:783-826): feed a true interval
    val sub = spark.sql(
      "SELECT INTERVAL '0 00:00:00.001' DAY TO SECOND AS i").select(
      GDt.totalMilliseconds(col("i")).as("ms"),
      GDt.totalMicroseconds(col("i")).as("us")).head()
    assert((sub.getLong(0), sub.getLong(1)) == ((1L, 1000L)))
    // and a mixed interval with sub-second tail: 1m 1.5s = 61500 ms
    val mixed = spark.sql(
      "SELECT INTERVAL '0 00:01:01.5' DAY TO SECOND AS i").select(
      GDt.totalMilliseconds(col("i")).as("ms"),
      GDt.totalMicroseconds(col("i")).as("us")).head()
    assert((mixed.getLong(0), mixed.getLong(1)) == ((61500L, 61500000L)))
    // strict encode: ascii of non-ascii is null, of ascii is the bytes
    val e = Seq(("abc"), ("\u00e9clair")).toDF("s")
      .select(col("s"), GBin.tryEncode(col("s"), "US-ASCII").as("b"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(e("abc").isDefined && e("\u00e9clair").isEmpty)
    // SCREAMING case variants
    val c = Seq("greenDark metal").toDF("s").select(
      GStr.upperCamelCase(col("s")).as("uc"),
      GStr.upperSnakeCase(col("s")).as("us"),
      GStr.upperKebabCase(col("s")).as("uk")).head()
    assert(c.getString(0) == "GreenDarkMetal")
    assert(c.getString(1) == "GREEN_DARK_METAL")
    assert(c.getString(2) == "GREEN-DARK-METAL")
    // reciprocal trig identities at a benign angle
    val x = 0.7
    val r = Seq(x).toDF("x").select(
      GNum.cotCol(col("x")).as("cot"), GNum.cscCol(col("x")).as("csc"),
      GNum.secCol(col("x")).as("sec")).head()
    assert(math.abs(r.getDouble(0) - 1.0 / math.tan(x)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0 / math.sin(x)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0 / math.cos(x)) < 1e-12)
  }
}
