package graft.ops

import graft.functions.{Misc => GMisc}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: tokenization, token
  * counting, quality scoring, n-gram language ID, document fingerprinting
  * (builder brief; reference analogues: tokenize `daft/functions/str.py:
  * 1086`, normalize :1031). All column-expression based (codegen'd) except
  * the fingerprint hash (one-pass UDF). */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword-boundary tokens: word pieces, numbers, punctuation
    * runs (the standard pre-tokenizer regex shape). */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), x => x =!= "" && x =!= " ")

  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** Heuristic quality components (length, punctuation ratio, stopword
    * ratio, mean word length) and a combined [0,1] score. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = wsTokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  def meanWordLen(text: Column): Column = {
    val toks = wsTokens(text)
    aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score: long enough, some stopwords, sane word
    * lengths, low punctuation noise. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenOk = least(nTok / 20.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    val wlen = meanWordLen(text)
    val wlenOk = when(wlen >= 3 && wlen <= 10, 1.0).otherwise(0.5)
    round((lenOk * 0.4 + punctOk * 0.2 + swOk * 0.2 + wlenOk * 0.2), 6)
  }

  /** Marker-word language ID: score each language by marker-token hits in
    * the token set, pick the argmax (deterministic tie-break by language
    * order). A real deployment swaps the marker lists for char-n-gram
    * profiles; the pipeline shape (token-set containment scoring) is the
    * same. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "value", "data"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "y", "los", "que"),
    "zh" -> Seq("的", "是", "不", "了"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = wsTokens(text)
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // argmax with first-wins tie-break, via a fold over (bestLang, bestScore)
    val init = struct(lit(scores.head._1).as("lang"), scores.head._2.as("score"))
    val best = scores.tail.foldLeft(init) { case (acc, (lang, sc)) =>
      when(sc > acc.getField("score"), struct(lit(lang).as("lang"), sc.as("score")))
        .otherwise(acc)
    }
    best.getField("lang")
  }

  /** Normalized-content fingerprint: 64-bit rolling hash over the
    * whitespace-normalized lowercased text — equal texts (mod formatting)
    * collide on purpose. */
  val fingerprintUdf = udf { s: String =>
    if (s == null) null
    else {
      val norm = s.toLowerCase.trim.replaceAll("\\s+", " ")
      java.lang.Long.valueOf(GMisc.stringHash64(norm, 7L))
    }
  }
  def fingerprint(text: Column): Column = fingerprintUdf(text)

  /** PII scrubbing for training corpora: regex redaction of emails,
    * phone-like numbers, and IPv4 addresses (the standard public recipe —
    * e.g. BigScience ROOTS / CCNet-style filters). Pure codegen'd
    * regexp_replace chain — no UDF, safe in the widest scan projection.
    * Order matters: IPs before phones (an IP's octets would otherwise
    * partially match the phone pattern). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\+?\\d[\\d() -]{7,}\\d"

  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Re, "<IP>")
    regexp_replace(noIp, phoneRe, "<PHONE>")
  }

  /** Gopher-style repetition metrics (public quality-filter heuristics:
    * Rae et al. 2021 §A1.1): duplicate-word fraction and the share of
    * bigram occurrences taken by the single most frequent bigram. High
    * values flag boilerplate/spam for training-data filtering.
    *
    * Scale shape: dup_word_frac is a pure column expression; the top-bigram
    * share distributes as explode → two-level groupBy (one shuffle on
    * (doc, bigram), partial-combined) — no per-doc state on the driver. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol), wsTokens(col(textCol)).as("toks"))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("dup_word_frac",
        round((col("n_words") - size(array_distinct(col("toks")))).cast("double") /
          greatest(col("n_words"), lit(1L)), 6))
    val bigrams = base
      .filter(col("n_words") >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), (col("n_words") - 1).cast("int")),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .as("bg"))
    val top = bigrams.groupBy(idCol, "bg").count()
      .groupBy(idCol)
      .agg(round(max("count").cast("double") / sum("count"), 6).as("top_bigram_frac"))
    base.select(idCol, "n_words", "dup_word_frac")
      .join(top, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** Okapi BM25 relevance of every document against a fixed query-term
    * set (Robertson & Walker SIGIR'94 — the standard retrieval scorer a
    * curation pipeline uses for query-targeted corpus filtering).
    *
    * Scale shape: the per-token explode is map-side and immediately
    * filtered to the query terms, so the ONLY shuffled data is
    * O(docs-containing-a-query-term) (doc, term, tf) triples — never the
    * full token stream. Document frequency and the corpus stats
    * (N, avgdl) are tiny aggregates broadcast back; nothing driver-side
    * scales with the corpus. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val tf = toks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(queryTerms)) // before any shuffle
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy("term")
      .agg(countDistinct(col(idCol)).cast("double").as("df_t"))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")) * k1))
      .groupBy(idCol)
      .agg(round(sum("s"), 2).as("bm25"))
  }

  /** Full per-document stats projection. */
  def stats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      col("*"),
      tokenCount(col(textCol)).as("n_tokens"),
      size(bpeishTokens(col(textCol))).as("n_bpeish"),
      punctRatio(col(textCol)).as("punct_ratio"),
      stopwordRatio(col(textCol)).as("stopword_ratio"),
      meanWordLen(col(textCol)).as("mean_word_len"),
      qualityScore(col(textCol)).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fp"))
}
