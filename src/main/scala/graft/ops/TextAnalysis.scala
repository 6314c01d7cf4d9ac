package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators (SURVEY.md §2 C6–C9). c6–c8 are built from
  * codegen'd collection/regex functions only, so the identical logic is
  * expressible as the DuckDB oracle; c9 (rolling-hash fingerprint) is a
  * deterministic typed transform. */
object TextAnalysis {
  /** Marker stopword sets for the language-ID heuristic. Shared with
    * the SQL oracle — keep in sync with [[markerSqlList]]. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un"),
    "es" -> Seq("el", "los", "las", "que", "una", "por"))

  def markerSqlList(lang: String): String =
    markers(lang).map(w => s"'$w'").mkString(", ")

  private def toks(c: Column): Column = split(c, " ")
  private[graft] def markerCount(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(markers(lang): _*)))

  /** c6: language ID via marker-word counts + CJK char count, argmax
    * with fixed priority (en, de, fr, es, zh), 'unknown' if no
    * markers hit. */
  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nZh = size(regexp_extract_all(col("text"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val withCounts = docs.select(
      col("doc_id"),
      markerCount(t, "en").as("n_en"),
      markerCount(t, "de").as("n_de"),
      markerCount(t, "fr").as("n_fr"),
      markerCount(t, "es").as("n_es"),
      nZh.as("n_zh"))
    withCounts.withColumn("predicted",
      // null text FIRST: under ANSI every count is NULL, so every
      // when() below evaluates NULL (skipped) and a null doc would
      // otherwise fall through to the 'zh' arm
      when(col("n_en").isNull, "unknown")
        .when(col("n_en") + col("n_de") + col("n_fr") + col("n_es") + col("n_zh") === 0, "unknown")
        .when(col("n_en") >= col("n_de") && col("n_en") >= col("n_fr") &&
          col("n_en") >= col("n_es") && col("n_en") >= col("n_zh"), "en")
        .when(col("n_de") >= col("n_fr") && col("n_de") >= col("n_es") &&
          col("n_de") >= col("n_zh"), "de")
        .when(col("n_fr") >= col("n_es") && col("n_fr") >= col("n_zh"), "fr")
        .when(col("n_es") >= col("n_zh"), "es")
        .otherwise("zh"))
      .orderBy("doc_id")
  }

  /** c7: quality scores — length, punct ratio, stopword ratio, mean
    * token length. */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nChars = length(col("text"))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "\\p{Punct}", ""))
    val tokLenSum = aggregate(transform(t, x => length(x)), lit(0), (acc, x) => acc + x)
    docs.select(
        col("doc_id"),
        nChars.as("n_chars"),
        size(t).as("n_tokens"),
        // empty text: 0/0 raises DIVIDE_BY_ZERO under ANSI (the
        // gateMetrics guard, applied here too); null text stays NULL
        when(nChars === 0, lit(0.0))
          .otherwise(round(nPunct.cast(DoubleType) / nChars, 6))
          .as("punct_ratio"),
        round(markerCount(t, "en").cast(DoubleType) / size(t), 6).as("stopword_ratio"),
        round(tokLenSum.cast(DoubleType) / size(t), 6).as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** c8: token counting — whitespace tokens, distinct tokens,
    * BPE-ish subword count (4-char chunks, length-ceil). */
  def tokenCount(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val subwords = aggregate(
      transform(t, x => ceil(length(x) / lit(4.0)).cast(IntegerType)),
      lit(0), (acc, x) => acc + x)
    docs.select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        subwords.cast(LongType).as("n_subwords"))
      .orderBy("doc_id")
  }

  /** c9: document fingerprint — polynomial rolling hash of the whole
    * text plus winnowing minimum over 8-gram character windows
    * (deterministic; rows-only checked, pinned by spec). */
  def fingerprint(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // null text → NULL metrics (the per-kernel foreign-corpus rule,
        // Dedup's contract) — exactly the row the oracle's NULL
        // propagation emits; testdata has no null text, so hashes are
        // unchanged where they were ever computed
        if (text == null) (id, None: Option[Long], None: Option[Long])
        else { val (full, win) = fingerprintOf(text); (id, Some(full), Some(win)) }
      }
      .toDF("doc_id", "full_hash", "min_window_hash")
      .orderBy("doc_id")
  }

  private val B = 1000003L
  private val M = (1L << 61) - 1

  private[graft] def fingerprintOf(text: String): (Long, Long) = {
    var full = 0L
    var i = 0
    while (i < text.length) {
      full = Dedup.mulModM61(full, B) + text.charAt(i)
      if (full >= M) full -= M
      i += 1
    }
    // rolling 8-gram window minimum (winnowing-style)
    val k = 8
    var minWin = Long.MaxValue
    if (text.length >= k) {
      // precompute B^(k-1) mod M
      var bk = 1L
      var j = 0
      while (j < k - 1) { bk = Dedup.mulModM61(bk, B); j += 1 }
      var h = 0L
      i = 0
      while (i < text.length) {
        if (i >= k) {
          // remove char i-k
          val drop = Dedup.mulModM61(text.charAt(i - k).toLong, bk)
          h = h - drop
          if (h < 0) h += M
        }
        h = Dedup.mulModM61(h, B) + text.charAt(i)
        if (h >= M) h -= M
        if (i >= k - 1 && h < minWin) minWin = h
        i += 1
      }
    } else minWin = full
    (full, minWin)
  }

  // ---------------------------------------------------------------- c21
  /** Repetition thresholds: a doc is flagged when more than 20% of its
    * 2-grams are repeats or one word is more than 20% of its tokens
    * (the Gopher-style "repetitive document" filters; see
    * reference python/dataset_utils.py for the corpus-prep stage this
    * extends). Shared with the SQL oracle. */
  val DupGramMax = 0.2
  val TopWordMax = 0.2

  /** c21: intra-document repetition metrics — the duplicate-2-gram
    * fraction and the most-common-word fraction, plus the keep/flag
    * decision. Boilerplate text, keyword-stuffed spam, and template
    * pages all light up one of the two ratios.
    *
    * A compiled typed kernel (one hash-map pass per doc for the word
    * histogram, one hash-set pass for distinct 2-grams), so the whole
    * operator stays a narrow map — a pure scan at 100 TB, no shuffle.
    * The earlier higher-order-function formulation (`transform` +
    * nested `filter` per distinct token) is the same arithmetic but
    * evaluates INTERPRETED per element — O(distinct·tokens) closure
    * evaluations per doc made it the whole suite's slowest query
    * (16 s at sf0.1 on a single-split file vs 0.5 s for this
    * kernel). Rounding runs through the same HALF_UP BigDecimal as
    * Spark's `round`, so the DuckDB oracle match is unchanged. */
  def docRepetition(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => repetitionOf(id, text) })
      .toDF("doc_id", "n_tokens", "n_2grams", "dup_2gram_ratio",
        "top_word_ratio", "repetitive")
  }

  /** Spark round(_, 6) semantics exactly: HALF_UP on the decimal
    * rendering of the double, not on a binary scaling. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[graft] def repetitionOf(id: Long, text: String)
      : (Long, Option[Int], Option[Int], Option[Double], Option[Double], Option[Int]) = {
    // null text propagates NULL metrics, exactly like the SQL
    // formulation this kernel replaced (string_split(NULL) -> NULL
    // through every derived column) — no nulls in the test corpora,
    // but a foreign corpus must neither NPE nor get falsely flagged
    if (text == null) return (id, None, None, None, None, None)
    val w = text.split(" ", -1)
    val n = w.length
    val counts = new scala.collection.mutable.HashMap[String, Int]
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.getOrElse(w(i), 0) + 1
      counts.update(w(i), c)
      if (c > top) top = c
      i += 1
    }
    val n2 = if (n >= 2) n - 1 else 0
    var distinct2 = 0
    if (n2 > 0) {
      val seen = new scala.collection.mutable.HashSet[String]
      i = 0
      while (i < n - 1) {
        if (seen.add(w(i) + " " + w(i + 1))) distinct2 += 1
        i += 1
      }
    }
    val dupRatio = if (n2 == 0) 0.0 else (n2 - distinct2).toDouble / n2
    val topRatio = top.toDouble / n
    // the flag compares the UNROUNDED ratios (mirrored in the oracle)
    val flag = if (dupRatio > DupGramMax || topRatio > TopWordMax) 1 else 0
    (id, Some(n), Some(n2), Some(round6(dupRatio)), Some(round6(topRatio)), Some(flag))
  }
}
