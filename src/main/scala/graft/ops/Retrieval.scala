package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text retrieval over the corpus: BM25 keyword search (c25) and
  * hybrid lexical+vector fusion (c26) — the query-side capabilities a
  * corpus engine pairs with its ANN index (the reference's search
  * surface covers the vector half; these add the lexical half and the
  * fusion, the standard "hybrid search" a vector-DB user expects).
  *
  * Scale design: two corpus scans and NO corpus-sized shuffle — a
  * one-row (N, avgdl) partial-agg scan broadcast-crossed into the
  * plan, and a term-frequency scan where a compiled typed kernel
  * counts query-term hits per doc against the broadcast term set, so
  * the corpus is never exploded into postings and the rows leaving
  * the scan are already per-(term, doc) aggregates carrying the doc
  * length (no corpus-wide doc-length table ever joins back in). At
  * 100 TB with a bounded query set this is a scan plus a small-key
  * aggregation, never an inverted-index build over the full
  * vocabulary. Document-frequency comes from a window over the
  * aggregated counts (O(matched docs) rows) — only the bounded query
  * term set itself reaches the driver.
  *
  * Oracle-parity arithmetic (the whole scoring pipeline is certified
  * by hash against DuckDB running the mirrored SQL):
  *  - doc lengths and counts are integer-valued doubles, so their
  *    partial sums are EXACT and summation order cannot matter;
  *    `avgdl` is then a single IEEE division — bit-identical across
  *    engines;
  *  - `idf` is the one transcendental (ln); engines' libm may differ
  *    in the last ulp, so it is quantized to 1e-4 immediately (a
  *    flip would need the ulp to land within ~1e-12 of a rounding
  *    boundary, across only O(#distinct terms) values);
  *  - per-term scores are rounded to integer MICRO-units before the
  *    per-doc sum, making the sum order-independent, then ranked.
  */
object Retrieval {
  /** BM25 shape parameters (Robertson-Sparck Jones defaults). The SQL
    * oracles inline the same literals — keep in sync. */
  val BmK1 = 1.2
  val BmB = 0.75
  val BmTopK = 10

  /** c25's fixed query set — terms drawn from the synthetic corpus'
    * working vocabulary. Shared with the SQL oracle via [[bmQuerySql]]. */
  val BmQueries: Seq[(String, Seq[String])] = Seq(
    "q_perf" -> Seq("fast", "join", "table"),
    "q_vector" -> Seq("vector", "scan", "hash"),
    "q_stream" -> Seq("stream", "window", "merge", "spark"))

  def bmQuerySql: String =
    BmQueries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")

  /** BM25 scores for every (query, doc) pair sharing at least one
    * term. `queryTerms` must be a LOCAL relation with columns
    * (query_id, term) and `termSet` its distinct terms — the query
    * workload is bounded by contract, so it lives driver-side and NO
    * Spark job runs until the returned DataFrame is acted on (an
    * earlier draft collected the term list here, which launched a job
    * at plan-construction time and, for c26, re-evaluated the
    * corpus-derived query subtree). Duplicate terms within a query
    * are the caller's responsibility (both c25's literal list and
    * c26's local distinct feed it deduplicated). */
  private[graft] def bm25Scores(
      docs: DataFrame, queryTerms: DataFrame, termSet: Set[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = split(col("text"), " ")
    // one-row corpus stats; explicit sum/count (not avg) so both
    // engines run the identical exact-int-sum + one-division plan,
    // and a partial-agg scan (one row out per task, no shuffle of
    // corpus rows)
    val stats = docs.select(size(w).cast(DoubleType).as("dl")).agg(
      count(lit(1)).cast(DoubleType).as("nn"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    // the term set broadcasts into a compiled typed kernel that counts
    // term hits per doc locally. The corpus is never exploded: the
    // only rows that leave the scan are ALREADY per-(term, doc)
    // aggregated counts, so the posting explode→semi-join→groupBy
    // chain and its shuffle disappear entirely (measured 5.2 s →
    // 1.25 s on the sf1 single-split corpus, where one task does all
    // the per-token work).
    val bcTerms = spark.sparkContext.broadcast(termSet)
    val tf0 = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = bcTerms.value
        // null-safe: a null text matches no terms
        val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
        val m = new scala.collection.mutable.HashMap[String, Int]
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (ts.contains(t)) m.update(t, m.getOrElse(t, 0) + 1)
          i += 1
        }
        val dl = toks.length.toDouble
        m.iterator.map { case (t, c) => (t, id, c.toDouble, dl) }
      }
      .toDF("term", "doc_id", "tf", "dl")
    // df over the aggregated counts: O(matched docs) rows, one small
    // shuffle by term — no second pass over the corpus
    val tf = tf0.withColumn("df",
      count(lit(1)).over(Window.partitionBy("term")).cast(DoubleType))
    val idfq = floor(log(lit(1.0) + (col("nn") - col("df") + lit(0.5))
      / (col("df") + lit(0.5))) * 1e4 + lit(0.5)) / 1e4
    val tnorm = col("tf") * (lit(BmK1) + lit(1.0)) /
      (col("tf") + lit(BmK1) * (lit(1.0) - lit(BmB)
        + lit(BmB) * col("dl") / col("avgdl")))
    tf.join(broadcast(queryTerms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("micro", floor(idfq * tnorm * lit(1e6) + lit(0.5)).cast(LongType))
      .groupBy("query_id", "doc_id")
      .agg((sum("micro").cast(DoubleType) / 1e6).as("score"))
  }

  private[graft] def topK(scored: DataFrame, k: Int): DataFrame = {
    val byQ = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(byQ))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"), col("score"))
  }

  /** c25: BM25 keyword top-k over the documents table for the fixed
    * query set. */
  def bm25Search(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = BmQueries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
    val qt = pairs.toDF("query_id", "term")
    topK(bm25Scores(docs, qt, pairs.map(_._2).toSet), BmTopK)
  }

  // ------------------------- hybrid (c26) -------------------------
  /** Query-by-document ids for c26 — each query doc supplies both its
    * embedding (vector leg) and its first [[HybridQueryTokens]]
    * distinct tokens (lexical leg). Shared with the SQL oracle. */
  val HybridQueryIds: Seq[Long] = Seq(0L, 7L, 13L)
  val HybridQueryTokens = 8
  /** Per-leg candidate depth and the RRF dampening constant (60 is the
    * standard from Cormack et al.). */
  val HybridLegK = 20
  val RrfC = 60

  /** c26: hybrid search — BM25 lexical ranking fused with embedding
    * cosine ranking by Reciprocal Rank Fusion. Each leg contributes
    * floor(1e6 / (RrfC + rank)) integer micro-units for its top
    * [[HybridLegK]] candidates; the fused score is the micro sum (an
    * exact integer — fusion is float-free), ranked descending with
    * doc-id ties.
    *
    * Scale shape: the lexical leg is [[bm25Scores]] (corpus scanned
    * once, postings pruned to the query docs' terms); the vector leg
    * is a broadcast of the O(queries) embeddings against the
    * embeddings scan — the same shape as b1's exact top-k — and the
    * fusion itself joins two O(queries·k) sides. The cosine kernel and
    * its fixed-point rounding are shared with c5/c19 (dot in double
    * over float inputs, floor(x·1e6+0.5)/1e6), which is exactly what
    * DuckDB's list_cosine_similarity-over-DOUBLE[] reproduces. */
  def hybridSearch(spark: SparkSession, docs: DataFrame, embeddings: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    // lexical leg: first-N distinct tokens of each query doc. The
    // O(queries) texts are collected ONCE and the terms derived
    // locally (same bounded-collect shape as c11's query rows) — the
    // alternative, an in-plan corpus-derived query subtree, would be
    // re-evaluated by both the term-set broadcast and the fan-out join
    val qpairs = docs
      .filter(col("doc_id").isin(HybridQueryIds: _*))
      .select(col("doc_id").cast(LongType), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
      .flatMap { case (id, text) =>
        // null text ≡ no query terms (the bm25Scores kernel's own
        // rule) — without the guard a null-text query doc NPEs on the
        // DRIVER before any job runs
        if (text == null) Array.empty[(Long, String)]
        else text.split(" ", -1).take(HybridQueryTokens).distinct.map(t => (id, t))
      }.toSeq
    val qterms = qpairs.toDF("query_id", "term")
    val lex = topK(bm25Scores(docs, qterms, qpairs.map(_._2).toSet), HybridLegK)
      .select(col("query_id"), col("doc_id"), col("rk").as("lex_rk"))
    // vector leg: query embeddings broadcast against the corpus scan.
    // NOTE (r16): a collect-the-queries + flatMap rewrite that hoisted
    // both norms (query norms to the driver, corpus norm once per row)
    // was A/B'd and measured INDISTINGUISHABLE from this form
    // (same-session subset mins 1.720 vs 1.726 s at sf0.1) — the
    // redundancy it removes is bounded by |HybridQueryIds| = 3 while
    // it adds a driver collect job, so this simpler one-job broadcast
    // shape stays. At a query count where per-pair norm redundancy
    // would matter, searchAll/KnnExact is the right surface, not this
    // broadcast leg.
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val qe = e.filter(col("vec_id").isin(HybridQueryIds: _*))
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "qv")
    val cos = e.crossJoin(broadcast(qe))
      .select(col("query_id"), col("vec_id").as("doc_id"), col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (q, d, qv, v) =>
        val c = dot(qv, v) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v)))
        (q, d, math.floor(c * 1e6 + 0.5) / 1e6)
      }
      .toDF("query_id", "doc_id", "score")
    val vec = topK(cos, HybridLegK)
      .select(col("query_id"), col("doc_id"), col("rk").as("vec_rk"))
    // RRF fusion: integer micro contributions, absent leg contributes 0
    def contrib(rk: org.apache.spark.sql.Column) =
      floor(lit(1e6) / (lit(RrfC) + rk)).cast(LongType)
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rk"), lit(0)).as("lex_rk"),
        coalesce(col("vec_rk"), lit(0)).as("vec_rk"),
        ((when(col("lex_rk").isNotNull, contrib(col("lex_rk"))).otherwise(lit(0L))
          + when(col("vec_rk").isNotNull, contrib(col("vec_rk"))).otherwise(lit(0L)))
          .cast(DoubleType) / 1e6).as("score"))
    val byQ = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(byQ))
      .filter(col("rk") <= BmTopK)
      .select(col("query_id"), col("rk"), col("doc_id"),
        col("score").as("rrf"), col("lex_rk"), col("vec_rk"))
  }
}
