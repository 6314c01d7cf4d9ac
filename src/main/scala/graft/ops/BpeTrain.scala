package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c34: BPE tokenizer training (Sennrich et al. 2016) — the
  * vocabulary-learning step a training-data pipeline runs before
  * token counting and packing. Architected the way production
  * trainers (HuggingFace tokenizers, SentencePiece) actually split
  * the work:
  *
  * 1. ONE distributed corpus scan builds the word-frequency table
  *    (groupBy word — the only corpus-sized job; at 100 TB this is
  *    where all the data moves).
  * 2. A frequency floor ([[MinWordFreq]]) bounds the table: rare
  *    words cannot influence any merge ahead of common ones, and the
  *    floor is what caps the collect on a web-scale vocab (the same
  *    min_frequency knob every production trainer exposes).
  * 3. The bounded vocab table COLLECTS to the driver (the c26/c30
  *    bounded-collect pattern — vocabulary-sized, never
  *    corpus-sized) and the merge loop runs in memory: count
  *    adjacent pairs weighted by word freq, take the argmax (ties
  *    broken lexicographically — training is deterministic on any
  *    cluster layout), apply, repeat. Driving 30k merge rounds
  *    through per-round Spark jobs would pay 30k scheduling floors
  *    to rescan a table that fits in memory; the collect is the
  *    scale-CORRECT design, not a shortcut.
  *
  * Output: the learned merge table (rank, left, right, merged,
  * pair_freq) — deterministic, golden-snapshot pinned, and (round 14)
  * hash-certified: the per-round argmax over all prior merges is
  * replayed by a DuckDB recursive CTE that carries the whole floored
  * vocab as list state (the c23 discipline), so the oracle recomputes
  * the entire training loop from `documents` alone — no sidecar. The
  * companion spec replays Sennrich's low/lower/lowest example,
  * including two tie rounds.
  */
object BpeTrain {
  /** Merge rounds to learn. Production raises this (30k–50k); each
    * round is an in-memory pass over the bounded vocab. */
  val NumMerges = 20
  /** Words below this corpus frequency are dropped before training —
    * bounds the collected vocab at web scale. */
  val MinWordFreq = 2L
  /** Training stops when no remaining pair reaches this frequency —
    * a merge seen once is noise, not a rule. Distinct from the word
    * floor above: a pair can sum to 2 from two freq-1 words only if
    * MinWordFreq admits them. */
  val MinPairFreq = 2L
  /** Word-end marker appended to a word's final symbol. */
  val EndMark = "</w>"

  def bpeTrain(spark: SparkSession, docs: DataFrame,
      numMerges: Int = NumMerges): DataFrame = {
    import spark.implicits._
    // 1+2. corpus scan -> word-frequency table, floored (the ONLY
    // corpus-sized job), then the bounded vocab collect
    val vocab: Array[(Array[String], Long)] = docs
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= MinWordFreq)
      .as[(String, Long)].collect()
      .map { case (w, f) =>
        val syms = w.toCharArray.map(_.toString)
        syms(syms.length - 1) += EndMark
        (syms, f)
      }

    // 3. in-memory merge loop over the vocab
    val words = vocab.map(_._1).toBuffer
    val freqs = vocab.map(_._2)
    val merges = Array.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pairFreq = new scala.collection.mutable.HashMap[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi); val f = freqs(wi)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairFreq.update(k, pairFreq.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      // deterministic argmax: freq DESC, then (left, right) ASC
      val best = pairFreq.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (k, f)) =>
          acc match {
            case Some((bk, bf)) if bf > f || (bf == f &&
              (bk._1 < k._1 || (bk._1 == k._1 && bk._2 <= k._2))) => acc
            case _ => Some((k, f))
          }
      }
      best match {
        case Some(((a, b), f)) if f >= MinPairFreq =>
          merges += ((r + 1, a, b, a + b, f))
          wi = 0
          while (wi < words.length) {
            val syms = words(wi)
            var hit = false
            var i = 0
            while (!hit && i < syms.length - 1) {
              hit = syms(i) == a && syms(i + 1) == b; i += 1
            }
            if (hit) {
              val out = Array.newBuilder[String]
              i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                  out += a + b; i += 2
                } else { out += syms(i); i += 1 }
              }
              words(wi) = out.result()
            }
            wi += 1
          }
        case _ => done = true // nothing left worth merging
      }
      r += 1
    }
    merges.result().toSeq
      .toDF("rank", "left", "right", "merged", "pair_freq")
      .orderBy("rank")
  }

  /** Encode one word (symbol array, EndMark already applied) with a
    * rank table: repeatedly merge the lowest-rank adjacent pair,
    * left-to-right within a round — exactly the apply loop of the HF
    * tokenizers / SentencePiece BPE decoders, and the inverse of the
    * training loop above (training emits rules in the order encode
    * must prefer them). */
  private[ops] def encodeWord(
      syms0: Array[String], ranks: collection.Map[(String, String), Int]): Array[String] = {
    var syms = syms0
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = Array.newBuilder[String]
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 &&
              ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == bestRank) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
        continue = syms.length > 1
      }
    }
    syms
  }

  /** How many leading tokens c35 carries per doc (enough to pin the
    * encoding without shipping the whole token stream). */
  val HeadTokens = 12

  /** c35: BPE ENCODE — apply the trained merge table to the corpus,
    * the distributed counterpart of [[bpeTrain]] and the step a
    * pipeline runs on every document before packing (c15) and
    * sharding (c30). Train is bounded and driver-side; encode is the
    * corpus-sized job and stays a NARROW MAP: the merge table (30k
    * rows in production) rides a broadcast into a typed kernel, no
    * shuffle, no explode — at 100 TB this runs at scan speed.
    *
    * Per partition the kernel memoizes word → token-count+tokens
    * (vocabulary-bounded corpora re-encode the same words endlessly;
    * the cache is capped so adversarial unique-word shards cannot
    * OOM). Output per doc: word count, BPE token count, and the
    * first [[HeadTokens]] tokens ('|'-joined) — enough for the golden
    * snapshot to pin the actual encoding, not just its size. NULL
    * text propagates NULL metrics (the c21 contract).
    *
    * Hash-certified (round 14): given the merge table — persisted as
    * the `c34_merges` sidecar and itself certified by c34's oracle —
    * the apply loop is a deterministic per-word state machine, and
    * the oracle replays it with a recursive CTE over the distinct
    * words (the c23 greedy-replay discipline). */
  def bpeEncode(spark: SparkSession, docs: DataFrame,
      numMerges: Int = NumMerges): DataFrame =
    bpeEncodeWith(spark, docs, bpeTrain(spark, docs, numMerges))

  /** The encode stage against an explicit merge table — lets the
    * caller persist the exact table the kernel consumes (c35's oracle
    * sidecar) without training twice. */
  def bpeEncodeWith(spark: SparkSession, docs: DataFrame,
      merges: DataFrame): DataFrame = {
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges
        .select("left", "right", "rank").as[(String, String, Int)]
        .collect().map { case (a, b, r) => (a, b) -> r }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col("doc_id"), col("text"))
      .as[(Long, Option[String])]
      .mapPartitions { it =>
        val r = bc.value
        val memo = new scala.collection.mutable.HashMap[String, Array[String]]
        it.map { case (id, txt) =>
          txt match {
            case None => (id, None, None, None)
            case Some(t) =>
              val words = t.split(" ").filter(_.nonEmpty)
              var nTok = 0
              val head = Array.newBuilder[String]
              var headLeft = HeadTokens
              var wi = 0
              while (wi < words.length) {
                val w = words(wi)
                val toks = memo.getOrElse(w, {
                  val syms = w.toCharArray.map(_.toString)
                  syms(syms.length - 1) += EndMark
                  val enc = encodeWord(syms, r)
                  if (memo.size < 65536) memo.update(w, enc)
                  enc
                })
                nTok += toks.length
                var ti = 0
                while (headLeft > 0 && ti < toks.length) {
                  head += toks(ti); headLeft -= 1; ti += 1
                }
                wi += 1
              }
              (id, Some(words.length), Some(nTok),
                Some(head.result().mkString("|")))
          }
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens", "head_tokens")
  }
}
