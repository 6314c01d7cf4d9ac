package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** c37: KMV (k-minimum-values) distinct-cardinality sketch — the
  * sketch-operator class (HLL's exactly-mergeable cousin): estimate
  * per-source vocabulary size without ever materializing the distinct
  * set. The engine ships `approx_count_distinct` (HLL++), but its
  * binary registers are engine-private — KMV is implemented here
  * because its state is PORTABLE (k smallest 60-bit hashes) and its
  * estimate is a pure function of that state, so a DuckDB oracle can
  * reproduce the sketch BIT-EXACTLY and the driver's hash check
  * certifies a distributed sketch end-to-end — rare for approximate
  * operators, whose answers normally can't be oracle-pinned.
  *
  * Scale shape: one typed [[Aggregator]] whose buffer is the bounded
  * sorted min-k array (8 KB at k=1024). Partial aggregation runs
  * map-side (each task reduces its partition to ONE sketch per
  * source), the shuffle carries O(sources · k) longs — never the
  * corpus, never the distinct set — and merge is the min-k union of
  * two sketches, which is exactly how a 1000-executor run combines:
  * KMV sketches are closed under union with NO error growth. Most
  * inserts after warm-up fail the `h < max` check in O(1).
  *
  * Determinism: the min-k set of a value stream is order-independent,
  * so the sketch (and its estimate) is identical on any partitioning
  * — the property that lets the oracle hash-match. The hash is the
  * top 60 bits of md5 (= the first 15 hex chars both engines can
  * parse into a BIGINT); the estimator is the classic unbiased
  * (k−1)/u_(k) with u = h/2^60, and sources holding fewer than k
  * hashes report their EXACT distinct count (the sketch degrades to
  * exact below k — a feature, not a fallback).
  */
object Sketches {
  /** Sketch size: 1024 min-values ⇒ ~3% relative error above k. */
  val KmvK = 1024
  private val TwoPow60 = 1152921504606846976.0 // 2^60, exact in double

  /** The classic KMV estimator: exact below k, (k−1)/u_(k) at k.
    * Shared by batch c37 and streaming d11 so the estimate arithmetic
    * cannot drift from the oracle's. */
  def estimate(held: Int, kth: Long, k: Int): Long =
    if (held < k) held.toLong
    else math.floor((k - 1).toDouble * TwoPow60 / kth.toDouble).toLong

  /** Top 60 bits of md5(word) — first 15 hex chars as an unsigned
    * value, always positive in a signed long. */
  private[graft] def hash60(md: java.security.MessageDigest, w: String): Long = {
    md.reset()
    val d = md.digest(w.getBytes("UTF-8"))
    val be = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    be >>> 4
  }

  /** Bounded sorted min-k buffer: ascending, distinct, ≤ k values. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      if (b.length == k && h >= b(b.length - 1)) b // common case: O(1) reject
      else {
        val i = java.util.Arrays.binarySearch(b, h)
        if (i >= 0) b // already present (distinct semantics)
        else {
          val at = -i - 1
          val grown = if (b.length < k) b.length + 1 else b.length
          val out = new Array[Long](grown)
          System.arraycopy(b, 0, out, 0, at)
          out(at) = h
          // drop the previous max when full: copy one fewer tail slot
          System.arraycopy(b, at, out, at + 1, grown - at - 1)
          out
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // min-k union of two sorted distinct arrays
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      var last = Long.MinValue
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || v != last) { out(n) = v; last = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** (source, text) → deduped (source, hash60) pairs — the kernel
    * both batch c37 and streaming d11 run, SHARED so the two paths
    * cannot drift (their oracle equivalence depends on byte-identical
    * tokenize/hash/dedupe semantics). */
  def tokenHashPairs(
      ds: org.apache.spark.sql.Dataset[(String, String)]): org.apache.spark.sql.Dataset[(String, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (src, text) =>
        // per-doc local dedupe: repeated words emit one pair
        val seen = new scala.collection.mutable.HashSet[Long]
        text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
          val h = hash60(md, w)
          if (seen.add(h)) Iterator.single((src, h)) else Iterator.empty
        }
      }
    }
  }

  /** (source, hash) pairs → per-source (held, kth, estimate) rows —
    * the aggregation + projection shared by c37 and d11. */
  def sketchBySource(
      pairs: org.apache.spark.sql.Dataset[(String, Long)], k: Int): DataFrame = {
    import pairs.sparkSession.implicits._
    val agg = new KmvAgg(k)
    pairs
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sketch"))
      .map { case (src, sketch) =>
        val held = sketch.length
        val kth = if (held == 0) 0L else sketch(held - 1)
        (src, held, kth, estimate(held, kth, k))
      }
      .toDF("source", "sketch_k", "kth_hash", "est_distinct")
  }

  /** c37 query: per-source distinct-token estimate. Output pins the
    * whole sketch decision: held size, the k-th (max held) hash, and
    * the integer estimate. */
  def kmvDistinct(spark: SparkSession, docs: DataFrame, k: Int = KmvK): DataFrame = {
    import spark.implicits._
    val pairs = tokenHashPairs(docs
      .filter(col("text").isNotNull)
      .select(col("source"), col("text"))
      .as[(String, String)])
    sketchBySource(pairs, k).orderBy("source")
  }
}
