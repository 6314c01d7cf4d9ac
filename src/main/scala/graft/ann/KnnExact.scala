package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.VectorFunctions.l2sq

/** Exact brute-force top-k nearest neighbors (ground truth;
  * reference: /root/reference/python/compute_gt.py).
  *
  * Scale design: the query set is small by definition (it's a query
  * workload, not the corpus), so it is broadcast; each base partition
  * computes a *local* bounded heap per query (map-side top-k), and only
  * `numPartitions × nQueries × k` candidate rows are shuffled — never
  * O(N·Q). This is the distributed analogue of the reference's
  * ResultPool (inc/index/Pool.hpp) and survives a 1000-executor /
  * 100 TB corpus because the shuffle is independent of corpus size.
  */
object KnnExact {
  /** Bounded max-heap of (dist, id), keeping the k smallest with
    * deterministic (dist, id) lexicographic ordering. */
  final class BoundedTopK(k: Int) {
    // k=0 would NPE on heap.peek() inside executor tasks — fail loudly
    // on the driver instead
    require(k > 0, s"top-k bound must be positive, got $k")
    private val heap = new java.util.PriorityQueue[(Double, Long)](
      math.max(1, k),
      // max-heap: worst (largest dist, then largest id) at the head
      (p1: (Double, Long), p2: (Double, Long)) => {
        val c = java.lang.Double.compare(p2._1, p1._1)
        if (c != 0) c else java.lang.Long.compare(p2._2, p1._2)
      })
    def insert(dist: Double, id: Long): Unit = {
      if (heap.size < k) heap.add((dist, id))
      else {
        val worst = heap.peek()
        if (dist < worst._1 || (dist == worst._1 && id < worst._2)) {
          heap.poll(); heap.add((dist, id))
        }
      }
    }
    /** Current pruning threshold: the worst kept distance once the heap
      * is full, else `default` (nothing can be pruned yet). */
    def worstOrElse(default: Double): Double =
      if (heap.size >= k) heap.peek()._1 else default
    def drain(): Seq[(Double, Long)] = {
      val b = Seq.newBuilder[(Double, Long)]
      while (!heap.isEmpty) b += heap.poll()
      b.result()
    }
  }

  /** Merge per-partition candidate rows (query_id, neighbor_id, dist)
    * into the global per-query top-k with deterministic (dist, id)
    * tie-breaking. Shared by exact and IVF search. */
  def mergeTopK(
      spark: SparkSession,
      partial: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int): DataFrame = {
    import spark.implicits._
    partial.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        it.toArray.sortBy(t => (t._3, t._2)).take(k).iterator.zipWithIndex
          .map { case ((_, id, _), i) => (q, id, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "rk")
  }

  /** The shared exact-top-k kernel, keeping the squared distance:
    * (query_id, neighbor_id, rk, d2). [[topK]] is this minus `d2`; the
    * sweep harness (graft.SweepRef) uses the distances as the ratio
    * denominator (reference get_ratio, tools.hpp:16-46). Shuffle is
    * only numPartitions × nQueries × k candidate rows. */
  def topKDist(
      spark: SparkSession,
      base: DataFrame,
      queries: Array[(Long, Array[Float])],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // validate BEFORE launching the corpus job: the heaps are built
    // inside executor tasks, where BoundedTopK's own require would
    // fail as 4x-retried task errors instead of one driver exception
    require(k > 0, s"top-k bound must be positive, got $k")
    import spark.implicits._
    val qb = spark.sparkContext.broadcast(queries)
    val ds = base.select(col(idCol).cast(LongType), col(vecCol)).as[(Long, Array[Float])]
    ds.mapPartitions { iter =>
        val qs = qb.value
        val heaps = Array.fill(qs.length)(new BoundedTopK(k))
        iter.foreach { case (id, vec) =>
          var qi = 0
          while (qi < qs.length) { heaps(qi).insert(l2sq(qs(qi)._2, vec), id); qi += 1 }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.drain().map { case (d, id) => (qs(qi)._1, id, d) }
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        it.toArray.sortBy(t => (t._3, t._2)).take(k).iterator.zipWithIndex
          .map { case ((_, id, d), i) => (q, id, i + 1, d) }
      }
      .toDF("query_id", "neighbor_id", "rk", "d2")
  }

  /** Exact re-rank of a small per-query candidate list (the second
    * stage of the reference's HIGH_ACC_FAST_SCAN path,
    * HASearcher.hpp): the tiny (Q × candidates)-row list is broadcast
    * against the corpus — one corpus scan, no driver collect — each
    * pair gets its exact distance, and the per-query top-k by
    * (distance, id) survives. Output: (query_id, neighbor_id, rk,
    * exact_d) with exact_d the rounded exact L2 — the surface the b12
    * oracle recomputes end-to-end from the candidate sidecar. */
  def rerankExact(
      spark: SparkSession,
      corpus: DataFrame,
      queries: Array[(Long, Array[Float])],
      cand: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions.vec_l2sq
    val q = queries.toSeq.toDF("qid", "qvec")
    val e = corpus.select(col(idCol).cast(LongType).as("nid"), col(vecCol).as("nvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("d2", "neighbor_id")
    e.join(broadcast(cand.select("query_id", "neighbor_id")
        .join(q, col("query_id") === col("qid"))),
        col("neighbor_id") === col("nid"))
      .select(col("query_id"), col("neighbor_id"),
        vec_l2sq(col("qvec"), col("nvec")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(sqrt(col("d2")), 4).as("exact_d"))
  }

  /** Top-k neighbors of each query among `base` rows by squared L2.
    * Output: (query_id, neighbor_id, rk) with rk 1-based, ties broken
    * by neighbor id. */
  def topK(
      spark: SparkSession,
      base: DataFrame,
      queries: Array[(Long, Array[Float])],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    topKDist(spark, base, queries, k, idCol, vecCol).drop("d2")
}
