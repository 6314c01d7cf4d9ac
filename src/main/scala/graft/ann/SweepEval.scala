package graft.ann

/** Shared sweep-evaluation kernel: the recall and get_ratio semantics
  * of the reference's eval harness (reference src/test_search.cpp:
  * 101-130, utils/tools.hpp:16-46), used by BOTH the b11 nprobe sweep
  * (AnnQueries.nprobeSweep) and the reference-shape artifact
  * (graft.SweepRef). One implementation of the subtle pairing rules —
  * the callers only adapt their collected result lists to these
  * signatures, so the published CSV and the b11 query can never
  * diverge on what "recall" or "ratio" means.
  *
  * Everything here runs on the driver over already-collected,
  * O(queries·k)-sized result lists; the corpus-sized work (the exact
  * distances the inputs carry) stays in the callers' batched Spark
  * jobs.
  */
object SweepEval {
  /** recall@k over the whole batch: |ann ∩ gt| / (nQueries·k), the
    * reference's aggregate formulation (test_search.cpp:101-130).
    * Queries with fewer than k results simply contribute fewer
    * possible hits. */
  def recall(
      qids: Array[Long],
      annIds: Long => Array[Long],
      gtSet: Long => Set[Long],
      k: Int): Double = {
    // an empty batch would yield NaN flowing silently into the
    // published CSV / certified surface — fail loudly instead
    require(qids.nonEmpty && k > 0, s"empty sweep batch (q=${qids.length}, k=$k)")
    var hits = 0L
    qids.foreach { q =>
      val gt = gtSet(q)
      annIds(q).foreach(n => if (gt.contains(n)) hits += 1)
    }
    hits.toDouble / (qids.length.toLong * k)
  }

  /** get_ratio (tools.hpp:16-46): the ann result list, ranked by TRUE
    * distance, pairs rank-for-rank with the gt list; ratio_j =
    * √(d²_ann(j) / d²_gt(j)) over ranks whose gt distance is
    * non-degenerate (> 1e-5); per-query mean (1.0 when no rank
    * qualifies — the reference's all-degenerate fallback), then mean
    * over queries.
    *
    * `annDists` must already be ascending with a deterministic tie
    * order (both callers rank by (distance, neighbor id)); `gtDist`
    * is (query, 1-based rank) → exact distance, None past the gt
    * list's end. */
  def avgRatio(
      qids: Array[Long],
      annDists: Long => Array[Double],
      gtDist: (Long, Int) => Option[Double]): Double = {
    require(qids.nonEmpty, "empty sweep batch")
    qids.map { q =>
      val ds = annDists(q)
      var sum = 0.0
      var n = 0
      var j = 0
      while (j < ds.length) {
        gtDist(q, j + 1) match {
          case Some(g) if g > 1e-5 => sum += math.sqrt(ds(j) / g); n += 1
          case _ => ()
        }
        j += 1
      }
      if (n == 0) 1.0 else sum / n
    }.sum / qids.length
  }

  /** The HASH-CERTIFIABLE fixed-point form of [[recall]]+[[avgRatio]]
    * (b11's certified surface; the plain-double forms above stay
    * behind the published CSV artifacts). Same pairing rules, but
    * every cross-element accumulation is an exact integer sum so a
    * SQL recomputation cannot drift on addition order (the b7
    * exact-integer-micros discipline):
    *   - per rank j: term = ⌊√(d²_ann(j)/d²_gt(j))·10⁶ + 0.5⌋ over
    *     ranks with non-degenerate gt distance (d² > 1e-5);
    *   - per query: r_q = ⌊Σterms/n + 0.5⌋ micros (10⁶ when n = 0 —
    *     the reference's all-degenerate fallback);
    *   - per sweep row: recall = ⌊hits·10⁴/(Q·k) + 0.5⌋/10⁴ and
    *     ratio = ⌊Σr_q·10⁴/(10⁶·Q) + 0.5⌋/10⁴ — integer sums, one
    *     division each, rounded to the published 4 decimals.
    * Differences vs the double path are below the 4-decimal output
    * grid. Returns (recall_at_10, avg_ratio). */
  def certified(
      qids: Array[Long],
      annIds: Long => Array[Long],
      gtSet: Long => Set[Long],
      k: Int,
      annDists: Long => Array[Double],
      gtDist: (Long, Int) => Option[Double]): (Double, Double) = {
    require(qids.nonEmpty && k > 0, s"empty sweep batch (q=${qids.length}, k=$k)")
    var hits = 0L
    var rqSum = 0L
    qids.foreach { q =>
      val gt = gtSet(q)
      annIds(q).foreach(n => if (gt.contains(n)) hits += 1)
      val ds = annDists(q)
      var micros = 0L
      var n = 0
      var j = 0
      while (j < ds.length) {
        gtDist(q, j + 1) match {
          case Some(g) if g > 1e-5 =>
            micros += math.floor(math.sqrt(ds(j) / g) * 1e6 + 0.5).toLong
            n += 1
          case _ => ()
        }
        j += 1
      }
      rqSum += (if (n == 0) 1000000L
                else math.floor(micros.toDouble / n + 0.5).toLong)
    }
    val recall = math.floor(hits * 1e4 / (qids.length.toLong * k) + 0.5) / 1e4
    val ratio = math.floor(rqSum * 1e4 / (1e6 * qids.length) + 0.5) / 1e4
    (recall, ratio)
  }
}
