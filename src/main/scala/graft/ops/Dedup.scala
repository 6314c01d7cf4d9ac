package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import scala.util.hashing.MurmurHash3

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2 C1–C5).
  *
  * Scale design: exact dedup is a hash-groupBy (one shuffle on the text
  * hash, never on the text itself). MinHash/SimHash turn O(N²) pair
  * search into a groupBy on band keys; bucket sizes are capped so a
  * degenerate band (all-identical docs) cannot produce a quadratic
  * explosion on one task.
  */
object Dedup {
  // ---------- exact (c1) ----------
  /** One row per distinct text: kept doc id, copy count, content hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast(BinaryType)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "text_md5")

  // ---------- MinHash + LSH (c2) ----------
  final case class MinHashParams(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      seed: Int = 42,
      maxBucket: Int = 1000) {
    require(numHashes % bands == 0)
    def rowsPerBand: Int = numHashes / bands
  }

  private val MERSENNE61 = (1L << 61) - 1

  private def hash64(s: String, seed: Int): Long = {
    val h1 = MurmurHash3.stringHash(s, seed).toLong
    val h2 = MurmurHash3.stringHash(s, seed ^ 0x5bd1e995).toLong
    ((h1 << 32) | (h2 & 0xffffffffL)) & Long.MaxValue
  }

  private[graft] def shingles(text: String, k: Int): Array[String] = {
    // null ≡ empty doc (one empty shingle, exactly like text = "") —
    // the d8 rule: kernels must not NPE on foreign corpora. The same
    // guard lives in shingleSetOf and simHash64: each tokenizing
    // kernel in this file must hold the rule independently.
    if (text == null) return Array("")
    val toks = text.split(' ')
    if (toks.length < k) Array(text)
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" ")).distinct
  }

  /** The seeded universal-hash coefficients behind a MinHashParams —
    * shared by the batch and streaming minhash paths. */
  private[graft] def hashCoefs(p: MinHashParams): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(p.seed)
    Array.fill(p.numHashes)(
      (1 + (rnd.nextLong() & Long.MaxValue) % (MERSENNE61 - 1),
        (rnd.nextLong() & Long.MaxValue) % MERSENNE61))
  }

  /** Pure per-doc minhash signature kernel. */
  private[graft] def signatureOf(
      text: String, coefs: Array[(Long, Long)], p: MinHashParams): Array[Long] = {
    val sh = shingles(text, p.shingleSize).map(hash64(_, p.seed))
    val sig = Array.fill(p.numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = sh(i) % MERSENNE61
      var j = 0
      while (j < coefs.length) {
        // (a*h + b) mod p on a Mersenne prime, via unsigned 128-bit-free trick:
        // values < 2^61 so a*h overflows; use BigInt-free mulmod below
        val v = mulModM61(coefs(j)._1, h) + coefs(j)._2
        val m = if (v >= MERSENNE61) v - MERSENNE61 else v
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    sig
  }

  /** One LSH bucket hash per band of a signature: the M61 polynomial
    * fold of the band's slice (base 1000003, the c9 discipline). Equal
    * slices always collide; distinct slices collide w.p. ~2⁻⁶¹ — and
    * because the fold is plain modular arithmetic over the signature
    * values, the c2/d6 DuckDB oracles recompute the exact same bucket
    * keys in SQL (hugeint), collisions and all, so the banding can
    * never flake the hash gate. (The previous 32-bit murmur was both
    * opaque to SQL and birthday-prone at ~10⁵ band rows.) */
  private[graft] def bandHashes(sig: Array[Long], p: MinHashParams): Array[Long] =
    Array.tabulate(p.bands) { b =>
      var h = 0L
      var j = b * p.rowsPerBand
      val end = j + p.rowsPerBand
      while (j < end) {
        // signature values are < M61 by construction (signatureOf)
        val v = mulModM61(h, 1000003L) + sig(j)
        h = if (v >= MERSENNE61) v - MERSENNE61 else v
        j += 1
      }
      h
    }

  /** Per-doc minhash signature (numHashes longs). Deterministic from
    * the seed; a narrow map, no shuffle. */
  def minHashSignatures(
      spark: SparkSession,
      docs: DataFrame,
      p: MinHashParams,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(hashCoefs(p))
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { iter =>
        val cs = bc.value
        iter.map { case (id, text) => (id, signatureOf(text, cs, p)) }
      }.toDF(idCol, "signature")
  }

  /** (a*b) mod 2^61−1 for a,b < 2^61: a·b = hi·2^64 + lo with
    * 2^64 ≡ 8 (mod M61), and lo split at bit 61. */
  private[graft] def mulModM61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    modM61((hi << 3) + (lo >>> 61) + (lo & MERSENNE61))
  }
  @inline private def modM61(x: Long): Long = {
    var v = (x & MERSENNE61) + (x >>> 61)
    if (v >= MERSENNE61) v -= MERSENNE61
    v
  }

  /** LSH candidate pairs: equal band-hash → candidate; estimated
    * jaccard = fraction of equal signature positions.
    *
    * Pair expansion and the equal-position count run as typed kernels:
    * Spark's higher-order SQL lambdas (`transform`/`zip_with`) evaluate
    * interpreted per element, which measured ~8× slower on this shape.
    * Callers should pass a persisted `sigs` — it is scanned three times
    * (band rows + both sides of the pair join).
    */
  def lshCandidatePairs(
      spark: SparkSession,
      sigs: DataFrame,
      p: MinHashParams,
      idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    val bandRows = sigs.select(col(idCol).cast(LongType), col("signature"))
      .as[(Long, Array[Long])]
      .flatMap { case (id, sig) =>
        bandHashes(sig, p).iterator.zipWithIndex.map { case (h, b) => (b, h, id) }
      }.toDF("band", "bucket", "id")
    val buckets = bandRows.groupBy("band", "bucket")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, p.maxBucket))
    val pairs = buckets.select(col("ids")).as[Array[Long]]
      .flatMap(inBucketPairs)
      .toDF("id_a", "id_b")
      .distinct()
    val sigA = sigs.select(col(idCol).as("id_a"), col("signature").as("sig_a"))
    val sigB = sigs.select(col(idCol).as("id_b"), col("signature").as("sig_b"))
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) =>
        require(sa.length == sb.length,
          s"signature length mismatch for pair ($a, $b): ${sa.length} vs ${sb.length} — " +
            "all rows of `sigs` must come from the same minHashSignatures params")
        var eq = 0
        var i = 0
        while (i < sa.length) { if (sa(i) == sb(i)) eq += 1; i += 1 }
        // floor(x*1e6+0.5): HALF_UP round to 6 places without the
        // per-row BigDecimal that Spark's round() on doubles costs
        (a, b, math.floor(eq.toDouble / sa.length * 1e6 + 0.5) / 1e6)
      }.toDF("id_a", "id_b", "est_jaccard")
  }

  /** All sorted in-bucket (a < b) pairs — typed flatMap kernel. Bucket
    * size is pre-capped by the caller, so the quadratic stays bounded. */
  private[graft] def inBucketPairs(ids: Array[Long]): Iterator[(Long, Long)] = {
    val a = ids.clone()
    java.util.Arrays.sort(a)
    for {
      i <- (0 until a.length - 1).iterator
      j <- (i + 1 until a.length).iterator
    } yield (a(i), a(j))
  }

  /** c2 per-doc summary (row-count stable even with no near-dups):
    * signature extremes + number of LSH candidate partners.
    *
    * Signatures are the expensive pass (shingle → 64 modular hashes per
    * shingle), and the plan scans them 4×: band rows, both pair-join
    * sides, and the final per-doc select. They are persisted for the
    * duration of this call only: the (small, per-doc) result is
    * materialized eagerly via `localCheckpoint`, after which the
    * signature cache is dropped. `Dataset.persist` registers the plan
    * in the session's CacheManager, which holds it until an explicit
    * `unpersist` — so leaving the handle cached would pin ~0.5 KB/doc
    * of executor storage per call for the session lifetime. The
    * checkpointed result blocks themselves are RDD-level storage,
    * reclaimed by the ContextCleaner once the returned Dataset is
    * garbage-collected. Tradeoff: the blocks are node-local and the
    * lineage is truncated, so on a cluster that loses the computing
    * executor the result cannot be recomputed — write long-lived
    * results to durable storage promptly rather than holding the
    * returned handle across executor churn.
    */
  def minHashSummary(
      spark: SparkSession,
      docs: DataFrame,
      p: MinHashParams = MinHashParams()): DataFrame =
    minHashSummaryOf(spark, minHashSignatures(spark, docs, p), p)

  /** [[minHashSummary]] over a PRECOMPUTED signatures frame.
    * `onPersisted` fires right after the persist — a caller that also
    * needs the signatures (the c2 sidecar write) consumes the cached
    * frame there instead of re-running the full tokenize+hash pass,
    * the most expensive stage of the dedup row. */
  private[graft] def minHashSummaryOf(
      spark: SparkSession,
      sigsIn: DataFrame,
      p: MinHashParams,
      onPersisted: DataFrame => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    val sigs = sigsIn.persist(StorageLevel.MEMORY_AND_DISK)
    onPersisted(sigs)
    try {
      val pairs = lshCandidatePairs(spark, sigs, p)
      val partners = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      val perDoc = sigs.select(col("doc_id"), col("signature"))
        .as[(Long, Array[Long])]
        .map { case (id, sig) => (id, sig(0), sig.min) }
        .toDF("doc_id", "sig0", "sig_min")
      perDoc
        .join(partners, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_candidates"))
        .orderBy("doc_id")
        .localCheckpoint(true) // eager: run the plan while sigs are cached
    } finally sigs.unpersist(blocking = false)
  }

  // ---------- SimHash (c3) ----------
  /** c3's bucket-size cap — the named twin of MinHashParams.maxBucket
    * (previously an inline 1000 literal that couldn't be raised in
    * lockstep with the minhash knob). Shared with the c3 oracle SQL. */
  val SimHashMaxBucket = 1000
  private[graft] def simHash64(text: String, seed: Int): Long = {
    val acc = new Array[Int](64)
    // null ≡ empty doc (hash of the one empty token, like text = "")
    (if (text == null) "" else text).split(' ').foreach { tok =>
      val h = hash64(tok, seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Per-doc simhash fingerprints — the narrow map the c3 pipeline
    * starts from, and the surface its oracle sidecar persists. */
  def simHashFingerprints(
      spark: SparkSession,
      docs: DataFrame,
      seed: Int = 42,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, simHash64(t, seed)) }
      .toDF("doc_id", "simhash")
  }

  /** c3 per-doc summary: simhash fingerprint + candidate partners
    * within hamming ≤ 3 (via 4×16-bit band buckets). */
  def simHashSummary(
      spark: SparkSession,
      docs: DataFrame,
      seed: Int = 42,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // 4×16-bit bands guarantee candidate recall only for hamming ≤ 3
    // (pigeonhole: 3 flipped bits cannot touch all 4 bands). A larger
    // maxHamming would pass the filter but silently MISS pairs whose
    // differing bits span all bands — fail loudly instead.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simHashSummary's 4x16-bit banding guarantees recall only for " +
        s"maxHamming <= 3, got $maxHamming — widen the banding before " +
        "raising the threshold")
    import spark.implicits._
    // persisted for this call only (scanned 4×: band explosion, both
    // pair-join sides, the final per-doc select); the result is
    // materialized eagerly, then the cache entry is dropped — see the
    // minHashSummary scaladoc for why the CacheManager entry must not
    // outlive the call
    val hashes = simHashFingerprints(spark, docs, seed, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val bands = hashes.select(col("doc_id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("bucket"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      // bucket-size cap (same invariant as lshCandidatePairs): a
      // degenerate bucket of near-identical docs must not go quadratic
      val buckets = bands.groupBy("band", "bucket")
        .agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")).between(2, SimHashMaxBucket))
      val pairs = buckets.select(col("ids")).as[Array[Long]]
        .flatMap(inBucketPairs)
        .toDF("id_a", "id_b")
        .distinct()
      val hA = hashes.select(col("doc_id").as("id_a"), col("simhash").as("ha"))
      val hB = hashes.select(col("doc_id").as("id_b"), col("simhash").as("hb"))
      val j = pairs.join(hA, "id_a").join(hB, "id_b")
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .filter(col("hamming") <= maxHamming)
      val partners = j.select(col("id_a").as("doc_id"))
        .union(j.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      hashes.select(col("doc_id"), format_string("%016x", col("simhash")).as("simhash_hex"))
        .join(partners, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_candidates"))
        .orderBy("doc_id")
        .localCheckpoint(true) // eager: run the plan while hashes are cached
    } finally hashes.unpersist(blocking = false)
  }

  // ---------- exact n-gram jaccard (c4) ----------
  /** Shingle-set jaccard for consecutive doc-id pairs, built entirely
    * from codegen'd collection functions (SQL-oracle parity). */
  /** Distinct word k-shingles; empty for docs shorter than k tokens
    * (DuckDB `range(1, n)` with n ≤ 0 is empty — same semantics). */
  private[graft] def shingleSetOf(text: String, k: Int): Array[String] = {
    // null ≡ empty doc (no shingles, exactly like text = "") — the
    // per-kernel d8 rule; c4/c19 reach here with unfiltered corpora
    if (text == null) return Array.empty[String]
    val toks = text.split(' ')
    if (toks.length < k) Array.empty[String]
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" ")).distinct
  }

  def ngramJaccardPairs(docs: DataFrame, k: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // shingle sets built in a typed kernel: Spark's higher-order SQL
    // lambdas run interpreted per element and dominate the runtime
    val sets = docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, shingleSetOf(t, k)) }
    val a = sets.toDF("id_a", "sa")
    val b = sets.toDF("id_b", "sb")
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        jaccardExpr(col("sa"), col("sb")).as("jaccard"))
  }

  /** Exact set-jaccard of two distinct-element array columns, rounded
    * HALF_UP to 6 decimals, NULL when both sets are empty.
    * Intersection/union via codegen'd collection builtins (inputs are
    * already distinct, so sizes are true set cardinalities);
    * floor(x*1e6+0.5)/1e6 = HALF_UP for non-negatives, matching
    * ROUND(x, 6) in both engines (rint would be half-even). The ONE
    * definition behind both c4 (ngramJaccardPairs) and c19's
    * verification step (verifiedNearDups): their oracle-equivalence
    * claim ("verification is c4's exact jaccard") depends on the two
    * surfaces never forking this arithmetic. */
  private[graft] def jaccardExpr(
      sa: org.apache.spark.sql.Column,
      sb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(sa) + size(sb) - inter
    when(uni === 0d, lit(null).cast("double"))
      .otherwise(floor(inter / uni * 1e6 + 0.5) / 1e6)
  }

  // ---------- LSH-verified near-dups (c19 = c2's candidates → exact) ----------
  /** The composition a real 100 TB dedup runs: MinHash-LSH candidate
    * generation (c2) feeds EXACT verification computed on the candidate
    * pairs ONLY — never on all N² pairs. Verification is c4's exact
    * 3-gram jaccard (the keep/drop decision) plus c5's exact embedding
    * cosine attached to each surviving pair (the re-rank signal a
    * downstream canonical-selection step uses).
    *
    * Byte-identical texts are collapsed FIRST (c1's hash-groupBy rule)
    * and LSH runs over one representative per distinct text; verified
    * pairs then expand back over the duplicate classes (within-class
    * pairs are jaccard 1.0 by construction). This is what makes the
    * bucket cap honest at scale: a boilerplate family of a million
    * exact copies is ONE signature, not a bucket overflow that would
    * silently drop its pairs. `p.maxBucket` then only caps families of
    * more than maxBucket DISTINCT texts that are mutually near-dup —
    * raise it (or dedup harder upstream) if a corpus genuinely has
    * such families; the pair-output contract is inherently quadratic
    * in family size either way (a cluster output is the right contract
    * past that point).
    *
    * Scale: the collapse is one shuffle on 16-byte text hashes;
    * signatures and banding are narrow maps + one groupBy on band
    * keys; the verification joins move only candidate rows.
    *
    * Oracle: the output equals "all pairs with exact jaccard ≥
    * minJaccard" (SQL-expressible) as long as LSH recall at the
    * threshold is 1. The default signature here is WIDER than c2's
    * (128 hashes / 32 bands vs 64/16) precisely to buy that: a pair at
    * jaccard 0.8 collides with probability 1-(1-0.8⁴)³² ≈ 1-5e-8, and
    * the driver corpora's qualifying pairs sit at ≥0.8 (most ≥0.95)
    * where a miss is ~1e-15 — OpsSpec pins the equality on planted
    * near-dups and the sf corpora.
    */
  def verifiedNearDups(
      spark: SparkSession,
      docs: DataFrame,
      embeddings: DataFrame,
      minJaccard: Double = 0.8,
      p: MinHashParams = MinHashParams(numHashes = 128, bands = 32),
      shingleK: Int = 3): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    // --- collapse identical texts: (doc_id → class representative) ---
    val members = docs.select(col("doc_id").cast(LongType).as("doc_id"),
      md5(col("text").cast(BinaryType)).as("h"))
    val reps = members.groupBy("h").agg(min("doc_id").as("rep"))
    val memberRep = members.join(reps, "h").select(col("doc_id"), col("rep"))
    val repDocs = docs.select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
      .join(reps.select(col("rep").as("doc_id")), "doc_id")
    val sigs = minHashSignatures(spark, repDocs, p).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // --- candidates among representatives → exact jaccard ---
      val cand = lshCandidatePairs(spark, sigs, p).select("id_a", "id_b")
      val sets = repDocs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id, shingleSetOf(t, shingleK)) }
      val jac = jaccardExpr(col("sa"), col("sb"))
      val verifiedReps = cand
        .join(sets.toDF("id_a", "sa"), "id_a")
        .join(sets.toDF("id_b", "sb"), "id_b")
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= minJaccard)
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("jaccard"))
      // --- expand back over duplicate classes ---
      // cross-class: every member of a's class × every member of b's,
      // re-oriented by id (identical texts ⇒ identical jaccard)
      val cross = verifiedReps
        .join(memberRep.select(col("doc_id").as("m_a"), col("rep").as("rep_a")), "rep_a")
        .join(memberRep.select(col("doc_id").as("m_b"), col("rep").as("rep_b")), "rep_b")
        .select(least(col("m_a"), col("m_b")).as("id_a"),
          greatest(col("m_a"), col("m_b")).as("id_b"), col("jaccard"))
      // within-class: jaccard is exactly 1.0 — unless the text is too
      // short to have any shingle (c4 defines that jaccard as NULL, and
      // the oracle's uni > 0 guard excludes it)
      val nonEmptyReps = sets.filter(_._2.nonEmpty).map(_._1).toDF("rep")
      val within = memberRep.join(nonEmptyReps, "rep").alias("x")
        .join(memberRep.alias("y"), col("x.rep") === col("y.rep") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          lit(1.0).as("jaccard"))
      // --- c5's exact cosine on the surviving pairs (typed kernel,
      // same HALF_UP rounding as embeddingNearDup) ---
      val e = embeddings.select(col("vec_id").cast(LongType), col("embedding"))
      cross.unionByName(within)
        .join(e.toDF("id_a", "va"), "id_a")
        .join(e.toDF("id_b", "vb"), "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"), col("va"), col("vb"))
        .as[(Long, Long, Double, Array[Float], Array[Float])]
        .map { case (a, b, j, va, vb) =>
          val c = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
          (a, b, j, math.floor(c * 1e6 + 0.5) / 1e6)
        }
        .toDF("id_a", "id_b", "jaccard", "cos")
        // eager materialization while sigs are cached (see minHashSummary)
        .localCheckpoint(true)
    } finally sigs.unpersist(blocking = false)
  }

  // ---------- near-dup canonicalization (c20 = closure over c19) ----------
  /** Per-doc keep/drop decision over a set of verified near-dup PAIRS —
    * the step a 100 TB dedup actually ships. Pairs are grouped into
    * families (connected components of the pair graph: A~B and B~C put
    * A and C in one family even when A!~C directly) and each family
    * elects the minimum doc id as canonical.
    *
    * Algorithm: distributed iterative min-label propagation with
    * pointer jumping — every round each node adopts the minimum label
    * in its neighborhood, then labels are re-resolved through one more
    * self-join (label := label(label)), which halves chain lengths, so
    * convergence is O(log family-diameter) rounds. Each round is a
    * constant number of keyed shuffles over (nodes + 2·pairs) rows;
    * nothing corpus-sized ever reaches the driver (the loop condition
    * is a count of changed labels). Labels are localCheckpoint'ed each
    * round so the iterated plan/lineage stays constant-size.
    *
    * Near-dup families are short-diameter in practice (members overlap
    * a shared core), so the loop typically converges in 2–3 rounds;
    * `maxRounds` only bounds a pathological million-hop chain, and
    * hitting it is an error rather than a silently partial closure.
    *
    * Output: one row per input doc — (doc_id, canonical_id, keep)
    * with keep = 1 iff the doc IS its family's canonical (docs in no
    * pair are their own singleton family and are always kept).
    */
  def canonicalize(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxRounds: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nodes = docs.select(col(idCol).cast(LongType).as("id"))
    // undirected: each pair contributes both orientations; checkpointed
    // once up front — it is rescanned every round
    val edges = pairs
      .select(col("id_a").cast(LongType).as("src"), col("id_b").cast(LongType).as("dst"))
      .union(pairs.select(col("id_b").cast(LongType).as("src"), col("id_a").cast(LongType).as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("lab")).localCheckpoint(true)
    var round = 0
    var converged = false
    // try/finally: the non-convergence require (and any mid-loop
    // failure) must still release the cached edges and the last
    // labels checkpoint — a long-lived session would otherwise leak
    // the blocks on every failed call
    try {
      while (!converged && round < maxRounds) {
        val nbrMin = edges.join(labels, edges("dst") === labels("id"))
          .groupBy(col("src")).agg(min("lab").as("nbr_lab"))
        // carry the round's starting label through, so convergence can be
        // decided inside the pointer-jump job itself (accumulator below)
        // instead of a separate per-round comparison join
        val propagated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(col("id"), col("lab").as("old_lab"),
            least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("lab"))
        // pointer jump: labels are themselves node ids (the propagation
        // only ever adopts ids seen as labels), so label(label) is total
        // and ≤ label within the same component
        val changed = spark.sparkContext.longAccumulator("canonicalize-changed")
        val next = propagated.alias("x")
          .join(propagated.select(col("id").as("jid"), col("lab").as("jlab")).alias("y"),
            col("x.lab") === col("y.jid"))
          .select(col("x.id").as("id"), col("x.old_lab").as("old_lab"), col("y.jlab").as("lab"))
          .as[(Long, Long, Long)]
          .mapPartitions(_.map { case (id, oldLab, lab) =>
            if (oldLab != lab) changed.add(1L)
            (id, lab)
          })
          .toDF("id", "lab")
          .localCheckpoint(true) // eager: the checkpoint job fills `changed`
        // task retries can only OVER-count (never turn a genuinely
        // changeless round nonzero), so the worst case is one extra
        // round — convergence is never declared early
        converged = changed.value == 0L
        labels.unpersist(blocking = false) // superseded round's blocks
        labels = next
        round += 1
      }
      require(converged, s"canonicalize did not converge in $maxRounds rounds — " +
        "a family chain this deep means the pair input is not near-dup-shaped")
    } finally {
      edges.unpersist(blocking = false)
      if (!converged) labels.unpersist(blocking = false)
    }
    // the final labels frame stays cached: the returned plan reads it,
    // and a truncated-lineage checkpoint cannot be recomputed if
    // released early. One slim (id, lab) frame per call, freed when the
    // caller's result goes out of scope or the session ends.
    labels.select(col("id").as(idCol), col("lab").as("canonical_id"),
      (col("lab") === col("id")).cast(IntegerType).as("keep"))
  }

  // ---------- embedding cosine near-dup (c5) ----------
  /** Brute-force all-pairs cosine ≥ threshold, as a distributed block
    * nested-loop: rows are hashed into `numBlocks` blocks and the
    * B(B+1)/2 block pairs are compared in parallel tasks running a
    * tight compiled kernel (a join-based formulation would evaluate
    * the cosine interpreted inside a nested-loop join condition).
    * Nothing is collected to the driver; shuffle volume is O(N·B)
    * rows, and each task holds two blocks of ~N/B vectors — pick
    * `numBlocks` ≈ cluster cores so tasks saturate executors without
    * replicating the corpus too many times. The O(N²) compute is
    * inherent to the exact baseline; at 100 TB the LSH/IVF paths
    * (c2 / b7) provide the candidate generation instead. */
  def embeddingNearDup(
      embeddings: DataFrame,
      threshold: Double,
      numBlocks: Int = 32): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    // replicate each row to every block pair it participates in (one
    // shuffle, ×numBlocks fan-out), then compare the two blocks of a
    // pair inside one task — an explicit equi-grouping, so Catalyst
    // never has to plan a non-equi self-join of corpus-sized rows
    val expanded = embeddings.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        // floorMod: a Scala % on a negative id would yield a negative
        // block that no other row's pair keys ever reference
        val b = java.lang.Math.floorMod(id, numBlocks.toLong).toInt
        val n = math.sqrt(dot(v, v))
        (0 until numBlocks).iterator.map { o =>
          (math.min(b, o), math.max(b, o), b, id, v, n)
        }
      }
    expanded.groupByKey { case (lo, hi, _, _, _, _) => (lo, hi) }
      .flatMapGroups { (key: (Int, Int), iter) =>
        val (lo, hi) = key
        def cos(x: (Long, Array[Float], Double), y: (Long, Array[Float], Double)): Double =
          math.floor(dot(x._2, y._2) / (x._3 * y._3) * 1e6 + 0.5) / 1e6
        val (raw_a, raw_b) = iter.map { case (_, _, b, id, v, n) => (b, (id, v, n)) }
          .toArray.partition(_._1 == lo)
        val ra = raw_a.map(_._2).sortBy(_._1)
        if (lo == hi) {
          // within-block: i < j over the id-sorted array; skip equal
          // ids (a re-ingested duplicate row must not emit a self-pair
          // — the oracle's a.vec_id < b.vec_id excludes them)
          for {
            i <- ra.indices.iterator
            j <- (i + 1 until ra.length).iterator
            if ra(i)._1 != ra(j)._1
            c = cos(ra(i), ra(j)) if c >= threshold
          } yield (ra(i)._1, ra(j)._1, c)
        } else {
          // cross-block: every unordered pair lands in exactly one
          // (lo, hi) group; orient by id (float dot is exactly symmetric)
          val rb = raw_b.map(_._2)
          for {
            x <- ra.iterator
            y <- rb.iterator
            c = cos(x, y) if c >= threshold
          } yield if (x._1 < y._1) (x._1, y._1, c) else (y._1, x._1, c)
        }
      }.toDF("id_a", "id_b", "cos")
  }

  // ---------- semantic dedup (c23) ----------
  /** c23: SemDeDup (Abbas et al. 2023) — cluster the embedding space
    * with k-means, then prune near-duplicates WITHIN each cluster
    * only: in ascending id order a vector is dropped if its cosine to
    * an already-KEPT member of the same cluster reaches `threshold`
    * (so every semantic-duplicate group keeps exactly its min-id
    * representative, and kept vectors are pairwise < threshold — the
    * greedy ordering makes the result deterministic).
    *
    * This is the scale path c5's exact all-pairs baseline points at:
    * clustering cuts the O(N²) comparison space to Σ|c|² with k
    * chosen so clusters fit a task (N/k vectors · dim floats), and the
    * whole op is ONE shuffle on cluster_id — the assignment itself
    * reuses the IVF k-means (b2/b3), so an existing ANN index prunes
    * its own corpus for free. A pathologically hot cluster is the
    * same skew the IVF search path already handles (salt or split by
    * the block layout); at the reference's k (√N-ish) clusters stay
    * task-sized.
    *
    * `assign`: (vec_id, cluster_id) — from [[graft.ann.IVFIndex]]
    * assignment. `embeddings`: (vec_id, embedding). */
  def semDedup(
      assign: DataFrame,
      embeddings: DataFrame,
      threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    val members = embeddings
      .select(col("vec_id").cast(LongType), col("embedding"))
      .join(assign.select(col("vec_id").cast(LongType), col("cluster_id").cast(IntegerType)), "vec_id")
      .as[(Long, Array[Float], Int)]
    members.groupByKey(_._3)
      .flatMapGroups { (cid: Int, iter: Iterator[(Long, Array[Float], Int)]) =>
        // greedy in id order against the kept set: O(|c|·kept)·dim,
        // all inside one task — nothing global, nothing on the driver
        val rows = iter.map { case (id, v, _) =>
          (id, v, math.sqrt(dot(v, v))) }.toArray.sortBy(_._1)
        val kept = new scala.collection.mutable.ArrayBuffer[(Array[Float], Double)]
        rows.iterator.map { case (id, v, n) =>
          val dup = kept.exists { case (u, un) =>
            // same fixed-point rounding as c5 so thresholds behave
            // identically across the dedup family
            math.floor(dot(v, u) / (n * un) * 1e6 + 0.5) / 1e6 >= threshold
          }
          if (!dup) kept += ((v, n))
          (id, cid, if (dup) 0 else 1)
        }
      }
      .toDF("vec_id", "cluster_id", "keep")
  }

  // ---------- exact substring-span dedup (c24) ----------
  /** Span length in tokens for exact substring-span dedup — the span
    * granularity of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), scaled to the synthetic corpus'
    * ~54-token documents. Shared with the SQL oracle. */
  val SpanK = 8
  /** Flag threshold: a doc whose tokens are more than 30% covered by
    * cross-document duplicated spans is flagged for span removal. */
  val SpanDupMax = 0.3

  /** The c24 span-key kernel: per-token 61-bit polynomial char hashes
    * (one pass over the doc's chars), then each SpanK-token window
    * combines its K token hashes in two INDEPENDENT M61 polynomial
    * lanes (distinct bases) — 122 key bits, pure long arithmetic,
    * no window string ever built. Token-level hashing gives exactly
    * md5(join(window))'s identity semantics: tokens cannot contain
    * the separator, so window equality IS token-sequence equality.
    * Returns (1-based position, lane1, lane2) per window. */
  private[graft] def spanWindowHashes(toks: Array[String]): Array[(Int, Long, Long)] = {
    val n = toks.length
    if (n < SpanK) return Array.empty
    val B1 = 1000003L
    val B2 = 998244353L
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks(i)
      // seed 1, not 0: an empty token must hash differently from "no
      // characters contributed" so ("a","") and ("a") windows differ
      var h1 = 1L
      var h2 = 1L
      var j = 0
      while (j < s.length) {
        h1 = mulModM61(h1, B1) + s.charAt(j); if (h1 >= MERSENNE61) h1 -= MERSENNE61
        h2 = mulModM61(h2, B2) + s.charAt(j); if (h2 >= MERSENNE61) h2 -= MERSENNE61
        j += 1
      }
      th1(i) = h1; th2(i) = h2
      i += 1
    }
    val out = new Array[(Int, Long, Long)](n - SpanK + 1)
    var p = 0
    while (p <= n - SpanK) {
      var w1 = 0L
      var w2 = 0L
      var k = 0
      while (k < SpanK) {
        // both addends < MERSENNE61, so one conditional subtract renormalizes
        w1 = mulModM61(w1, B1) + th1(p + k); if (w1 >= MERSENNE61) w1 -= MERSENNE61
        w2 = mulModM61(w2, B2) + th2(p + k); if (w2 >= MERSENNE61) w2 -= MERSENNE61
        k += 1
      }
      out(p) = (p + 1, w1, w2)
      p += 1
    }
    out
  }

  /** c24: exact substring-span dedup — find every SpanK-token window
    * that appears verbatim in MORE THAN ONE document and measure, per
    * doc, how much of it is such boilerplate: the number of duplicated
    * window positions and the exact token coverage of their union
    * (overlapping windows are merged, so coverage never double-counts
    * a token). This is the cross-document complement of c21's
    * intra-document repetition: c21 catches a doc repeating itself,
    * c24 catches license headers / navboxes / syndicated passages
    * repeated across the corpus.
    *
    * Scale shape: windows explode to (two-long span key, doc, pos)
    * rows — ~n_tokens rows per doc, and the window text is NEVER
    * materialized anywhere: a compiled typed kernel hashes each token
    * once (61-bit polynomial over its chars) and combines K token
    * hashes per window in two independent M61 lanes — pure long
    * arithmetic, no per-window string concat. (The md5-of-concat and
    * xxhash64-of-concat formulations both lose: expressions inside a
    * higher-order `transform` lambda evaluate interpreted, and the
    * concat itself is the cost — on the sf1 spot-check's single-split
    * corpus they measure 18.3 s and 16.0 s against 3.0 s for this
    * kernel, which also beats DuckDB's 6.1 s on the same shape.)
    * 122 key bits keep span collisions negligible at 100 TB span
    * counts, where a single 64-bit lane would collide with certainty.
    * The oracle keys spans by md5 on its side, which is equivalent:
    * dup detection is engine-internal, only the resulting per-doc
    * numbers are compared. Duplicate detection is
    * min(doc)/max(doc) window functions OVER THE SPAN KEY on that one
    * exploded set (a span is cross-doc iff min < max — no
    * countDistinct expansion), so the corpus is scanned ONCE and the
    * spans shuffle ONCE; the groupBy+self-join alternative would scan
    * and shuffle the exploded windows twice. The per-doc interval
    * union is then a lead() window + sum, partitioned by doc. Every
    * shuffle key is fixed-width; nothing touches the driver.
    * Coverage union: sorted window starts p1<p2<... each contribute
    * min(SpanK, next_start - start) tokens (the last contributes
    * SpanK), which telescopes to exactly |union of [p, p+SpanK)
    * intervals|. */
  def substringSpans(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val w = split(col("text"), " ")
    val n = size(w)
    // one (p, h1, h2) row per window start p = 1..n-SpanK+1 (1-based
    // to match the oracle's list indexing); docs shorter than SpanK
    // have no windows and rejoin via the final left join
    val wins = docs
      .select(col("doc_id").cast(LongType), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        // null-safe: a null text has no windows (kernels must not NPE
        // on foreign corpora)
        val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
        spanWindowHashes(toks).map { case (p, h1, h2) => (id, p, h1, h2) }
      }
      .toDF("doc_id", "p", "h1", "h2")
    // cross-doc duplicated span positions: min/max over the key
    // partition — one shuffle, no join back, no second corpus scan.
    // The two hash lanes stay FLAT columns: a struct sort key would
    // fall off Spark's radix/prefix sort path
    val byKey = Window.partitionBy("h1", "h2")
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val covered = wins
      .withColumn("mn", min("doc_id").over(byKey))
      .withColumn("mx", max("doc_id").over(byKey))
      .filter(col("mx") > col("mn"))
      .withColumn("c",
        least(lit(SpanK),
          coalesce(lead(col("p"), 1).over(byDoc), col("p") + SpanK) - col("p")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(IntegerType).as("n_dup_windows"),
        sum("c").cast(LongType).as("dup_tokens"))
    val ratio = col("dup_tokens").cast(DoubleType) / col("n_tokens")
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"), n.as("n_tokens"),
        greatest(n - (SpanK - 1), lit(0)).as("n_windows"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0, Seq("n_dup_windows", "dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        col("n_dup_windows"), col("dup_tokens"),
        round(ratio, 6).as("dup_token_ratio"),
        // flag compares the UNROUNDED ratio (mirrored in the oracle)
        (ratio > SpanDupMax).cast(IntegerType).as("flagged"))
  }
}
