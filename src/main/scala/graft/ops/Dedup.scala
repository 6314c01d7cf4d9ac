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
    val toks = text.split(' ')
    if (toks.length < k) Array(text)
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" ")).distinct
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
    val rnd = new scala.util.Random(p.seed)
    val coefs = Array.fill(p.numHashes)(
      (1 + (rnd.nextLong() & Long.MaxValue) % (MERSENNE61 - 1),
        (rnd.nextLong() & Long.MaxValue) % MERSENNE61))
    val bc = spark.sparkContext.broadcast(coefs)
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { iter =>
        val cs = bc.value
        iter.map { case (id, text) =>
          val sh = shingles(text, p.shingleSize).map(hash64(_, p.seed))
          val sig = Array.fill(p.numHashes)(Long.MaxValue)
          var i = 0
          while (i < sh.length) {
            val h = sh(i) % MERSENNE61
            var j = 0
            while (j < cs.length) {
              // (a*h + b) mod p on a Mersenne prime, via unsigned 128-bit-free trick:
              // values < 2^61 so a*h overflows; use BigInt-free mulmod below
              val v = mulModM61(cs(j)._1, h) + cs(j)._2
              val m = if (v >= MERSENNE61) v - MERSENNE61 else v
              if (m < sig(j)) sig(j) = m
              j += 1
            }
            i += 1
          }
          (id, sig)
        }
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
        (0 until p.bands).iterator.map { b =>
          val slice = sig.slice(b * p.rowsPerBand, (b + 1) * p.rowsPerBand)
          (b, MurmurHash3.orderedHash(slice.toSeq, p.seed), id)
        }
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
    * sides, and the final per-doc select. They are persisted once
    * (MEMORY_AND_DISK — at cluster scale the signature table is ~0.5 KB
    * per doc, orders of magnitude smaller than the corpus); Spark's
    * ContextCleaner reclaims the blocks once the plan is unreferenced,
    * and callers running many one-shot queries can
    * `spark.catalog.clearCache()`.
    */
  def minHashSummary(
      spark: SparkSession,
      docs: DataFrame,
      p: MinHashParams = MinHashParams()): DataFrame = {
    import spark.implicits._
    val sigs = minHashSignatures(spark, docs, p).persist(StorageLevel.MEMORY_AND_DISK)
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
  }

  // ---------- SimHash (c3) ----------
  private[graft] def simHash64(text: String, seed: Int): Long = {
    val acc = new Array[Int](64)
    text.split(' ').foreach { tok =>
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

  /** c3 per-doc summary: simhash fingerprint + candidate partners
    * within hamming ≤ 3 (via 4×16-bit band buckets). */
  def simHashSummary(
      spark: SparkSession,
      docs: DataFrame,
      seed: Int = 42,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    // persisted: scanned 4× (band explosion, both pair-join sides, the
    // final per-doc select); 16 bytes/doc, negligible at any scale
    val hashes = docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, simHash64(t, seed)) }
      .toDF("doc_id", "simhash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = hashes.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    // bucket-size cap (same invariant as lshCandidatePairs): a
    // degenerate bucket of near-identical docs must not go quadratic
    val buckets = bands.groupBy("band", "bucket")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")).between(2, 1000))
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
  }

  // ---------- exact n-gram jaccard (c4) ----------
  /** Shingle-set jaccard for consecutive doc-id pairs, built entirely
    * from codegen'd collection functions (SQL-oracle parity). */
  /** Distinct word k-shingles; empty for docs shorter than k tokens
    * (DuckDB `range(1, n)` with n ≤ 0 is empty — same semantics). */
  private[graft] def shingleSetOf(text: String, k: Int): Array[String] = {
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
    val jaccard = udf { (sa: Seq[String], sb: Seq[String]) =>
      val inter = sa.toSet.intersect(sb.toSet).size
      val uni = sa.length + sb.length - inter
      if (uni == 0) None
      // floor(x*1e6+0.5) = HALF_UP for non-negatives, matching
      // ROUND(x, 6) in both engines (rint would be half-even)
      else Some(math.floor(inter.toDouble / uni * 1e6 + 0.5) / 1e6)
    }
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"), jaccard(col("sa"), col("sb")).as("jaccard"))
  }

  // ---------- embedding cosine near-dup (c5) ----------
  /** Brute-force all-pairs cosine ≥ threshold. This is the correctness
    * baseline; at 100 TB the LSH/IVF paths (c2 / b7) provide the
    * candidate generation instead. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.dot
    // Broadcast one side (with precomputed norms) and scan the other:
    // each partition runs a tight compiled kernel over its rows × the
    // broadcast block. A join-based formulation puts the cosine inside
    // a nested-loop join condition, which Spark evaluates interpreted.
    val ds = embeddings.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
    val side = ds.collect().sortBy(_._1)
    require(side.length <= 1000000,
      s"embeddingNearDup broadcasts one side (${side.length} rows): it is the " +
        "O(N²) correctness baseline — use minHashSummary / IVF search for large corpora")
    val norms = side.map { case (_, v) => math.sqrt(dot(v, v)) }
    val bc = spark.sparkContext.broadcast((side, norms))
    ds.mapPartitions { iter =>
      val (bs, bn) = bc.value
      iter.flatMap { case (idA, va) =>
        val na = math.sqrt(dot(va, va))
        bs.iterator.zipWithIndex
          .filter { case ((idB, _), _) => idA < idB }
          .flatMap { case ((idB, vb), j) =>
            val c = math.floor(dot(va, vb) / (na * bn(j)) * 1e6 + 0.5) / 1e6
            if (c >= threshold) Some((idA, idB, c)) else None
          }
      }
    }.toDF("id_a", "id_b", "cos")
  }
}
