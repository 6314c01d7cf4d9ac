package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile for c19 (LSH → jaccard-verify → cosine near-dup) —
  * the one r12 row that regressed (1.64 → 2.52 s) with no change to
  * ops/Dedup.scala. Times each stage of the composition in isolation
  * on the bench config (min of 3 after warmup, like Bench), so the
  * regression can be attributed to a stage rather than guessed at.
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32). Prints one JSON line. */
object C19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-c19-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    import org.apache.spark.storage.StorageLevel

    val docs = Tables.documents(spark, sfDir)
    val p = Dedup.MinHashParams(numHashes = 128, bands = 32)

    def best(f: () => Unit): Double =
      (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).min

    try {
      docs.count() // table warmup
      // stage 1: dedup-exact collapse + signatures over representatives
      val members = docs.selectExpr("CAST(doc_id AS LONG) AS doc_id",
        "md5(CAST(text AS BINARY)) AS h")
      val reps = members.groupBy("h").agg(min("doc_id").as("rep"))
      val repDocs = docs.selectExpr("CAST(doc_id AS LONG) AS doc_id", "text")
        .join(reps.select(col("rep").as("doc_id")), "doc_id")
      val tSig = best { () =>
        val s = Dedup.minHashSignatures(spark, repDocs, p)
        s.queryExecution.toRdd.foreach(_ => ())
      }
      // stage 2: LSH candidates from persisted signatures
      val sigs = Dedup.minHashSignatures(spark, repDocs, p)
        .persist(StorageLevel.MEMORY_AND_DISK)
      sigs.count()
      val tCand = best { () =>
        Dedup.lshCandidatePairs(spark, sigs, p)
          .queryExecution.toRdd.foreach(_ => ())
      }
      // stage 3+4: the full operator (signatures re-run inside, as the
      // bench row does) — total minus (sig + cand) ≈ verify + expand +
      // cosine + checkpoint overhead
      sigs.unpersist(blocking = true)
      val tFull = best { () =>
        Dedup.verifiedNearDups(spark, docs, Tables.embeddings(spark, sfDir))
          .queryExecution.toRdd.foreach(_ => ())
      }
      val nReps = repDocs.count()
      val nCand = Dedup.lshCandidatePairs(spark, sigs, p).count()
      println(f"""{"probe":"c19_profile","cpus":$cpus,"sf_dir":"$sfDir",""" +
        f""""signatures_s":$tSig%.3f,"lsh_candidates_s":$tCand%.3f,""" +
        f""""full_operator_s":$tFull%.3f,"n_reps":$nReps,"n_cand_pairs":$nCand}""")
    } finally spark.stop()
  }
}
