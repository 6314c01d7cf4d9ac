package graft

import org.apache.spark.sql.SparkSession

/** Stage decomposition for c39 (per-source Bloom) — the r13 verdict's
  * "shave the position arithmetic" ask. Times the pipeline cumulatively
  * (min-of-3 per stage, cold-to-warm ordering kept identical) so the
  * expensive stage is measured, not guessed:
  *   probe  = collectEvalProbe (eval shingles + md5 positions)
  *   shpos  = bloomShinglePositions .count (shingle expr + md5 + conv
  *            slices + explode — the codegen projection under suspicion)
  *   full   = the whole c39 query (adds the typed BloomAgg groupBy +
  *            fingerprint/probe map)
  * Prints one JSON line; committed artifact results/c39_profile_r14.json. */
object C39Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-c39-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = Tables.documents(spark, sfDir)
      docs.count() // warm the scan
      def minOf3(f: => Unit): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val tProbe = minOf3 { graft.ops.Sketches.collectEvalProbe(docs) }
      import org.apache.spark.sql.functions._
      val corpus = docs.filter(col("doc_id") >= graft.ops.CorpusOps.EvalIdBound)
      val tShingle = minOf3 {
        corpus.select(col("source"), graft.ops.CorpusOps.shingles.as("sh"))
          .select(col("source"), explode_outer(col("sh")).as("gs"))
          .where(col("gs").isNotNull).count()
      }
      val tMd5 = minOf3 {
        corpus.select(col("source"), graft.ops.CorpusOps.shingles.as("sh"))
          .select(col("source"), explode_outer(col("sh")).as("gs"))
          .where(col("gs").isNotNull)
          .select(col("source"), md5(col("gs")).as("h"))
          .where(length(col("h")) > 0).count()
      }
      val tShpos = minOf3 { graft.ops.Sketches.bloomShinglePositions(docs).count() }
      val tFull = minOf3 {
        graft.ops.Sketches.bloomContain(spark, docs).collect()
      }
      println(
        f"""{"probe":"c39_profile","sf":"$sfDir","cpus":$cpus,""" +
          f""""eval_probe_s":$tProbe%.3f,"shingle_explode_s":$tShingle%.3f,""" +
          f""""plus_md5_s":$tMd5%.3f,"shingle_positions_s":$tShpos%.3f,""" +
          f""""full_s":$tFull%.3f}""")
    } finally spark.stop()
  }
}
