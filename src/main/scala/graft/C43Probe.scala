package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** c43 phase profile (round-13; the e3 treatment for the suite's
  * slowest row): decomposes the lang-classifier wall into
  * featurize (gram kernel + heuristic-label join + HashingTF),
  * fit (25 distributed L-BFGS passes over MLlib's internally-persisted
  * instances), and score (broadcast-model transform + null re-entry
  * join) — measured on the exact production seams
  * (ops.QualityModel.langFeatures/langFit/langScore), plus an
  * UNSTAGED arm (featurization lineage evaluated by both the fit path
  * and the scoring path — the pre-r13 production shape, built
  * explicitly from the seams since production now stages) and the
  * STAGED arm (featurization localCheckpointed once, shared by both —
  * what langClassifier ships) so the staging win stays measurable. fit is also timed at
  * maxIter=1: the delta to 25 isolates per-iteration treeAggregate
  * cost from fit's fixed overhead. Run at SPARK_GRAFT_CPUS ∈ {8, 32}
  * for the core-scaling row. Prints one JSON line. */
object C43Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-c43-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm table + codegen baseline

    def minOf(runs: Int)(body: => Unit): Double =
      (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.drop(1).min // run 1 is JIT/codegen warmup

    // UNSTAGED arm, constructed explicitly from the seams
    // (featurization lineage evaluated twice: once under fit's
    // instance materialization, once under scoring). NOT
    // langClassifier: since the r13 staging fix the production path
    // checkpoints internally — calling it here would silently measure
    // the staged plan in both arms
    val e2e = minOf(4) {
      val feat = ops.QualityModel.langFeatures(docs)
      ops.QualityModel.langScore(docs, feat,
          ops.QualityModel.langFit(feat, maxIter = 25))
        .queryExecution.toRdd.foreach(_ => ())
    }

    // staged: featurize once (eager localCheckpoint), share it
    var featurize = 0.0; var fit25 = 0.0; var fit1 = 0.0; var score = 0.0
    val staged = minOf(4) {
      val t0 = System.nanoTime()
      val feat = ops.QualityModel.langFeatures(docs).localCheckpoint(true)
      val t1 = System.nanoTime()
      val model = ops.QualityModel.langFit(feat, maxIter = 25)
      val t2 = System.nanoTime()
      ops.QualityModel.langScore(docs, feat, model)
        .queryExecution.toRdd.foreach(_ => ())
      val t3 = System.nanoTime()
      featurize = (t1 - t0) / 1e9; fit25 = (t2 - t1) / 1e9
      score = (t3 - t2) / 1e9
    }
    locally {
      val feat = ops.QualityModel.langFeatures(docs).localCheckpoint(true)
      fit1 = minOf(3) { ops.QualityModel.langFit(feat, maxIter = 1) }
    }

    println(f"""{"probe":"c43_phase_profile","cpus":$cpus,"sf_dir":"$sfDir",""" +
      f""""e2e_wall_s":$e2e%.2f,"staged_wall_s":$staged%.2f,""" +
      f""""staged_phases_last_run":{"featurize_s":$featurize%.2f,"fit25_s":$fit25%.2f,"score_s":$score%.2f},""" +
      f""""fit_maxiter1_s":$fit1%.2f}""")
    spark.stop()
  }
}
