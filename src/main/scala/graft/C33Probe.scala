package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c33 featurization-staging A/B (round-13; the c43/c27 treatment
  * applied to the quality classifier): staged (featurized corpus
  * localCheckpointed once, shared by fit and scoring) vs unstaged
  * (lineage evaluated under both), warm min-of-3, on the bench table
  * AND the ScaleProbe 100k-doc synthetic shape where c33's wall is
  * multi-second. Prints one JSON line. */
object C33Probe {
  private def force(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  private def minOf(runs: Int)(body: => Unit): Double =
    (0 until runs).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.drop(1).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "100000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ScaleProbe's exact synthetic corpus (shared generator, near-dups
    // included) with its 8-source relabelling — the shape the probe
    // times c33 under: 25% target slice
    val docs = ScaleProbe.synthDocs(spark, nDocs)
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), (col("doc_id") % 8).cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("c33probe")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile); ()
    }))
    docs.write.mode("overwrite").parquet(dir.toString)
    val probeDocs = spark.read.parquet(dir.toString)
    val benchDocs = Tables.documents(spark, sfDir)
    benchDocs.count(); probeDocs.count()
    val targets = Seq("src0", "src1")

    def timeArm(docsDf: DataFrame, tgts: Seq[String], stage: Boolean): Double =
      minOf(3) {
        force(ops.QualityModel.qualityClassifierStagedForProbe(
          docsDf, tgts, trainFraction = 1, stageFeat = stage))
      }

    val benchOff = timeArm(benchDocs, ops.LmScore.DsirTargetSources, stage = false)
    val benchOn = timeArm(benchDocs, ops.LmScore.DsirTargetSources, stage = true)
    val probeOff = timeArm(probeDocs, targets, stage = false)
    val probeOn = timeArm(probeDocs, targets, stage = true)
    println(f"""{"probe":"c33_stage_ab","cpus":$cpus,"probe_docs":$nDocs,"sf_dir":"$sfDir",""" +
      f""""bench_unstaged_s":$benchOff%.2f,"bench_staged_s":$benchOn%.2f,""" +
      f""""probe_unstaged_s":$probeOff%.2f,"probe_staged_s":$probeOn%.2f}""")
    spark.stop()
  }
}
