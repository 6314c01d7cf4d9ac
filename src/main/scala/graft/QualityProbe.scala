package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** c43 iteration-budget sweep: each L-BFGS iteration is one
  * treeAggregate job, so at bench scale c43's wall is iterations ×
  * job floor, not gradient compute. This measures, per maxIter, the
  * wall AND the two quality bars that matter — distillation agreement
  * with the c6 heuristic (the monitored rollout metric) and mean
  * confidence — so the shipped budget is sized to measured
  * convergence. Env: SPARK_GRAFT_SF_DIR (default sf0.1). Prints one
  * JSON line. */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-quality-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the table + JIT baseline paths
    val rows = Seq(25, 12, 8, 5, 3).map { iters =>
      val walls = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        ops.QualityModel.langClassifier(docs, maxIter = iters)
          .queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val out = ops.QualityModel.langClassifier(docs, maxIter = iters)
        .agg(avg(col("agree")).as("agree"), avg(col("confidence")).as("conf"))
        .head()
      f""""iter$iters":{"wall_s":${walls.min}%.2f,"agree":${out.getDouble(0)}%.4f,"mean_conf":${out.getDouble(1)}%.4f}"""
    }
    println(s"""{"probe":"c43_iter_sweep","sf_dir":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
