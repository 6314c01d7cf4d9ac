package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Stage-boundary persist audit for c46 (the composed e2e pipeline,
  * suite rank #2 at 2.29 s in r14): its five certified stages share
  * the c44→c6→c27 survivor prefix, and the audit question is whether
  * each survivor set materializes ONCE (persist / exchange reuse) or
  * the prefix recomputes per downstream consumer. Reports min wall,
  * job count, and the EXECUTED final plan's documents-scan /
  * ReusedExchange / InMemoryTableScan node counts (taken from the last
  * timed run's DataFrame after execution, so AQE's runtime reuse nodes
  * are visible). One JSON line per run; the committed artifact is
  * results/c46_stage_profile_r15.json.
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_C46_S2 = lazy to A/B the
  * s2 survivor-prefix staging (the pipelineE2e seam), and
  * SPARK_GRAFT_C46_STAGE as a free-form LABEL stamped into the JSON so
  * each A/B row names the configuration it ran (the label does not
  * itself change any staging). */
object C46Probe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // parsed once so a non-numeric env value fails HERE, not as a bare
    // garbage token inside the emitted JSON line
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the A/B arm is chosen by the PROBE and passed as a parameter —
    // the library path has no env read (ADVICE r15)
    val stageS2 = !sys.env.get("SPARK_GRAFT_C46_S2").contains("lazy")
    val variant = sys.env.getOrElse("SPARK_GRAFT_C46_STAGE", "default")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-c46-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    try {
      var lastDf: org.apache.spark.sql.DataFrame = null
      val walls = (0 until 4).map { _ =>
        Thread.sleep(200)
        jobs = 0
        val t0 = System.nanoTime()
        val df = operators.PipelineQueries.pipelineE2e(spark, sfDir, stageS2)
        df.queryExecution.toRdd.foreach(_ => ())
        lastDf = df
        val w = (System.nanoTime() - t0) / 1e9
        Scratch.reap()
        (w, jobs)
      }
      // final-plan shape: how many times does the documents scan (and
      // each cached stage) appear in the LAST run's EXECUTED plan —
      // inspected after the foreach, so AQE's materialized stages and
      // ReusedExchange nodes are present (a fresh unexecuted query
      // would structurally report zero reuse regardless of runtime
      // behavior)
      val plan = lastDf.queryExecution.executedPlan
      def countIn(p: org.apache.spark.sql.execution.SparkPlan,
          pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
        var n = 0
        def walk(q: org.apache.spark.sql.execution.SparkPlan): Unit = {
          if (pred(q)) n += 1
          q.children.foreach(walk)
          q match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              walk(i.relation.cachedPlan)
            case q2: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q2.plan)
            case _ =>
          }
        }
        walk(p)
        n
      }
      val scans = countIn(plan, {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("documents"))
        case _ => false
      })
      val reused = countIn(plan,
        _.isInstanceOf[org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec]) // counted for context
      val reusedEx = countIn(plan,
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
      val cached = countIn(plan,
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
      val wallsJ = walls.map(w => f"${w._1}%.3f").mkString("[", ",", "]")
      // stage_s2 stamps the arm that actually RAN (the D8Probe
      // discipline) — the free-text variant label alone could
      // mis-record which arm produced the walls
      println(f"""{"probe":"c46_stage_profile","variant":"${ProbeJson.esc(variant)}","stage_s2":$stageS2,"cpus":$cpus,""" +
        f""""sf_dir":"${ProbeJson.esc(sfDir)}","wall_s_min":${walls.drop(1).map(_._1).min}%.3f,""" +
        f""""walls_s":$wallsJ,"jobs_last":${walls.last._2},""" +
        f""""documents_scans_in_plan":$scans,"reused_exchanges":$reusedEx,""" +
        f""""aqe_shuffle_reads":$reused,"in_memory_scans":$cached}""")
    } finally spark.stop()
  }
}
