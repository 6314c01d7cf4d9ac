package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Phase/stage profile for c42 (trigram stupid-backoff LM) — the r12
  * verdict's one expensive row with an actionable plan finding (its
  * sf1 profile showed 8 cores BEATING 32, i.e. over-scheduled small
  * stages). Runs the operator at the given core count, reports min
  * wall + last-run job/stage counts and the slowest stages, so the
  * stage-count hypothesis is measured rather than argued. Env:
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  * (default 32). Prints one JSON line. */
object C42Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-c42-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // A/B knob: AQE size-based partition coalescing (parallelismFirst
      // = false respects the advisory size instead of core count)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      // A/B knob: allow AQE to re-partition (coalesce) CACHED plan
      // output — off by Spark default, which pins every persisted
      // frame at the full shuffle partition count
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val wall = (for {a <- info.completionTime; b <- info.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.add((info.stageId, wall, info.numTasks))
      }
    })

    try {
      val walls = (0 until 4).map { _ =>
        Thread.sleep(300) // drain async listener events before reset
        jobs = 0; stages.clear()
        val t0 = System.nanoTime()
        operators.PipelineQueries.trigramBackoff(spark, sfDir)
          .queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val st = stages.asScala.toSeq.sortBy(-_._2)
      val top = st.take(8).map { case (id, w, n) => s""""s$id:${w}ms/${n}t"""" }
        .mkString("[", ",", "]")
      println(f"""{"probe":"c42_profile","cpus":$cpus,"sf_dir":"$sfDir",""" +
        f""""wall_s_min":${walls.drop(1).min}%.3f,"jobs_last_run":$jobs,""" +
        f""""stages_last_run":${st.size},"slowest_stages_last_run":$top}""")
    } finally spark.stop()
  }
}
