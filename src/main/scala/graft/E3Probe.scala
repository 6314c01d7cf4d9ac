package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Phase profile for e3 (TPC-H Q5-shaped 6-table join) at sf1 — the one
  * >2×-vs-DuckDB row without a committed profile. Measures, on the same
  * session: (a) the production plan (lineitem ⋈shuffle orders +
  * broadcast dims) with job/stage counts and per-stage walls, and
  * (b) the SCALE-WRONG counterfactual that also broadcasts the filtered
  * orders side (forced via autoBroadcastJoinThreshold), which removes
  * the only shuffle. If (b) collapses the wall while cores don't move
  * it, the gap vs DuckDB is the shuffle's fixed stage-scheduling floor,
  * not compute. Env: SPARK_GRAFT_SF_DIR (default /tmp/sf1),
  * SPARK_GRAFT_CPUS. Prints one JSON line.
  */
object E3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-e3-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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

    def timeRun(label: String): (Double, Int, Int, Seq[(Int, Long, Int)]) = {
      // warm once (page cache, codegen), measure min of 3 like Bench.
      // The listener bus delivers asynchronously, so the counters are
      // drained (sleep — waitUntilEmpty is private API) BEFORE each
      // reset: late events from the prior run must not bleed into the
      // next run's jobs/stages counts
      val walls = (0 until 4).map { _ =>
        Thread.sleep(300)
        jobs = 0; stages.clear()
        val t0 = System.nanoTime()
        operators.Relational.q5MultiJoin(spark, sfDir)
          .queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300) // drain the final run's events too
      import scala.jdk.CollectionConverters._
      val st = stages.asScala.toSeq.sortBy(_._1)
      System.err.println(f"[$label] walls=${walls.map(w => f"$w%.2f").mkString(",")} " +
        f"last-run jobs=$jobs stages=${st.size} " +
        st.map { case (id, w, n) => s"s$id:${w}ms/${n}t" }.mkString(" "))
      (walls.drop(1).min, jobs, st.size, st)
    }

    try {
      val (prodWall, prodJobs, prodStages, _) = timeRun("production")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      val (bcWall, bcJobs, bcStages, _) = timeRun("broadcast-orders")
      // field names carry provenance: wall_s is min of runs 2-4, the
      // job/stage counts come from the LAST run only
      println(f"""{"probe":"e3_sf1_profile","cpus":$cpus,"sf_dir":"$sfDir",""" +
        f""""production":{"wall_s_min":$prodWall%.3f,"jobs_last_run":$prodJobs,"stages_last_run":$prodStages},""" +
        f""""broadcast_orders":{"wall_s_min":$bcWall%.3f,"jobs_last_run":$bcJobs,"stages_last_run":$bcStages}}""")
    } finally spark.stop()
  }
}
