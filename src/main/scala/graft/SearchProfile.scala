package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{IVFIndex, IVFModel}

/** Dev harness behind SURVEY §6's batch-search chunk-cost breakdown:
  * build (once) and SAVE a reference-shape index, then on every
  * subsequent run LOAD it, re-establish the build-time cached block
  * layout, and drive `searchAll` with SPARK_GRAFT_SEARCH_PROFILE=1 —
  * so a profile-fix-reprofile loop pays seconds, not the multi-minute
  * rebuild. The corpus generator is SweepRef's (bit-identical data).
  *
  * Env: SPARK_GRAFT_SWEEP_{VECS,DIM,K,TOPICS,NOISE,BLEND,TRAIN} size
  * the index (defaults = a 200k-vector slice of the reference shape);
  * SPARK_GRAFT_PROFILE_DIR locates the saved index;
  * SPARK_GRAFT_PROFILE_NQ / _NPROBE / _CHUNK shape the batch.
  */
object SearchProfile {
  private def env(name: String, dflt: Int): Int =
    sys.env.get(name).map(_.toInt).getOrElse(dflt)

  def main(args: Array[String]): Unit = {
    val dim = env("SPARK_GRAFT_SWEEP_DIM", 1536)
    val nVecs = env("SPARK_GRAFT_SWEEP_VECS", 200000)
    val kClusters = env("SPARK_GRAFT_SWEEP_K", 4096)
    val trainRows = env("SPARK_GRAFT_SWEEP_TRAIN", 65536)
    val topics = env("SPARK_GRAFT_SWEEP_TOPICS", math.max(64, nVecs / 20))
    val noise = sys.env.get("SPARK_GRAFT_SWEEP_NOISE").map(_.toFloat).getOrElse(0.35f)
    val blend = sys.env.get("SPARK_GRAFT_SWEEP_BLEND").map(_.toFloat).getOrElse(0f)
    val nq = env("SPARK_GRAFT_PROFILE_NQ", 10000)
    val nprobe = env("SPARK_GRAFT_PROFILE_NPROBE", 5)
    val chunk = env("SPARK_GRAFT_PROFILE_CHUNK", 2048)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIR",
      s"/tmp/graft_profile_index_${dim}_${nVecs}_$kClusters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-search-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val bcCenters = spark.sparkContext.broadcast(
        SweepRef.topicCenters(topics, dim))
      val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
      val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(metaPath)) {
        println(s"building profile index at $dir ...")
        val t0 = System.nanoTime()
        val base = SweepRef.synthDf(bcCenters, blend, noise,
          spark.range(nVecs).as[java.lang.Long].repartition(cpus.toInt * 2),
          seedBase = 0x5DEECE66DL)
        val model = IVFIndex.build(spark, base,
          IVFIndex.Params(k = kClusters, totalBits = 4,
            maxTrainRows = trainRows.toLong,
            kmeansInitMode =
              sys.env.getOrElse("SPARK_GRAFT_SWEEP_INIT", "k-means||"),
            kmeansInitSteps = env("SPARK_GRAFT_SWEEP_INIT_STEPS", 1)))
        model.save(dir)
        println(f"built + saved in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      val t1 = System.nanoTime()
      val loaded = IVFModel.load(spark, dir)
      val model = new IVFModel(
        loaded.params.copy(queryBits = 14), loaded.rotator, loaded.centroids,
        loaded.rotatedCentroids,
        IVFIndex.cachedBlockLayout(spark, loaded.index))
      model.index.queryExecution.toRdd.foreach(_ => ())
      println(f"loaded + cached in ${(System.nanoTime() - t1) / 1e9}%.1f s")

      val qdf = SweepRef.synthDf(bcCenters, blend, noise,
        spark.range(nq.toLong).as[java.lang.Long].repartition(cpus.toInt),
        seedBase = 0x9E3779B97F4A7C15L)
      // one small warm call (JIT + codegen), then the timed batch
      model.search(spark, qdf.as[(Long, Array[Float])].head(8)
        .map(t => (t._1, t._2)), 100, nprobe).count()
      val w0 = System.nanoTime()
      val n = model.searchAll(spark, qdf, 100, nprobe, chunk = chunk).count()
      val wall = (System.nanoTime() - w0) / 1e9
      println(f"batch nq=$nq%d nprobe=$nprobe%d chunk=$chunk%d rows=$n%d " +
        f"wall=$wall%.1f s qps=${nq / wall}%.2f")
    } finally spark.stop()
  }
}
