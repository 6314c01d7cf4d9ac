package graft

import org.apache.spark.sql.SparkSession

import graft.ann.{IVFIndex, IVFModel}

/** Cold-start A/B for the AT-REST packed sidecar (IVFModel.savePacked):
  * time-to-first-chunk for a freshly loaded index, sidecar-adopt vs
  * entry re-pack.
  *
  *   entry arm:   load → cache entries (cachedBlockLayout) → pack from
  *                the entry cache → searchAll chunk
  *   sidecar arm: load → adopt packed runs from parquet → searchAll
  *                chunk (the entry cache is never materialized — the
  *                packed scan path does not touch it)
  *
  * The sidecar arm runs FIRST (coldest JIT), biasing the comparison
  * AGAINST the sidecar. Prints one JSON line; tools/ copies it to
  * results/packed_sidecar_ab.json.
  *
  * Env: SPARK_GRAFT_PROFILE_DIR (index; default the 200k dev shape),
  * SPARK_GRAFT_PROFILE_NQ (default 2000 = one chunk),
  * SPARK_GRAFT_PROFILE_NPROBE (default 5), SPARK_GRAFT_SWEEP_* must
  * match the saved index (query synthesis). Pass `write` as arg 1 to
  * (re)build the sidecar for the index and exit — run that in its own
  * JVM first so the measurement JVM starts cold.
  */
object PackedColdProbe {
  private def env(name: String, dflt: Int): Int =
    sys.env.get(name).map(_.toInt).getOrElse(dflt)

  def main(args: Array[String]): Unit = {
    val dim = env("SPARK_GRAFT_SWEEP_DIM", 1536)
    val nVecs = env("SPARK_GRAFT_SWEEP_VECS", 200000)
    val kClusters = env("SPARK_GRAFT_SWEEP_K", 4096)
    val topics = env("SPARK_GRAFT_SWEEP_TOPICS", math.max(64, nVecs / 20))
    val noise = sys.env.get("SPARK_GRAFT_SWEEP_NOISE").map(_.toFloat).getOrElse(0.35f)
    val blend = sys.env.get("SPARK_GRAFT_SWEEP_BLEND").map(_.toFloat).getOrElse(0f)
    val nq = env("SPARK_GRAFT_PROFILE_NQ", 2000)
    val nprobe = env("SPARK_GRAFT_PROFILE_NPROBE", 5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIR",
      s"/tmp/graft_profile_index_${dim}_${nVecs}_$kClusters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-packed-cold-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      if (args.headOption.contains("write")) {
        // one-time: establish the canonical layout and persist the
        // packed sidecar for it (what save() does at build time)
        val loaded = IVFModel.load(spark, dir)
        val m = new IVFModel(loaded.params, loaded.rotator, loaded.centroids,
          loaded.rotatedCentroids, IVFIndex.cachedBlockLayout(spark, loaded.index))
        m.index.queryExecution.toRdd.foreach(_ => ())
        val t0 = System.nanoTime()
        m.savePacked(dir)
        println(f"""{"probe":"packed_sidecar_write","dir":"$dir","wall_s":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        return
      }

      val bcCenters = spark.sparkContext.broadcast(
        SweepRef.topicCenters(topics, dim))
      val qdf = SweepRef.synthDf(bcCenters, blend, noise,
        spark.range(nq.toLong).as[java.lang.Long].repartition(cpus.toInt),
        seedBase = 0x9E3779B97F4A7C15L)

      /** One cold arm: fresh load → prepare scan state → one searchAll
        * chunk. Returns (prep_s, search_s, result rows hash). */
      def arm(useSidecar: Boolean): (Double, Double, Long, Long) = {
        val t0 = System.nanoTime()
        val loaded = IVFModel.load(spark, dir)
        val loadS = (System.nanoTime() - t0) / 1e9
        val m =
          if (useSidecar) {
            require(loaded.packedAtRestDir.isDefined,
              s"no coherent packed sidecar at $dir — run `write` first")
            // the sidecar pins the canonical layout, so adopt it onto
            // the canonical re-layout model (what load-at-build does)
            val w = new IVFModel(loaded.params.copy(queryBits = 14),
              loaded.rotator, loaded.centroids, loaded.rotatedCentroids,
              loaded.index) // entries stay UNMATERIALIZED on this arm
            w.packedAtRestDir = loaded.packedAtRestDir
            w
          } else {
            val w = new IVFModel(loaded.params.copy(queryBits = 14),
              loaded.rotator, loaded.centroids, loaded.rotatedCentroids,
              IVFIndex.cachedBlockLayout(spark, loaded.index))
            w.index.queryExecution.toRdd.foreach(_ => ()) // cache entries
            w
          }
        val tCache = (System.nanoTime() - t0) / 1e9 - loadS
        m.packedIndex(spark) // pack (entry arm) or adopt (sidecar arm)
        val prep = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[arm sidecar=$useSidecar] load=$loadS%.2f " +
          f"entry_cache=$tCache%.2f pack_or_adopt=${prep - loadS - tCache}%.2f")
        val t1 = System.nanoTime()
        val res = m.searchAll(spark, qdf, 100, nprobe, chunk = 2048)
        val (rows, chk) = res.select("neighbor_id").as[Long]
          .rdd.map(v => (1L, v)).reduce((a, b) => (a._1 + b._1, a._2 ^ b._2))
          match { case (n, x) => (n, x) }
        val search = (System.nanoTime() - t1) / 1e9
        m.freeSearchCaches()
        m.index.unpersist(blocking = true)
        (prep, search, rows, chk)
      }

      // JIT/codegen warmup on a throwaway model, so arm ORDER stops
      // polluting the search walls (first-arm searches measured 3-19 s
      // slower from cold JIT alone before this)
      locally {
        val warm = IVFModel.load(spark, dir)
        val w = new IVFModel(warm.params.copy(queryBits = 14), warm.rotator,
          warm.centroids, warm.rotatedCentroids,
          IVFIndex.cachedBlockLayout(spark, warm.index))
        w.search(spark, qdf.as[(Long, Array[Float])].head(8), 100, nprobe).count()
        w.freeSearchCaches()
        w.index.unpersist(blocking = true)
      }

      // sidecar arm FIRST: any residual cold bias lands on the arm under test
      val (prepS, searchS, rowsS, chkS) = arm(useSidecar = true)
      val (prepE, searchE, rowsE, chkE) = arm(useSidecar = false)
      require(rowsS == rowsE && chkS == chkE,
        s"arms diverged: sidecar ($rowsS, $chkS) vs entry ($rowsE, $chkE)")
      println(f"""{"probe":"packed_sidecar_cold_ab","dir":"$dir","nq":$nq,"nprobe":$nprobe,""" +
        f""""sidecar":{"prep_s":$prepS%.2f,"search_s":$searchS%.2f,"total_s":${prepS + searchS}%.2f},""" +
        f""""entry_repack":{"prep_s":$prepE%.2f,"search_s":$searchE%.2f,"total_s":${prepE + searchE}%.2f},""" +
        f""""rows":$rowsS,"results_equal":true}""")
    } finally spark.stop()
  }
}
