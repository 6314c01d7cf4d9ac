package graft

import org.apache.spark.sql.SparkSession

/** Scale adjudication for the LM family (c27 / c28 / c42) — the
  * round-14 verdict's one perf-weak row is c42 at 3.03× DuckDB on a
  * 0.51 s denominator, with a committed floor profile (24 AQE stages,
  * slowest 0.6 s) claiming the gap is per-stage scheduling, not plan
  * cost. That claim predicts the ratio COLLAPSES once DuckDB itself
  * does multi-second work: Spark's fixed per-stage cost amortizes
  * while both engines' data-proportional work grows in step. This
  * probe measures the Spark side on the persistent documents-only
  * slice (`tools/make_lm_slice.py`, default `.scratch/sf5lm` = 50×
  * sf0.1 docs); `tools/lm_slice_duckdb.py` times the same three oracle
  * SQL texts on the same files, and the committed JSON pair is the
  * adjudication artifact.
  *
  * Round 16 generalizes the probe to ANY oracle-identical key list
  * (SPARK_GRAFT_KEYS, comma-separated) so the same instrument
  * adjudicates the remaining unproven sf1 ratios (c32 / e3 / e1 /
  * c25 / d1) on the sf50 / sf100lm slices — the c42 treatment,
  * verbatim.
  *
  * Env: SPARK_GRAFT_SF_DIR (default .scratch/sf5lm), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_RUNS (default 4, first discarded as
  * warmup, MIN of the rest reported — the Bench protocol),
  * SPARK_GRAFT_KEYS (default the LM trio). Prints one
  * JSON line with per-query min walls and all raw runs (the round-15
  * dispersion discipline: every committed number carries its spread).
  */
object LmScaleProbe {
  private val DefaultKeys =
    Seq("c27_lm_perplexity", "c28_dsir_weight", "c42_trigram_lm")

  def main(args: Array[String]): Unit = {
    // locale-safe JSON (the D12Probe rule for every JSON-emitting main)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", ".scratch/sf5lm")
    // parsed to Int so a non-numeric env value fails here, not as a
    // garbage bare token in the emitted JSON (ADVICE r15)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val keys = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultKeys)
    keys.foreach(k => require(SparkEntry.queries.contains(k),
      s"unknown query key '$k' in SPARK_GRAFT_KEYS"))
    // first run is discarded as warmup, so ≥ 2 or the min is undefined
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt.max(2)
    // SPARK_GRAFT_LOCAL_DIR (e.g. /dev/shm/spark-local): shuffle/spill
    // dir override, the PlanDump hook — isolates the local-disk
    // shuffle tax (this VM's virtio disk writes ~330 MB/s) from the
    // plan cost. The dir used is stamped into the JSON row.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
    // SPARK_GRAFT_IO_CODEC (lz4|zstd|snappy|lzf): shuffle/spill codec
    // A/B (guide §2.3 "compression" — r16 verdict item 4 asked for a
    // serializer/compression A/B on e3's 1.1 GB fact shuffle). The
    // codec used is stamped into the JSON row.
    val ioCodec = sys.env.get("SPARK_GRAFT_IO_CODEC")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lm-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = Seq(
        localDir.map("spark.local.dir" -> _),
        ioCodec.map("spark.io.compression.codec" -> _))
      .flatten.foldLeft(builder)((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results = keys.map { k =>
        val walls = (0 until runs).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(k)(spark, sfDir)
            .queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        }
        Scratch.reap()
        val timed = walls.drop(1)
        (k, timed.min, walls)
      }
      val fields = results.map { case (k, mn, ws) =>
        val raw = ws.map(w => f"$w%.3f").mkString("[", ",", "]")
        f""""${ProbeJson.esc(k)}":{"min_s":$mn%.3f,"runs_s":$raw}"""
      }.mkString(",")
      val localJson = localDir.fold("")(d =>
        s""","local_dir":"${ProbeJson.esc(d)}"""") +
        ioCodec.fold("")(c => s""","io_codec":"${ProbeJson.esc(c)}"""")
      println(
        s"""{"probe":"lm_scale","sf_dir":"${ProbeJson.esc(sfDir)}","cpus":$cpus$localJson,$fields}""")
    } finally spark.stop()
  }
}
