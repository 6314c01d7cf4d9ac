package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-10 verdict's open question #7: can any IN-SANDBOX corpus
  * reproduce the neighbor-concentration property real text embeddings
  * have (a query's exact top-k confined to FEW coherent cells, with no
  * dominant catch-all cell) — the property the reference's published
  * 0.653@nprobe=5 operating point encodes and the Gaussian-mixture
  * synthetic provably lacks (SURVEY §6 two-knob series)?
  *
  * Fixture: deterministic hashed char-trigram embeddings (d=256,
  * L2-normalized — the c43 featurization applied as an encoder) of the
  * sf documents table. Measurements, one JSON line →
  * results/ngram_fixture_probe.json:
  *   - cell-size skew of a K-cell k-means over the embeddings
  *     (`max_cell_share`, catch-all detector);
  *   - for `nq` sample queries: how many distinct cells hold the exact
  *     top-`topk` (`cells_per_query_mean`), and the share of the top-k
  *     inside the query's single best cell (`top1_cell_share`).
  *
  * Read: real-embedding-like corpora show cells_per_query_mean ≪ K
  * with no catch-all; if this fixture instead shows either a dominant
  * cell or neighbor scatter, the 0.653 calibration bound stands
  * documented with this artifact as the in-sandbox evidence. */
object NgramFixtureProbe {
  private def envI(n: String, d: Int): Int = sys.env.get(n).map(_.toInt).getOrElse(d)

  /** Hashed char-trigram embedding, L2-normalized. Deterministic pure
    * function of the text (no vocabulary, the c43 hashing trick). */
  private[graft] def embed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null && text.length >= 3) {
      var i = 0
      while (i + 3 <= text.length) {
        var h = 0x9E3779B9
        var j = i
        while (j < i + 3) { h = h * 31 + text.charAt(j); j += 1 }
        v(Math.floorMod(h, dim)) += 1f
        i += 1
      }
    }
    var s = 0.0
    var d = 0
    while (d < v.length) { s += v(d).toDouble * v(d); d += 1 }
    if (s > 0) {
      val inv = (1.0 / math.sqrt(s)).toFloat
      d = 0
      while (d < v.length) { v(d) *= inv; d += 1 }
    }
    v
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dim = envI("SPARK_GRAFT_PROBE_DIM", 256)
    val kCells = envI("SPARK_GRAFT_PROBE_K", 256)
    val nq = envI("SPARK_GRAFT_PROBE_NQ", 100)
    val topk = envI("SPARK_GRAFT_PROBE_TOPK", 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val emb = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, t) => (id, embed(t, dim)) }
        .toDF("vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      val model = graft.ann.IVFIndex.build(spark, emb,
        graft.ann.IVFIndex.Params(k = kCells, totalBits = 4,
          splitPolicy = "off")) // measure the RAW k-means cell shape
      val sizes = model.index.toDF().groupBy("cluster_id").count()
        .as[(Int, Long)].collect().map(_._2)
      val maxShare = sizes.max.toDouble / n
      val assign: Map[Long, Int] = model.index.toDF()
        .select(col("id"), col("cluster_id")).as[(Long, Int)].collect().toMap
      val queries = emb.orderBy("vec_id").limit(nq)
        .as[(Long, Array[Float])].collect()
      val gt = graft.ann.KnnExact.topK(spark, emb, queries, topk)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1)
      // flatMap, not map: a query with no ground-truth rows (zero
      // embedding from an all-short/null doc) must not kill the probe
      // after the expensive build (`max` on empty throws)
      val perQuery = queries.flatMap { case (qid, _) =>
        val cells = gt.getOrElse(qid, Array.empty[(Long, Long)])
          .map { case (_, nb) => assign(nb) }
        if (cells.isEmpty) None
        else {
          val byCell = cells.groupBy(identity).view.mapValues(_.length)
          Some((byCell.size.toDouble, byCell.values.max.toDouble / cells.length))
        }
      }
      require(perQuery.nonEmpty, "no query produced ground-truth rows")
      val cellsMean = perQuery.map(_._1).sum / perQuery.length
      val top1Share = perQuery.map(_._2).sum / perQuery.length
      val line =
        s"""{"probe":"ngram_fixture","sf_dir":"$sfDir","n_docs":$n,"dim":$dim,""" +
          s""""k":${sizes.length},"nq":$nq,"topk":$topk,""" +
          s""""max_cell_share":$maxShare,"cells_per_query_mean":$cellsMean,""" +
          s""""top1_cell_share_mean":$top1Share}""" + "\n"
      print(line)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("results"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("results/ngram_fixture_probe.json"), line)
    } finally spark.stop()
  }
}
