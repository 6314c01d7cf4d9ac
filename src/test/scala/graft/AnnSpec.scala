package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{IVFIndex, RaBitQ, Rotator}
import graft.functions.VectorFunctions.{dot, l2sq}

class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def randVec(rnd: scala.util.Random, d: Int): Array[Float] =
    Array.fill(d)(rnd.nextGaussian().toFloat)

  test("rotator is orthonormal: norms and dots preserved") {
    val rot = new Rotator(64, seed = 7)
    val rnd = new scala.util.Random(1)
    val a = randVec(rnd, 64); val b = randVec(rnd, 64)
    val ra = rot.rotate(a); val rb = rot.rotate(b)
    assert(math.abs(dot(ra, ra) - dot(a, a)) < 1e-3)
    assert(math.abs(dot(ra, rb) - dot(a, b)) < 1e-3)
  }

  test("rotateAll is bit-identical to serial per-vector rotation") {
    // every load AND build now rotates the centroid table through the
    // parallel path — it must never diverge from rotate() by a bit
    val rot = new Rotator(64, seed = 11)
    val rnd = new scala.util.Random(5)
    val vs = Array.fill(257)(randVec(rnd, 64)) // odd count: uneven fork splits
    val par = rot.rotateAll(vs)
    val ser = vs.map(rot.rotate)
    assert(par.length == ser.length &&
      par.indices.forall(i => par(i).sameElements(ser(i))))
  }

  test("rotator is deterministic from (dim, seed)") {
    val r1 = new Rotator(64, 42); val r2 = new Rotator(64, 42)
    assert(r1.matrix.zip(r2.matrix).forall { case (a, b) => a.sameElements(b) })
  }

  test("exCode bit-packing roundtrips for every supported width") {
    val rnd = new scala.util.Random(17)
    for (exBits <- Seq(2, 3, 4, 6, 7, 8)) {
      val values = Array.fill(128)(rnd.nextInt(1 << exBits))
      val packed = RaBitQ.packBits(values, exBits)
      assert(packed.length == (128 * exBits + 7) / 8 + 1)
      values.indices.foreach { i =>
        assert(RaBitQ.unpackAt(packed, i, exBits) == values(i), s"exBits=$exBits i=$i")
      }
    }
  }

  test("rerank distance is far more accurate than 1-bit estimate") {
    val rnd = new scala.util.Random(5)
    val d = 64
    val exBits = 3
    // residual plays both data and geometry roles: query at origin-ish
    var errEst = 0.0; var errEx = 0.0; var n = 0
    var lbViol = 0
    for (_ <- 1 to 50) {
      val res = randVec(rnd, d)
      val q = RaBitQ.quantize(res, exBits)
      // query residual = true residual + noise
      val qres = res.map(v => v + rnd.nextGaussian().toFloat * 0.1f)
      val qc = RaBitQ.QueryCluster(qres, qres.map(_.toDouble).sum, dot(qres, qres))
      val exact = l2sq(qres, res)
      val (est, lower) = RaBitQ.estimate(qc, q)
      val ex = RaBitQ.rerank(qc, q, exBits)
      // the bound is probabilistic (the random-query test below pins
      // >95%); here the CORRELATED regime must hold at least as often —
      // a per-sample hard assert would flake, a disjunct with
      // `lower <= est` is vacuously true (lower = est − err·y, both
      // factors non-negative)
      if (lower > exact + 1e-6) lbViol += 1
      errEst += math.abs(est - exact); errEx += math.abs(ex - exact); n += 1
    }
    assert(lbViol <= 2, s"lower bound violated on $lbViol/50 correlated queries")
    assert(errEx / n < errEst / n, "extended code must improve on the sign code")
    assert(errEx / n < 0.5, s"rerank mean abs error too high: ${errEx / n}")
  }

  test("1-bit estimator: lower bound holds with high probability") {
    val rnd = new scala.util.Random(11)
    val d = 64
    var holds = 0; var total = 0
    for (_ <- 1 to 200) {
      val res = randVec(rnd, d)
      val q = RaBitQ.quantize(res, 3)
      val qres = randVec(rnd, d)
      val qc = RaBitQ.QueryCluster(qres, qres.map(_.toDouble).sum, dot(qres, qres))
      val exact = l2sq(qres, res)
      val (_, lower) = RaBitQ.estimate(qc, q)
      if (lower <= exact + 1e-9) holds += 1
      total += 1
    }
    assert(holds.toDouble / total > 0.95, s"lower bound held only $holds/$total")
  }

  test("IVF search recall@10 >= 0.9 vs exact GT at sf0.001") {
    import spark.implicits._
    val approx = operators.AnnQueries.ivfSearch(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = operators.VectorQueries.gtTopKAll(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("searchAll: chunked query-set search equals the one-shot broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val m = operators.AnnQueries.model(spark, sf)
    // the whole embeddings table as the query set — 500 queries, far
    // past the chunk bound below, so the union spans many chunks
    val queriesDF = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val qArr = queriesDF.as[(Long, Array[Float])].collect().sortBy(_._1)
    val oneShot = m.search(spark, qArr, 10, 12)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val chunked = m.searchAll(spark, queriesDF, 10, 12, chunk = 64)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(chunked.length == qArr.length * 10)
    assert(chunked.toSeq == oneShot.toSeq,
      "chunked search must be result-identical to the single broadcast")
    // chunk larger than the set: one flush, same answer
    val single = m.searchAll(spark, queriesDF, 10, 12, chunk = 100000)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(single.toSeq == oneShot.toSeq)
    // empty query set: empty result with the search schema
    val empty = m.searchAll(spark, queriesDF.filter(col("vec_id") < 0), 10, 12)
    assert(empty.columns.toSeq == Seq("query_id", "neighbor_id", "rk"))
    assert(empty.count() == 0)
    // durable-chunk mode: same answer, chunks on disk, completion
    // manifest written
    val outDir = java.nio.file.Files.createTempDirectory("searchall_durable").toString + "/run1"
    val durable = m.searchAll(spark, queriesDF, 10, 12, chunk = 64,
        outputDir = Some(outDir))
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(durable.toSeq == oneShot.toSeq,
      "durable-chunk mode must be result-identical to the single broadcast")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(outDir, "chunk-7", "_SUCCESS")),
      "each chunk must be durably written as it completes")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"chunks\":8") && manifest.contains("\"queries\":500"),
      s"manifest must record the run's shape: $manifest")
    // a USED dir is refused loudly — chunk dirs are positional, so a
    // second run into the same dir could silently mix query sets
    val ex = intercept[IllegalStateException] {
      m.searchAll(spark, queriesDF, 10, 12, chunk = 64, outputDir = Some(outDir))
    }
    assert(ex.getMessage.contains("fresh directory"), ex.getMessage)
    // ...including a dir holding only an aborted run's chunks (no manifest)
    val abortedDir = java.nio.file.Files.createTempDirectory("searchall_aborted").toString
    spark.range(1).selectExpr("CAST(id AS BIGINT) AS query_id",
        "CAST(99999 AS BIGINT) AS neighbor_id", "CAST(1 AS INT) AS rk")
      .write.parquet(s"$abortedDir/chunk-30")
    intercept[IllegalStateException] {
      m.searchAll(spark, queriesDF, 10, 12, chunk = 64, outputDir = Some(abortedDir))
    }
  }

  test("8-bit config: end-to-end build + search reaches near-exact recall") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val m = ann.IVFIndex.build(spark, e, ann.IVFIndex.Params(totalBits = 8))
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val approx = m.search(spark, qs, 10, nprobe = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = operators.VectorQueries.gtTopKAll(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"B=8 recall@10 = $recall")
  }

  test("recall sweep over every supported bit width B in {3,4,5,7,8,9}") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val exact = operators.VectorQueries.gtTopKAll(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val widths = Seq(3, 4, 5, 7, 8, 9)
    // full probe (nprobe = K) so the curve isolates quantization error
    // from cluster-coverage error
    val recalls = widths.map { b =>
      val p = ann.IVFIndex.Params(totalBits = b)
      val m = ann.IVFIndex.build(spark, e, p)
      val approx = m.search(spark, qs, 10, nprobe = p.k)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      m.index.unpersist() // don't pin 6 throwaway indexes for the suite
      m.freeSearchCaches() // nor their packed twins / broadcasts
      b -> (approx & exact).size.toDouble / exact.size
    }
    val byWidth = recalls.toMap
    // the pure quantized path plateaus just under 1.0 (a near-tie can
    // be displaced by code-rerank error); ≥0.99 is the high-accuracy
    // path's contract, pinned in the next test
    assert(byWidth(8) >= 0.98, s"B=8 recall = ${byWidth(8)}; all: $recalls")
    assert(byWidth(9) >= 0.98, s"B=9 recall = ${byWidth(9)}; all: $recalls")
    assert(byWidth(8) > byWidth(3), s"recall curve not increasing: $recalls")
    // monotone up to a small tolerance (more code bits -> better rerank)
    recalls.sliding(2).foreach { case Seq((b1, r1), (b2, r2)) =>
      assert(r2 >= r1 - 0.03, s"recall dropped from B=$b1 ($r1) to B=$b2 ($r2): $recalls")
    }
  }

  test("high-accuracy search: exact re-rank reaches recall >= 0.99 at full probe") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val m = operators.AnnQueries.model(spark, sf) // B=4 — the fast config
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val approx = m.searchHighAcc(spark, e, qs, k = 10, nprobe = m.params.k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = operators.VectorQueries.gtTopKAll(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.99, s"high-acc recall@10 = $recall")
  }

  test("nprobe sweep: recall is non-decreasing in nprobe, ratio sane") {
    import spark.implicits._
    val sweep = operators.AnnQueries.nprobeSweep(spark, sf)
      .select("nprobe", "recall_at_10", "avg_ratio").as[(Int, Double, Double)]
      .collect().sortBy(_._1)
    assert(sweep.length == 6)
    sweep.sliding(2).foreach { case Array((n1, r1, _), (n2, r2, _)) =>
      assert(r2 >= r1, s"recall dropped from nprobe=$n1 ($r1) to nprobe=$n2 ($r2)")
    }
    assert(sweep.last._2 >= 0.9, s"full-probe recall = ${sweep.last._2}")
    sweep.foreach { case (np, _, ratio) =>
      assert(ratio >= 1.0 - 1e-9, s"ratio below 1 at nprobe=$np: $ratio")
      assert(ratio < 2.0, s"ratio implausibly high at nprobe=$np: $ratio")
    }
  }

  test("filtered search: only allowed ids, recall holds vs filtered GT") {
    import spark.implicits._
    val m = operators.AnnQueries.model(spark, sf)
    val e = Tables.embeddings(spark, sf)
    val allowed = e.filter($"vec_id" % 2 === 0).select($"vec_id")
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val got = m.searchFiltered(spark, qs, 10, nprobe = m.params.k, allowed)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.forall(_._2 % 2 == 0), "a disallowed id leaked into filtered results")
    assert(got.length == qs.length * 10, "filtered heaps must still fill to k")
    val exact = graft.ann.KnnExact.topK(spark,
        e.filter($"vec_id" % 2 === 0), qs, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.9, s"filtered recall@10 = $recall")
  }

  test("LUT estimate at 14 bits tracks the exact-float estimate closely") {
    val rnd = new scala.util.Random(11)
    val d = 64
    val rot = new Rotator(d, 5)
    for (_ <- 1 to 50) {
      val q = randVec(rnd, d); val c = randVec(rnd, d)
      val x = randVec(rnd, d)
      val xr = rot.rotate(x); val cr = rot.rotate(c)
      val residual = xr.indices.map(i => xr(i) - cr(i)).toArray
      val ent = RaBitQ.quantize(residual, exBits = 3)
      val qcF = RaBitQ.prepareQuery(rot.rotate(q), cr)
      val qcQ = RaBitQ.prepareQuery(rot.rotate(q), cr, queryBits = 14)
      val estF = RaBitQ.estimateDist(qcF, ent.signBits, ent.x2, ent.facIp)
      val estQ = RaBitQ.estimateDistLut(qcQ, ent.signBits, ent.x2, ent.facIp)
      val scale = math.max(1.0, math.abs(estF))
      assert(math.abs(estF - estQ) / scale < 1e-3,
        s"LUT estimate diverged: float=$estF lut=$estQ")
    }
  }

  test("query-side scalar quantization: recall within 0.01 of the float path") {
    import spark.implicits._
    val m = operators.AnnQueries.model(spark, sf)
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val gt = operators.VectorQueries.gtTopKAll(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(model: graft.ann.IVFModel): Double = {
      val got = model.search(spark, qs, 10, nprobe = 12)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      got.count(gt.contains).toDouble / gt.size
    }
    val rFloat = recallOf(m)
    val rQuant = recallOf(m.withQueryBits(14))
    assert(rQuant >= rFloat - 0.01,
      s"quantized-query recall $rQuant dropped more than 0.01 below float $rFloat")
    // coarse quantization: the widened lower bound (quantization error
    // folded into the pruning margin) must cost reranks, not neighbors
    val rCoarse = recallOf(m.withQueryBits(6))
    assert(rCoarse >= rFloat - 0.01,
      s"queryBits=6 recall $rCoarse dropped more than 0.01 below float $rFloat")
  }

  test("filtered search survives a non-broadcastable allowed set (shuffled semi-join)") {
    import spark.implicits._
    val m = operators.AnnQueries.model(spark, sf)
    val e = Tables.embeddings(spark, sf)
    val allowed = e.filter($"vec_id" % 2 === 0).select($"vec_id")
    val qs = operators.VectorQueries.queryVectors(spark, sf)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // Forbid broadcast entirely: the planner must pick a shuffled
    // semi-join, the path a billions-of-ids allowed set takes at scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = m.searchFiltered(spark, qs, 10, nprobe = m.params.k, allowed)
      // scope the check to the semi-join's own plan lines: the cached
      // index's BUILD plan (which legitimately broadcasts the tiny
      // per-cluster block-count table) renders inside InMemoryRelation
      // and would trip a whole-string BroadcastExchange match, but
      // nothing in it executes at search time
      val plan = got.queryExecution.executedPlan.toString
      val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
      assert(semiLines.nonEmpty, s"expected a semi-join in the filtered-search plan:\n$plan")
      assert(semiLines.forall(l => !l.contains("Broadcast")),
        s"allowed-set semi-join still broadcasts with threshold=-1:\n$plan")
      val rows = got.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      assert(rows.forall(_._2 % 2 == 0), "a disallowed id leaked through the shuffled path")
      assert(rows.length == qs.length * 10, "shuffled-path heaps must still fill to k")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("routed centroid ranking closely matches flat ranking at large K") {
    val rnd = new scala.util.Random(23)
    val k = 2048
    val cents = Array.fill(k)(randVec(rnd, 64))
    val router = new graft.ann.CentroidRouter(cents)
    var overlap = 0.0
    val trials = 20
    for (_ <- 1 to trials) {
      val q = randVec(rnd, 64)
      val flat = router.rankFlat(q, 64).toSet
      val routed = router.rank(q, 64).toSet
      overlap += (flat & routed).size.toDouble / 64
    }
    assert(overlap / trials >= 0.9, s"routing overlap = ${overlap / trials}")
    // routed ranking is deterministic
    val q = randVec(rnd, 64)
    assert(router.rank(q, 32).toSeq == router.rank(q, 32).toSeq)
  }

  test("routed branch of IVFModel.search: recall holds at K >= threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    val kCent = graft.ann.IVFModel.RoutedRankingThreshold // 4096 -> routed branch
    val cents = Array.fill(kCent)(randVec(rnd, dim))
    val n = 400
    val vecs = (0 until n).map(i => (i.toLong, randVec(rnd, dim)))
    val df = vecs.toDF("id", "vec")
    val m = graft.ann.IVFIndex.buildWithCentroids(
      spark, df, cents, dim, graft.ann.IVFIndex.Params(k = kCent, totalBits = 8))
    val queries = vecs.take(4).map { case (id, v) => (id, v) }.toArray
    val approx = m.search(spark, queries, k = 5, nprobe = 512)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.ann.KnnExact.topK(spark, df, queries, k = 5,
      idCol = "id", vecCol = "vec")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"routed-branch recall@5 = $recall")
    // self-match must always be found (query vectors are in the corpus)
    queries.foreach { case (qid, _) => assert(approx.contains((qid, qid))) }
  }

  test("fat-cluster split: catch-all cell splits, recall holds, off-paths unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, max => fmax}
    val dim = 16
    // planted catch-all: 90% of vectors in one tight blob (the k-means
    // shape the split targets), the rest across 15 spread blobs
    val data = (0 until 2000).map { i =>
      val rnd = new scala.util.Random(i * 1000003L)
      val c = if (i % 10 != 0) 0 else 1 + (i / 10) % 15
      val v = Array.tabulate(dim)(d =>
        (math.sin(c * 37.0 + d) * 4.0).toFloat + rnd.nextGaussian().toFloat * 0.2f)
      (i.toLong, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val base = IVFIndex.Params(k = 8, totalBits = 8)
    val mA = IVFIndex.build(spark, df, base)
    val mB = IVFIndex.build(spark, df, base.copy(maxClusterFactor = 3.0))
    assert(mB.centroids.length > mA.centroids.length,
      s"fat cell must split: K ${mA.centroids.length} -> ${mB.centroids.length}")
    def maxCell(m: graft.ann.IVFModel): Long =
      m.index.groupBy("cluster_id").agg(cnt(org.apache.spark.sql.functions.lit(1)).as("n"))
        .agg(fmax("n")).head().getLong(0)
    val (cellA, cellB) = (maxCell(mA), maxCell(mB))
    // the sample IS the full data here (2000 < maxTrainRows), so the
    // post-split max cell must land under cap = factor × mean ± the
    // drift from final assignment running against the enriched set
    val cap = 3.0 * 2000 / mA.centroids.length
    assert(cellB < cellA && cellB <= (cap * 1.2).toLong,
      s"split must bring the catch-all under cap≈$cap: $cellA -> $cellB")
    // recall vs exact GT at full probe (quantization-bound, B=8)
    val queries = data.take(50).toArray
    val exact = graft.ann.KnnExact.topK(spark, df, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = mB.search(spark, queries, 10, nprobe = mB.centroids.length)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"split-index recall@10 = $recall")
    // the regime the split exists to serve: REALISTIC nprobe (a quarter
    // of the enriched K), not just nprobe=all. This fixture's fat cell
    // is ONE tight blob, so some fixed-nprobe recall trade is the
    // honest geometry (the r10 sweep's finding — flat probes the whole
    // catch-all in one cell); the bound pins that children stay
    // probe-RANKED coherently: recall well above the random-scatter
    // floor (probing 2 of the ~3 children ⇒ ~0.67 if neighbors
    // scattered randomly) and within a modest band of the unsplit
    // index. The auto-policy spec below pins the hold-vs-trade
    // DISTINCTION on sub-blob vs wide-ball fixtures.
    val npSmall = math.max(2, mB.centroids.length / 4)
    def recallAt(m: graft.ann.IVFModel, np: Int): Double = {
      val a = m.search(spark, queries, 10, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (a & exact).size.toDouble / exact.size
    }
    val (rSplitSmall, rFlatSmall) = (recallAt(mB, npSmall), recallAt(mA, npSmall))
    assert(rSplitSmall >= rFlatSmall - 0.2 && rSplitSmall >= 0.75,
      s"small-nprobe($npSmall) recall: split=$rSplitSmall flat=$rFlatSmall")
    // no-fat path: a cap nothing exceeds returns the SAME centroid array
    val sampled = df.select("vec_id", "embedding").as[(Long, Array[Float])]
      .rdd.map(_._2)
    val untouched = IVFIndex.splitFatClusters(
      spark, sampled, mA.centroids, base.copy(maxClusterFactor = 1000.0))
    assert(untouched.length == mA.centroids.length &&
      untouched.zip(mA.centroids).forall { case (a, b) => a sameElements b },
      "no cell over cap: the centroid set must pass through unchanged")
    // routedAssign below the K threshold must not engage: entries
    // byte-identical to the flag-off build given the same centroids
    def entries(m: graft.ann.IVFModel) = m.index.collect()
      .map(e => (e.id, e.cluster_id, e.sign_bits.toSeq, e.ex_code.toSeq,
        e.x2, e.fac_ip, e.sum_xb, e.fac_err, e.xipnorm))
      .sortBy(_._1).toSeq
    val dfIv = df.toDF("id", "vec")
    val mOff = IVFIndex.buildWithCentroids(spark, dfIv, mA.centroids, dim, base)
    val mOn = IVFIndex.buildWithCentroids(spark, dfIv, mA.centroids, dim,
      base.copy(routedAssign = true))
    assert(entries(mOn) == entries(mOff),
      "routedAssign below RoutedRankingThreshold must leave the flat path byte-identical")
  }

  test("auto split policy: self-probe ships the split on artifact cells, vetoes it on mass") {
    // Deterministic by construction: hand-placed flat centroids (no
    // k-means in the loop), seeded data, seeded member subsample +
    // probe queries. Both fixtures share the layout "one fat cell at
    // the origin region + 63 thin far cells" (k0=64 ⇒ auto cap =
    // 8 × 2760/64 ≈ 345 < the region's 1800 rows ⇒ fat; probe
    // nprobe = max(2, 64/50) = 2 < the ~8 children the split makes,
    // so the probe can actually discriminate).
    import spark.implicits._
    val dim = 32
    def farBlob(j: Int, n: Int): Seq[Array[Float]] = {
      val c = Array.tabulate(dim)(d => (math.sin(j * 97.0 + d) * 40.0).toFloat)
      (0 until n).map { i =>
        val rnd = new scala.util.Random(j * 7919L + i)
        c.map(_ + rnd.nextGaussian().toFloat * 0.05f)
      }
    }
    def farCentroids: Array[Array[Float]] =
      (1 to 63).map(j => Array.tabulate(dim)(d =>
        (math.sin(j * 97.0 + d) * 40.0).toFloat)).toArray
    val far: Seq[Array[Float]] = (1 to 63).flatMap(j => farBlob(j, 15))
    // ARTIFACT region: 12 tight sub-blobs (σ=0.05) spread 6 apart —
    // one catch-all cell whose members are genuinely multi-modal, the
    // k-means-failure shape. A query's true neighbors all live in its
    // own sub-blob, so the split's children preserve recall.
    val artifactRegion: Seq[Array[Float]] = (0 until 12).flatMap { b =>
      val c = Array.tabulate(dim)(d => (math.cos(b * 31.0 + d) * 6.0).toFloat)
      (0 until 150).map { i =>
        val rnd = new scala.util.Random(b * 1000003L + i)
        c.map(_ + rnd.nextGaussian().toFloat * 0.05f)
      }
    }
    // MASS region: one wide d=32 Gaussian ball — neighbors are spread
    // through the ball (distance concentration), so children scatter a
    // query's true top-k and fixed-nprobe recall collapses.
    val massRegion: Seq[Array[Float]] = (0 until 1800).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      Array.fill(dim)(rnd.nextGaussian().toFloat * 3.0f)
    }
    val params = IVFIndex.Params(k = 64, totalBits = 4) // splitPolicy = "auto" default
    def runCase(region: Seq[Array[Float]]): (Array[Array[Float]], Array[Array[Float]]) = {
      val data = region ++ far
      val sampled = spark.sparkContext.parallelize(data, 4)
      val flat = Array.tabulate(dim)(_ => 0.0f) +: farCentroids
      (flat, IVFIndex.splitFatClusters(spark, sampled, flat, params))
    }
    val (flatA, outA) = runCase(artifactRegion)
    val probeA = IVFIndex.lastSplitProbe.get
    assert(probeA.verdict == "artifact", s"planted sub-blob cell must split: $probeA")
    assert(outA.length > flatA.length, s"artifact verdict must ship the enriched set")
    assert(probeA.splitRecall >= probeA.flatRecall - 0.02, probeA.toString)

    val (flatM, outM) = runCase(massRegion)
    val probeM = IVFIndex.lastSplitProbe.get
    assert(probeM.verdict == "mass", s"wide-ball cell must NOT split: $probeM")
    assert(outM.length == flatM.length &&
      outM.zip(flatM).forall { case (a, b) => a sameElements b },
      "mass verdict must ship the flat centroids byte-identical")
    assert(probeM.splitRecall < probeM.flatRecall - 0.02, probeM.toString)

    // forced mode bypasses the probe (the r10 sweep contract)
    val dataM = massRegion ++ far
    val forced = IVFIndex.splitFatClusters(spark,
      spark.sparkContext.parallelize(dataM, 4),
      Array.tabulate(dim)(_ => 0.0f) +: farCentroids,
      params.copy(maxClusterFactor = 8.0))
    assert(IVFIndex.lastSplitProbe.get.verdict == "forced")
    assert(forced.length > 64, "forced mode must split regardless of the probe")

    // "off" policy never sizes cells: the flag the pre-r11 contract
    // rides on (maxClusterFactor=0 + off == the r9 byte-identical path)
    assert(!params.copy(splitPolicy = "off").splitEngaged)
    assert(params.copy(maxClusterFactor = 3.0).splitEngaged &&
      params.splitEngaged && !params.copy(splitPolicy = "off",
        maxClusterFactor = 3.0).splitEngaged)
  }

  test("index entries cover all vectors exactly once") {
    val m = operators.AnnQueries.model(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(m.index.count() == n)
    assert(m.index.select("id").distinct().count() == n)
  }

  test("hot cluster spans multiple cached partitions (bounded cluster blocks)") {
    // a catch-all cluster far larger than ClusterBlockRows must NOT scan
    // as a single task: the cached layout blocks it across partitions.
    // Ids are strided by 8 on purpose — a raw pmod(id, nblocks) block
    // key would collapse every strided id into one residue class (one
    // block, one task again); the hashed key must spread them. Recall
    // is checked through the split cluster: results are layout-
    // independent up to the probabilistic estimate bound (tie-breaks
    // are (dist, id); a rare estimateLower violation can make a skip
    // depend on partition co-residents), and exactly unaffected here.
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(11)
    val hotCenter = randVec(rnd, dim)
    val nHot = 3 * IVFIndex.ClusterBlockRows + 7 // >3 blocks
    val rows = (0 until nHot).map { i =>
      (8L * i, hotCenter.map(_ + 0.01f * rnd.nextGaussian().toFloat))
    } ++ (0 until 600).map { i =>
      (8L * (nHot + i) + 1, randVec(rnd, dim).map(_ * 5f))
    }
    val df = spark.createDataset(rows).toDF("vec_id", "embedding")
    val m = IVFIndex.build(spark, df, IVFIndex.Params(k = 4, totalBits = 4))
    val hot = m.index.groupBy("cluster_id").count()
      .orderBy(org.apache.spark.sql.functions.desc("count"))
      .as[(Int, Long)].head()
    assert(hot._2 > 2L * IVFIndex.ClusterBlockRows,
      s"test setup: expected a mega-cluster, largest holds ${hot._2}")
    val perPart = m.index.rdd
      .mapPartitions(it => Iterator.single(it.count(_.cluster_id == hot._1)))
      .collect()
    val holding = perPart.filter(_ > 0)
    assert(holding.length >= 2,
      s"hot cluster (${hot._2} rows) confined to ${holding.length} partition(s): " +
        perPart.mkString(","))
    assert(holding.max < hot._2,
      "no single partition may hold the whole hot cluster")
    // search through the split cluster still matches exact GT. The
    // corpus is near-degenerate (a σ=0.01 ball — distances sit below
    // B=4 quantization resolution), so use the exact-re-rank path;
    // the plain quantized path bottoms out ~0.88 on this shape
    // regardless of layout.
    val queries = (0 until 20).map { i =>
      (i.toLong, hotCenter.map(_ + 0.01f * rnd.nextGaussian().toFloat))
    }.toArray
    val approx = m.searchHighAcc(spark, df, queries, 10, 4, overFetch = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.ann.KnnExact.topK(spark, df, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall@10 through split hot cluster = $recall")
  }

  test("packed-run rollover + trim: split runs scan identically to one run") {
    // direct kernel test of the paths the integration suites never
    // trigger (maxRows = 2^15 >> any test corpus): a cluster's entries
    // split across several PackedRuns (the rollover the packers do on
    // isFull) must scan bit-identically to one contiguous run, before
    // and after trim()
    val dim = 8; val words = 1; val exBits = 4
    val rnd = new scala.util.Random(7)
    val entries = Array.tabulate(10) { i =>
      IVFIndex.Entry(i.toLong, 0, Array(rnd.nextLong() & 0xFFL), // bits < dim only
        // +1 pad byte: unpackAt reads a two-byte window for straddling
        // codes (the quantizer's real buffers carry the same slack)
        Array.fill(dim * exBits / 8 + 1)(rnd.nextInt().toByte),
        rnd.nextFloat(), rnd.nextFloat() * 0.1f, 0f,
        rnd.nextFloat() * 0.1f, 1f + rnd.nextFloat())
    }
    def runsOf(slices: Seq[Range]) = {
      val rs = scala.collection.mutable.ArrayBuffer.empty[IVFIndex.PackedRun]
      slices.foreach { sl =>
        val r = new IVFIndex.PackedRun(words, dim, exBits)
        sl.foreach(i => r.add(entries(i)))
        rs += r
      }
      scala.collection.mutable.HashMap(0 -> rs)
    }
    val cent = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val qs = Array.tabulate(3)(q =>
      (q.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat), Array(0)))
    for (queryBits <- Seq(0, 14)) {
      def scan(runs: scala.collection.mutable.HashMap[
          Int, scala.collection.mutable.ArrayBuffer[IVFIndex.PackedRun]]) =
        IVFIndex.scanRuns(qs, runs, Array(cent), 5, queryBits, exBits,
          null, 0L).toVector.sorted
      val whole = scan(runsOf(Seq(0 until 10)))
      val rolled = runsOf(Seq(0 until 4, 4 until 8, 8 until 10))
      assert(scan(rolled) == whole, s"rollover changed results (qb=$queryBits)")
      rolled(0).foreach(_.trim())
      assert(scan(rolled) == whole, s"trim changed results (qb=$queryBits)")
    }
    // the row bound is Int-safe for any dim and enforced loudly: at a
    // (hypothetical) dim where cap*dim would overflow, maxRows shrinks
    // and the packers must roll over — a direct add past it throws
    val tight = new IVFIndex.PackedRun(1, 600000000, 8) // packExF=false, no alloc
    assert(tight.maxRows == Int.MaxValue / 600000000)
    (0 until tight.maxRows).foreach(_ => tight.add(entries(0)))
    assert(tight.isFull)
    intercept[IllegalArgumentException](tight.add(entries(1)))
  }

  test("b7: packed path and entry path hash-match the committed golden row") {
    // the SPARK_GRAFT_PACKED A/B knob is a JVM-init val, so CI pins the
    // two scan paths by driving them directly: ad-hoc search never
    // packs (entry path); after an explicit packedIndex() the same
    // search rides the packed cache. Both must hash-equal the
    // committed b7 golden row — a layout change that diverges the
    // paths fails HERE, not in a judge run.
    val sfd = "/root/testdata/sf0.001"
    val m = graft.operators.AnnQueries.model(spark, sfd)
    m.freeSearchCaches()
    val qs = graft.operators.VectorQueries.queryVectors(spark, sfd)
    val np = 3 * m.params.k / 4 // b7's workload (AnnQueries.searchNprobe)
    def result() = m.search(spark, qs, 10, np).orderBy("query_id", "rk")
    val entry = Golden.hashOf(result(), Set.empty)
    m.packedIndex(spark)
    val packed = Golden.hashOf(result(), Set.empty)
    m.freeSearchCaches()
    assert(entry == packed, "packed and entry scan paths diverged")
    // the raw (query_id, neighbor_id, rk) list at sf0.001, pinned here
    // directly: b7 graduated to the DuckDB hash gate in r13 (its
    // certified surface lives in oracle_sql), so the raw engine
    // ordering is no longer in the golden snapshot — this literal is
    // its regression pin (regenerate via Golden.hashOf on the raw
    // search if the kernel changes intentionally)
    assert(entry == (80L,
      "c8111588e50b9c032e933e917d24eb75f03c2cf94803c236b74864fdde38e2e9"),
      "search result drifted from the pinned b7 raw-search row")
  }

  test("packed sidecar: cold load adopts it, overlays invalidate it, scans identical") {
    import spark.implicits._
    val sfd = "/root/testdata/sf0.001"
    val m = graft.operators.AnnQueries.model(spark, sfd)
    val qs = graft.operators.VectorQueries.queryVectors(spark, sfd, 4)
    val dir = java.nio.file.Files.createTempDirectory("packed_sidecar").toString
    m.save(dir) // save writes entries + the packed sidecar
    m.freeSearchCaches()
    assert(new java.io.File(s"$dir/packed/_SUCCESS").exists,
      "save(path) must persist the packed sidecar")

    // cold load adopts the sidecar; its scan must equal the re-pack scan
    val cold = graft.ann.IVFModel.load(spark, dir)
    assert(cold.packedAtRestDir.isDefined, "coherent sidecar not adopted")
    cold.packedIndex(spark) // built FROM the sidecar
    val viaSidecar = cold.search(spark, qs, 10, 12)
      .orderBy("query_id", "rk").collect().toSeq
    cold.freeSearchCaches()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$dir/packed"))
    val repack = graft.ann.IVFModel.load(spark, dir)
    assert(repack.packedAtRestDir.isEmpty)
    repack.packedIndex(spark) // entry re-pack path
    val viaRepack = repack.search(spark, qs, 10, 12)
      .orderBy("query_id", "rk").collect().toSeq
    repack.freeSearchCaches()
    assert(viaSidecar == viaRepack,
      "sidecar scan diverged from the entry re-pack scan")

    // an UNREADABLE sidecar (wrong schema — an old format, a torn
    // write the coherence checks missed) must fall back to the entry
    // re-pack, never brick the search
    locally {
      import spark.implicits._
      Seq((1, "garbage")).toDF("part_id", "junk")
        .write.mode("overwrite").parquet(s"$dir/packed")
      val broken = graft.ann.IVFModel.load(spark, dir)
      assert(broken.packedAtRestDir.isDefined, "coherence checks still pass")
      broken.packedIndex(spark) // must not throw
      val viaFallback = broken.search(spark, qs, 10, 12)
        .orderBy("query_id", "rk").collect().toSeq
      assert(viaFallback == viaRepack, "fallback scan diverged")
      broken.freeSearchCaches()
    }

    // a tombstone overlay makes load IGNORE the (now stale) sidecar...
    m.save(dir)
    m.freeSearchCaches()
    graft.ann.IVFModel.deleteIds(dir, Seq(0L).toDF("id"))
    assert(graft.ann.IVFModel.load(spark, dir).packedAtRestDir.isEmpty,
      "a tombstoned index must not adopt the stale sidecar")
    // ...and compact folds the tombstone and REBUILDS a coherent sidecar
    graft.ann.IVFModel.compact(spark, dir)
    val after = graft.ann.IVFModel.load(spark, dir)
    assert(after.packedAtRestDir.isDefined, "compact must rebuild the sidecar")
    after.packedIndex(spark)
    val res = after.search(spark, qs, 10, 12).collect()
    assert(res.forall(_.getLong(1) != 0L),
      "compacted sidecar resurrected a deleted id")
    after.freeSearchCaches()
  }
}
