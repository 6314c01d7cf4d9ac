package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{IVFIndex, IVFModel}
import graft.functions.GraftFunctions
import graft.sources.VecsIO

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  /** Write one parquet file of (vec_id, embedding) rows into `dir` —
    * fixture for the streaming-ingest tests. */
  private def writeVecsFile(
      dir: java.nio.file.Path, name: String, ids: Seq[Long], seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val tmp = java.nio.file.Files.createTempDirectory("vecs_part")
    ids.map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    java.nio.file.Files.copy(part, dir.resolve(name))
  }

  test("fvecs roundtrip: write with VecsIO, read with format(fvecs)") {
    val dir = java.nio.file.Files.createTempDirectory("fvecs_test")
    val f = dir.resolve("sample.fvecs").toString
    val vecs = Seq(Array(1.0f, 2.5f, -3.0f), Array(0.0f, 4.25f, 9.5f))
    VecsIO.writeFvecs(f, vecs.iterator)
    val got = spark.read.format("fvecs").load(f)
      .orderBy("row_id").as[(String, Long, Array[Float])].collect()
    assert(got.length == 2)
    assert(got(0)._3.toSeq == vecs(0).toSeq)
    assert(got(1)._3.toSeq == vecs(1).toSeq)
  }

  test("ivecs directory load: (file,row_id) identity, hidden files skipped") {
    val dir = java.nio.file.Files.createTempDirectory("ivecs_test")
    VecsIO.writeIvecs(dir.resolve("a.ivecs").toString, Iterator(Array(1, 2, 3)))
    VecsIO.writeIvecs(dir.resolve("b.ivecs").toString, Iterator(Array(7, 8, 9, 10)))
    // job markers must be ignored, not parsed as vectors
    java.nio.file.Files.writeString(dir.resolve("_SUCCESS"), "")
    java.nio.file.Files.writeString(dir.resolve(".hidden"), "junk")
    val got = spark.read.format("ivecs").load(dir.toString)
      .as[(String, Long, Array[Int])].collect()
    assert(got.map(_._3.toSeq).toSet == Set(Seq(1, 2, 3), Seq(7, 8, 9, 10)))
    // row_id restarts per file; identity is (file, row_id)
    assert(got.map(r => (r._1, r._2)).distinct.length == 2)
    assert(got.forall(_._2 == 0L))
  }

  test("parquet embeddings export to fvecs and read back identically") {
    val dir = java.nio.file.Files.createTempDirectory("fvecs_export")
    val f = dir.resolve("emb.fvecs").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    VecsIO.exportFvecs(emb, f)
    val back = spark.read.format("fvecs").load(f)
      .orderBy("row_id").as[(String, Long, Array[Float])].collect()
    val orig = emb.orderBy("vec_id").as[(Long, Array[Float], Int)]
      .collect()
    assert(back.length == orig.length)
    assert(back.head._3.toSeq == orig.head._2.toSeq)
    assert(back.last._3.toSeq == orig.last._2.toSeq)
  }

  test("fvecs multi-path load (paths are JSON-encoded by the reader)") {
    val dir = java.nio.file.Files.createTempDirectory("fvecs_multi")
    val f1 = dir.resolve("a.fvecs").toString
    val f2 = dir.resolve("b.fvecs").toString
    VecsIO.writeFvecs(f1, Iterator(Array(1.0f, 2.0f)))
    VecsIO.writeFvecs(f2, Iterator(Array(3.0f, 4.0f)))
    val got = spark.read.format("fvecs").load(f1, f2)
      .as[(String, Long, Array[Float])].collect().map(_._3.toSeq).toSet
    assert(got == Set(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))
  }

  test("fbin roundtrip is bit-exact, including NaN payloads") {
    val dir = java.nio.file.Files.createTempDirectory("fbin_test")
    val f = dir.resolve("sample.fbin").toString
    val weird = java.lang.Float.intBitsToFloat(0x7fc00123) // non-canonical NaN
    val vecs = Seq(Array(1.0f, -2.5f, weird), Array(Float.MinPositiveValue, 0.0f, 3e38f))
    VecsIO.writeFbin(f, vecs)
    val got = spark.read.format("fbin").load(f)
      .orderBy("row_id").as[(String, Long, Array[Float])].collect()
    assert(got.length == 2)
    got.zip(vecs).foreach { case ((_, _, g), v) =>
      assert(g.map(java.lang.Float.floatToRawIntBits).toSeq ==
        v.map(java.lang.Float.floatToRawIntBits).toSeq)
    }
  }

  test("ibin roundtrip and row-range splitting reads every row exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("ibin_test")
    val f = dir.resolve("big.ibin").toString
    val vecs = (0 until 1000).map(i => Array(i, i * 2, i * 3, Int.MinValue + i))
    VecsIO.writeIbin(f, vecs)
    // 16-byte rows with 64-byte splits -> 4 rows per partition, 250 splits
    val df = spark.read.format("ibin").option("splitBytes", 64).load(f)
    assert(df.rdd.getNumPartitions == 250, s"got ${df.rdd.getNumPartitions} partitions")
    val got = df.orderBy("row_id").as[(String, Long, Array[Int])].collect()
    assert(got.length == 1000)
    assert(got.map(_._2).toSeq == (0L until 1000L)) // global row ids, no dup/drop
    got.zipWithIndex.foreach { case ((_, _, v), i) => assert(v.toSeq == vecs(i).toSeq) }
  }

  test("parquet embeddings export to fbin and read back identically") {
    val dir = java.nio.file.Files.createTempDirectory("fbin_export")
    val f = dir.resolve("emb.fbin").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    VecsIO.exportFbin(emb, f)
    val back = spark.read.format("fbin").load(f)
      .orderBy("row_id").as[(String, Long, Array[Float])].collect()
    val orig = emb.orderBy("vec_id").as[(Long, Array[Float], Int)].collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case ((_, rid, v), (id, o, _)) =>
      assert(rid == id && v.toSeq == o.toSeq)
    }
  }

  test("SQL registration: vec_l2sq and vec_dot usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_l2sq(array(1.0F, 2.0F), array(1.0F, 0.0F)) AS d, " +
        "vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS p, " +
        "vec_sum(array(1.0F, 2.0F, 4.0F)) AS s").head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 7.0)
    val c = spark.sql(
      "SELECT vec_l2(array(3.0F, 0.0F), array(0.0F, 4.0F)) AS l2, " +
        "vec_norm(array(3.0F, 4.0F)) AS n, " +
        "vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos").head()
    assert(c.getDouble(0) == 5.0 && c.getDouble(1) == 5.0 && c.getDouble(2) == 1.0)
    // zero-norm cosine is null, not an ANSI DIVIDE_BY_ZERO error
    assert(spark.sql(
      "SELECT vec_cosine(array(0.0F, 0.0F), array(1.0F, 0.0F))").head().isNullAt(0))
    // wrong arity fails on the ANALYSIS channel (Spark's own
    // WRONG_NUM_ARGS user error), not an uncategorized internal
    // IllegalArgumentException with a stack trace
    val arityErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_norm(array(1.0F), array(2.0F))").head()
    }
    assert(arityErr.getMessage.contains("WRONG_NUM_ARGS")
        && arityErr.getMessage.contains("vec_norm"),
      s"unexpected arity error: ${arityErr.getMessage}")
    // null element -> null; double arrays read natively
    assert(spark.sql("SELECT vec_sum(array(1.0F, NULL))").head().isNullAt(0))
    assert(spark.sql("SELECT vec_sum(array(1.0D, 2.5D))").head().getDouble(0) == 3.5)
  }

  test("vector expressions: mixed widths, nulls, mismatched lengths, bad types") {
    GraftFunctions.register(spark)
    // mixed float/double element widths read each side correctly
    val mixed = spark.sql(
      "SELECT vec_l2sq(CAST(array(1.0F, 2.0F) AS ARRAY<DOUBLE>), array(1.0F, 0.0F)) AS d").head()
    assert(mixed.getDouble(0) == 4.0)
    // null element → null result (DuckDB list-function policy)
    assert(spark.sql("SELECT vec_dot(array(1.0F, NULL), array(1.0F, 2.0F)) AS d").head().isNullAt(0))
    // length mismatch raises rather than silently truncating
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0F), array(1.0F, 2.0F))").head()
    }
    assert(ex.getMessage != null)
    // non-array arguments fail analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_l2sq('a', 'b')").head()
    }
  }

  test("vec_normalize: unit norm, zero vectors unchanged, SQL-registered") {
    import graft.functions.VectorFunctions.{vec_norm, vec_normalize}
    val rnd = new scala.util.Random(3)
    val df = ((1L to 20L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      :+ (99L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    val norms = df.select($"vec_id", vec_norm(vec_normalize($"embedding")).as("n"))
      .as[(Long, Double)].collect().toMap
    assert(norms.filterKeys(_ != 99L).values.forall(n => math.abs(n - 1.0) < 1e-5),
      s"normalized vectors must be unit length: $norms")
    assert(norms(99L) == 0.0, "zero vector must pass through unchanged, not NaN")
    val zero = df.filter($"vec_id" === 99L)
      .select(vec_normalize($"embedding")).as[Array[Float]].head()
    assert(zero.forall(_ == 0f))
    // SQL surface
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vn_docs")
    val viaSql = spark.sql(
      "SELECT vec_norm(vec_normalize(embedding)) FROM vn_docs WHERE vec_id = 1")
      .as[Double].head()
    assert(math.abs(viaSql - 1.0) < 1e-5)
    // array<double> input keeps its element type (SQL array literals
    // are double) — and the values are exact on a 3-4-5 triangle
    val dbl = spark.sql("SELECT vec_normalize(array(0.6d, 0.8d)) AS u").head()
      .getSeq[Double](0)
    assert(dbl == Seq(0.6, 0.8))
    // interpreted path (no codegen) must agree with the codegen path
    val expr = graft.functions.VecNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    assert(interp.toSeq == Seq(0.6f, 0.8f))
  }

  test("streaming ingest builds an index that searches identically to batch") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_spec").toString
    m.saveMeta(idxDir)
    val src = graft.streaming.EventOps.symlinkedDir(sf, "embeddings.parquet")
    IVFIndex.appendStream(spark, m, src, idxDir)
    val streamed = IVFModel.load(spark, idxDir)
    assert(streamed.index.count() == m.index.count())
    val qs = operators.VectorQueries.queryVectors(spark, sf, 4)
    val a = m.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    val b = streamed.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    assert(a == b, "stream-built index must search identically to the batch build")
  }

  test("b13 operator: overlapped saveMeta + ingest still yields the model's counts") {
    // streamIndexIngest submits saveMeta concurrently with the ingest
    // stream (§2.6 job overlap); the output must stay exactly the
    // per-cluster counts of the session model's assignment
    val sf = "/root/testdata/sf0.001"
    val out = operators.AnnQueries.streamIndexIngest(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val expected = operators.AnnQueries.model(spark, sf).index.toDF()
      .groupBy("cluster_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out == expected,
      "overlapped b13 must reproduce the batch assignment counts")
  }

  test("streaming ingest: append to a batch-saved index; second call only new files") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val nBatch = m.index.count()
    val idxDir = java.nio.file.Files.createTempDirectory("b13_incr").toString
    m.save(idxDir) // FULL batch save — entries must survive the appends
    val srcDir = java.nio.file.Files.createTempDirectory("b13_incr_src")
    writeVecsFile(srcDir, "f1.parquet", (100000L until 100010L), seed = 1)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(IVFModel.load(spark, idxDir).index.count() == nBatch + 10,
      "batch-written entries must survive a streaming append")
    writeVecsFile(srcDir, "f2.parquet", (100010L until 100015L), seed = 2)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    val after = IVFModel.load(spark, idxDir)
    assert(after.index.count() == nBatch + 15,
      "second call must ingest ONLY the new file (no drops, no re-ingest)")
    assert(after.index.select("id").distinct().count() == nBatch + 15)
  }

  test("streaming ingest is exactly-once across crash re-delivery (b13)") {
    import java.nio.file.{Files, Paths}
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_redeliver").toString
    m.saveMeta(idxDir)
    val srcDir = java.nio.file.Files.createTempDirectory("b13_redeliver_src")
    writeVecsFile(srcDir, "f1.parquet", (200000L until 200020L), seed = 3)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    def clusterCounts(): Map[Int, Long] =
      IVFModel.load(spark, idxDir).index.toDF()
        .groupBy("cluster_id").count()
        .as[(Int, Long)].collect().toMap
    val counts = clusterCounts()
    assert(counts.values.sum == 20)

    // Spark re-delivers a batch when the checkpoint commit is missing —
    // the crash window AFTER the sink wrote everything. Erase the
    // commit record and restart: the batch marker must short-circuit
    // the second delivery, leaving per-cluster counts unchanged.
    // (the .crc shadow must go too — a stale checksum makes the local
    // Hadoop FS treat the re-created commit file as already existing)
    val commits = Paths.get(idxDir, "_ingest_checkpoint", "commits")
    def eraseCommit(): Unit = {
      Files.delete(commits.resolve("0"))
      Files.deleteIfExists(commits.resolve(".0.crc"))
    }
    eraseCommit()
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(clusterCounts() == counts,
      "a re-delivered (already-committed) batch must not double-count")

    // The other crash window: the sink died MID-batch — data files
    // present but no marker. Readers must not see the partial dir, and
    // the re-delivered batch must overwrite it in place (not append).
    Files.delete(Paths.get(idxDir, "_ingest_log", "batch-0"))
    assert(clusterCounts().isEmpty,
      "an unmarked (crashed partial) batch dir must be invisible to load")
    // plant a stray extra data file: append-instead-of-overwrite or
    // reading unmarked dirs would surface it as a double count
    val batchDir = Paths.get(idxDir, "entries_batches", "batch-0")
    val part = Files.walk(batchDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    Files.copy(part, part.getParent.resolve("part-stray-copy.parquet"))
    eraseCommit()
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(clusterCounts() == counts,
      "a re-delivered partial batch must be overwritten, not appended")

    // The COMPOUND window: sink committed, checkpoint commit lost, AND
    // a compact folded the batch before the restart. The marker must
    // survive compaction — it is the only re-delivery guard once the
    // batch dir is folded into entries.
    eraseCommit()
    IVFModel.compact(spark, idxDir)
    assert(!Files.exists(Paths.get(idxDir, "entries_batches")),
      "compact must fold batch data dirs into entries")
    assert(Files.exists(Paths.get(idxDir, "_ingest_log", "batch-0")),
      "markers must survive compaction (they guard re-delivery of folded batches)")
    assert(clusterCounts() == counts, "compact must preserve folded batches")
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir) // re-delivers batch 0
    assert(clusterCounts() == counts,
      "a batch re-delivered AFTER compaction folded it must not double-count")
    // and the compacted index still accepts further streaming appends
    writeVecsFile(srcDir, "f2.parquet", (200020L until 200025L), seed = 4)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(clusterCounts().values.sum == 25)
  }

  test("a reset ingest checkpoint cannot silently swallow re-numbered batches") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_reset").toString
    m.saveMeta(idxDir)
    val srcDir = java.nio.file.Files.createTempDirectory("b13_reset_src")
    writeVecsFile(srcDir, "f1.parquet", (400000L until 400010L), seed = 8)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(IVFModel.load(spark, idxDir).index.count() == 10)
    // the operator resets the stream: checkpoint deleted, ids restart
    // at 0 — the NEW batch 0 is {f1, f2}, which the RETAINED marker
    // batch-0 (from the old sequence) must not swallow
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$idxDir/_ingest_checkpoint"), true)
    writeVecsFile(srcDir, "f2.parquet", (400010L until 400015L), seed = 9)
    // default refuses: the reset would destroy committed batch data
    // whose source files this code cannot prove are still present
    val ex = intercept[IllegalStateException] {
      IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    }
    assert(ex.getMessage.contains("reingest"), s"unhelpful message: ${ex.getMessage}")
    assert(IVFModel.load(spark, idxDir).index.count() == 10,
      "a refused reset must leave the index untouched")
    // explicit opt-in asserts the source dir is complete → full re-ingest
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir,
      onCheckpointReset = "reingest")
    val loaded = IVFModel.load(spark, idxDir)
    assert(loaded.index.count() == 15,
      "a stale marker swallowed the re-numbered batch (f2's vectors lost)")
    assert(loaded.index.toDF().select("id").distinct().count() == 15)
  }

  test("reingest after a binding mismatch re-ingests EVERY source file") {
    // the (stored=Some, current=Some, stored != current) arm: the
    // checkpoint is ALIVE but belongs to a different query than the
    // marker log records. reingest must clear the foreign checkpoint
    // too — otherwise the fresh run resumes from its source-file
    // offsets and silently skips files it recorded, contradicting the
    // error message's losslessness promise
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_mismatch").toString
    m.saveMeta(idxDir)
    val srcDir = java.nio.file.Files.createTempDirectory("b13_mismatch_src")
    writeVecsFile(srcDir, "f1.parquet", (420000L until 420010L), seed = 14)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(IVFModel.load(spark, idxDir).index.count() == 10)
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // break the binding, NOT the checkpoint: the live checkpoint (which
    // has f1 in its source log) now mismatches the stored id
    val idFile = new org.apache.hadoop.fs.Path(s"$idxDir/_ingest_log/_checkpoint_id")
    val out = fs.create(idFile, true)
    try out.write("00000000-0000-0000-0000-000000000000".getBytes("UTF-8"))
    finally out.close()
    writeVecsFile(srcDir, "f2.parquet", (420010L until 420015L), seed = 15)
    // default still refuses while unfolded batch data exists
    intercept[IllegalStateException] {
      IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    }
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir,
      onCheckpointReset = "reingest")
    val loaded = IVFModel.load(spark, idxDir)
    assert(loaded.index.count() == 15,
      "the surviving foreign checkpoint skipped f1 — reingest lost data")
    assert(loaded.index.toDF().select("id").distinct().count() == 15)
  }

  test("markers with no checkpoint binding and no checkpoint are treated as reset") {
    // the legacy blind spot: a run crashed before the id binding
    // existed (old code wrote it only after awaitTermination), then the
    // checkpoint was lost — (stored=None, current=None) with markers
    // present must NOT pass as a clean slate, or the stale batch-0
    // marker swallows the fresh checkpoint's re-numbered batch 0
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_legacy_reset").toString
    m.saveMeta(idxDir)
    val srcDir = java.nio.file.Files.createTempDirectory("b13_legacy_src")
    writeVecsFile(srcDir, "f1.parquet", (410000L until 410010L), seed = 12)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate the legacy crashed-run shape: binding absent, checkpoint lost
    fs.delete(new org.apache.hadoop.fs.Path(s"$idxDir/_ingest_log/_checkpoint_id"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idxDir/_ingest_checkpoint"), true)
    writeVecsFile(srcDir, "f2.parquet", (410010L until 410015L), seed = 13)
    intercept[IllegalStateException] {
      IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    }
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir,
      onCheckpointReset = "reingest")
    assert(IVFModel.load(spark, idxDir).index.count() == 15,
      "the legacy marker shape swallowed the re-numbered batch")
  }

  test("save() is a full replace: stale ingest state cannot leak into the new index") {
    import java.nio.file.{Files, Paths}
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val idxDir = java.nio.file.Files.createTempDirectory("b13_replace").toString
    m.saveMeta(idxDir)
    val srcDir = java.nio.file.Files.createTempDirectory("b13_replace_src")
    writeVecsFile(srcDir, "f1.parquet", (300000L until 300010L), seed = 7)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    IVFModel.deleteIds(idxDir, Seq(0L, 2L).toDF("id"))
    assert(IVFModel.load(spark, idxDir).index.count() == 10)
    // rebuild-in-place: the saved model must be EXACTLY what loads back
    // — no resurrected batch rows (quantized with old centroids), no
    // stale tombstones deleting ids the rebuild legitimately contains
    m.save(idxDir)
    val loaded = IVFModel.load(spark, idxDir)
    assert(loaded.index.count() == m.index.count(),
      "stale batch dirs or tombstones leaked into the rebuilt index")
    for (d <- Seq("entries_batches", "_ingest_log", "deletes", "_ingest_checkpoint"))
      assert(!Files.exists(Paths.get(idxDir, d)), s"save must clear $d")
  }

  test("index lifecycle: tombstone delete filters loads; compact folds them in") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val n = m.index.count()
    val idxDir = java.nio.file.Files.createTempDirectory("b15_spec").toString
    m.save(idxDir)
    val odd = m.index.toDF().select($"id").filter($"id" % 2 =!= 0)
    val nOdd = odd.count()
    IVFModel.deleteIds(idxDir, odd)
    // tombstones apply at load without any rewrite
    val filtered = IVFModel.load(spark, idxDir)
    assert(filtered.index.count() == n - nOdd)
    assert(filtered.index.filter($"id" % 2 =!= 0).count() == 0)
    // search never returns a deleted id (materialize before compaction:
    // the tombstone-filtered plan references the deletes files)
    val qs = operators.VectorQueries.queryVectors(spark, sf, 4)
    val a = filtered.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    assert(a.forall(_.getLong(1) % 2 == 0), "a deleted id surfaced in search results")
    // compact removes the tombstone dir and preserves content exactly
    IVFModel.compact(spark, idxDir)
    assert(!new java.io.File(s"$idxDir/deletes").exists)
    val compacted = IVFModel.load(spark, idxDir)
    assert(compacted.index.count() == n - nOdd)
    val b = compacted.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    assert(a == b, "compaction must not change search results")
    // the all-deleted edge: compacting an empty index must not brick it
    IVFModel.deleteIds(idxDir, compacted.index.toDF().select($"id"))
    IVFModel.compact(spark, idxDir)
    assert(IVFModel.load(spark, idxDir).index.count() == 0,
      "an index compacted to empty must still load")
    // and the layout must still accept streaming appends afterwards
    val srcDir = java.nio.file.Files.createTempDirectory("b15_refill")
    writeVecsFile(srcDir, "f1.parquet", (900000L until 900008L), seed = 5)
    IVFIndex.appendStream(spark, m, srcDir.toString, idxDir)
    assert(IVFModel.load(spark, idxDir).index.count() == 8,
      "an emptied-then-compacted index must accept streaming appends")
  }

  test("IVF index save/load roundtrip preserves search results") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.AnnQueries.model(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    m.save(dir)
    val loaded = IVFModel.load(spark, dir)
    assert(loaded.params == m.params)
    assert(loaded.index.count() == m.index.count())
    val qs = Tables.embeddings(spark, sf)
      .filter($"vec_id" < 4).select($"vec_id".cast("long"), $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val a = m.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    val b = loaded.search(spark, qs, 10, 12).orderBy("query_id", "rk").collect().toSeq
    assert(a == b)
  }
}
