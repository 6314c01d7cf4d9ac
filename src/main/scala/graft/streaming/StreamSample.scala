package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.CorpusOps

/** d16: c40's weighted sample as a STREAMING AGGREGATION — a live
  * per-source reservoir at ingest: at any moment the k docs held are
  * a correct Efraimidis–Spirakis weighted-without-replacement sample
  * of everything seen so far. This is the genuinely streaming form of
  * E-S (its original setting — the one-pass reservoir over a stream):
  * because the per-doc key is a DETERMINISTIC pure function of doc_id
  * (no rand()), top-k-by-key is a fold closed under merge and
  * order-independent, so the stream's sample after any prefix EQUALS
  * the batch sample of the rows seen — the same exact batch≡stream
  * property as d11/d14/d15, here for a sampling operator.
  *
  * Shape: a streaming aggregation (`groupByKey.agg` with the same
  * typed [[CorpusOps.TopKByKeyAgg]] as batch c40, update mode) — the
  * aggregation path gets map-side partial combine per micro-batch, so
  * each task hands the state store ≤ k rows per source, never the
  * batch (the d11 lesson). State is the bounded k-row heap per
  * source, forever; no eviction, no watermark, no registry — the
  * operator is self-contained.
  *
  * Under the single-file AvailableNow drain there is one emission per
  * source equal to batch c40 row-for-row, so d16 shares c40's DuckDB
  * oracle — the hash check certifies batch/stream equivalence of the
  * sampler. Multi-trigger growth is StreamingSpec-pinned. */
object StreamSample {
  /** d16 entry: stream the documents table of `dir`. */
  def streamingSample(spark: SparkSession, dir: String): DataFrame =
    streamingSampleFromDir(spark,
      EventOps.symlinkedDir(dir, "documents.parquet"))

  def streamingSampleFromDir(
      spark: SparkSession,
      srcDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val raw = EventOps.streamReader(spark, StreamDedup.docsSchema, srcDir, maxFilesPerTrigger)

    // SAME kernel + aggregation as batch c40 (shared code — the
    // oracle-equivalence claim depends on it)
    val sampled = CorpusOps.sampleBySource(CorpusOps.weightedKeyed(raw))

    // update mode: each trigger re-emits the sources whose sample changed
    EventOps.drainToTable(sampled, "update").orderBy("source", "smp_rank")
  }
}
