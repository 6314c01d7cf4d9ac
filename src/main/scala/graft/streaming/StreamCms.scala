package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Sketches

/** d15: c41's Count-Min sketch as a STREAMING AGGREGATION — live
  * per-source heavy-hitter counts at ingest (the third live sketch
  * panel next to d11's cardinality and d14's membership: "how much of
  * token X is this source accumulating").
  *
  * CMS shares the property that makes d11/d14 exactly certifiable:
  * the combine (elementwise add) is order-independent and the state
  * is the bounded matrix, so the sketch after any stream prefix
  * EQUALS the batch sketch of the rows seen — no watermark, no
  * arrival-order caveats. State is one 32 KB matrix per source,
  * forever; no eviction needed.
  *
  * Shape: a streaming aggregation (`groupByKey.agg` with the same
  * typed [[Sketches.CmsAgg]] as batch c41, update mode), NOT
  * `flatMapGroupsWithState` — the aggregation path gets map-side
  * partial combine inside every micro-batch, so only matrices reach
  * the state store (the d11 lesson: a hot source must not serialize
  * the stream through one state task).
  *
  * The candidate registry — which tokens to report, and their exact
  * counts — is FROZEN from the batch table before the stream starts
  * (the d9/d14 benchmark-registry pattern): a live dashboard asks a
  * fixed set of questions while estimates converge on the frozen
  * exact counts. Under the single-file AvailableNow drain there is
  * one emission per (source, rank) equal to batch c41 row-for-row,
  * so d15 shares c41's DuckDB oracle — the hash check certifies
  * batch/stream equivalence of the frequency sketch. Multi-trigger
  * last-emission-equals-batch is StreamingSpec-pinned. */
object StreamCms {
  /** d15 entry: stream the documents table of `dir`. */
  def streamingCms(spark: SparkSession, dir: String): DataFrame =
    streamingCmsFromDir(spark, graft.Tables.documents(spark, dir),
      EventOps.symlinkedDir(dir, "documents.parquet"))

  def streamingCmsFromDir(
      spark: SparkSession,
      batchDocs: DataFrame,
      srcDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // frozen BEFORE the stream: candidates + exact counts are the
    // registry the live estimates converge on
    val (cands, trueCounts) = Sketches.collectHeavyRegistry(batchDocs)
    val raw = EventOps.streamReader(spark, StreamDedup.docsSchema, srcDir, maxFilesPerTrigger)

    // SAME kernel + aggregation as batch c41 (shared code — the
    // oracle-equivalence claim depends on it)
    val sketched = Sketches.cmsBySource(
      Sketches.cmsFlatPositions(raw), cands, trueCounts)

    // update mode: each trigger emits the sources whose matrix changed
    EventOps.drainToTable(sketched, "update").orderBy("source", "hh_rank")
  }
}
