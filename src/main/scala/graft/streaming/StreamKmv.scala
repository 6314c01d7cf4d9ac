package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** d11: c37's KMV cardinality sketch as a streaming aggregation —
  * live per-source vocabulary tracking at ingest (the "how big is
  * this crawl's vocabulary getting" dashboard number, maintained
  * without ever holding a distinct set).
  *
  * Why KMV is the RIGHT sketch for streams: reduce is
  * order-independent and the state is the bounded min-k array, so
  * the sketch after any prefix of the stream is EXACTLY the batch
  * sketch of the rows seen — no watermark subtleties, no
  * arrival-order caveats at all (stronger than d7/d8/d10, whose
  * stream semantics need an ordered-arrival argument). Each trigger
  * emits the source's current (held, kth, estimate); the state is
  * O(k) longs per source, forever — no eviction needed.
  *
  * Shape: a STREAMING AGGREGATION (`groupByKey.agg` with the same
  * typed [[Sketches.KmvAgg]] as batch c37, update mode), NOT
  * `flatMapGroupsWithState`: the aggregation path gets MAP-SIDE
  * partial combine inside every micro-batch — each task reduces its
  * partition slice to one sketch per source and only sketches reach
  * the state store — where an FMGWS formulation would funnel every
  * (source, hash) row of a batch into the source's single state
  * task. Measured at the probe's adversarial one-source shape, the
  * aggregation form is what keeps a hot source from serializing the
  * stream.
  *
  * Under the single-file AvailableNow drain there is one emission
  * per source and it equals batch c37 row-for-row, so d11 shares
  * c37's DuckDB oracle: the hash check certifies batch/stream
  * equivalence of the sketch. Multi-trigger runs emit a row per
  * (source, trigger); StreamingSpec pins that the LAST emission
  * still equals the batch sketch — the order-independence property
  * in executable form. */
object StreamKmv {
  /** d11 entry: stream the documents table of `dir`. */
  def streamingKmv(spark: SparkSession, dir: String): DataFrame =
    streamingKmvFromDir(spark, EventOps.symlinkedDir(dir, "documents.parquet"))

  def streamingKmvFromDir(
      spark: SparkSession,
      srcDir: String,
      k: Int = Sketches.KmvK,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val raw = EventOps.streamReader(spark, StreamDedup.docsSchema, srcDir, maxFilesPerTrigger)

    // SAME kernel + aggregation as batch c37 (shared code — the
    // oracle-equivalence claim depends on it)
    val sketched = Sketches.sketchBySource(
      Sketches.tokenHashPairs(raw
        .filter(col("text").isNotNull)
        .select(col("source"), col("text")).as[(String, String)]), k)

    // update mode: each trigger emits the sources whose sketch changed
    EventOps.drainToTable(sketched, "update").orderBy("source")
  }
}
