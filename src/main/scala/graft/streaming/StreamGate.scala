package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.CorpusOps

/** d7: the corpus quality gate (c16) as a streaming query — corpus
  * curation at ingest time instead of as a batch sweep.
  *
  * Shape: the stateless rules (too_short / punctuation / token_len)
  * are the SAME column expressions as the batch gate
  * ([[CorpusOps.gateMetrics]] / [[CorpusOps.gateDecision]] — shared
  * code, so the paths cannot drift); the duplicate rule is the one
  * stateful piece, re-expressed as first-seen-wins: a
  * `flatMapGroupsWithState` keyed by content hash keeps the first
  * doc_id seen for each distinct text, and later arrivals are marked
  * duplicates of it. With doc_id-ordered arrival (one input file =
  * one AvailableNow batch; multi-file ingest processes oldest first),
  * first-seen equals the batch gate's min-doc_id canonical — so d7's
  * oracle is LITERALLY c16's SQL, and the DuckDB hash check certifies
  * batch/stream equivalence end-to-end.
  *
  * At 100 TB/day the same plan runs against a landing directory:
  * narrow map + one keyed shuffle per batch; state is one (hash →
  * doc_id) entry per distinct document. Unlike d6's candidate buckets
  * there is no retention window to age by — the canonical id for a
  * content hash never expires while the gate runs; bound state by
  * periodically compacting into the batch gate if the corpus outlives
  * the job. Text must be non-null (the typed state encoder carries
  * the quality ratios as primitive doubles). */
object StreamGate {
  /** d7 entry: stream the documents table of `dir`. */
  def streamingCorpusGate(spark: SparkSession, dir: String): DataFrame =
    streamingCorpusGateFromDir(spark, EventOps.symlinkedDir(dir, "documents.parquet"))

  /** Lower-level entry over any directory of documents-schema parquet
    * files (specs use `maxFilesPerTrigger = 1` to prove the
    * cross-batch duplicate rule). */
  def streamingCorpusGateFromDir(
      spark: SparkSession,
      srcDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(StreamDedup.docsSchema)
    val stream = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(srcDir)

    val withKeep = CorpusOps.gateMetrics(stream)
      .as[(Long, Int, Double, Double, String)]
      .groupByKey(_._5)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, Int, Double, Double, String)],
            state: GroupState[Long]) => {
          // min within the batch keeps a single-batch drain exactly
          // equal to the batch gate even if shuffle order varies
          val batch = rows.toArray.sortBy(_._1)
          // out-of-order hardening: if a LATER batch carries a smaller
          // id than the stored canonical, adopt it — this batch and
          // every future one then decide with the batch gate's true
          // min-id canonical. (Rows already emitted in earlier batches
          // cannot be retracted in Append mode — under doc_id-ordered
          // arrival, d7's stated precondition for exact c16
          // equivalence, the case never arises.)
          val keepId = state.getOption.fold(batch.head._1)(math.min(_, batch.head._1))
          state.update(keepId)
          batch.iterator.map { case (id, nTok, pr, mtl, _) =>
            (id, nTok, pr, mtl, keepId)
          }
        })
      .toDF("doc_id", "n_tokens", "punct_ratio", "mean_token_len", "keep_id")

    CorpusOps.gateDecision(EventOps.drainToTable(withKeep, "append"))
      .orderBy("doc_id")
  }
}
