package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * batch/stream equivalence end-to-end. Ordered arrival is the stated
  * precondition for exact equivalence; with out-of-order ingest a
  * later smaller id supersedes the stored canonical on arrival (its
  * batch and all future batches then decide with the true min-id
  * canonical), but rows already emitted in earlier batches cannot be
  * retracted in Append mode.
  *
  * At 100 TB/day the same plan runs against a landing directory:
  * narrow map + one keyed shuffle per batch. Without compaction the
  * state is one (hash → doc_id) entry per distinct document — unlike
  * d6's candidate buckets there is no retention window to age by.
  * [[compactGateState]] bounds it: snapshot the already-processed
  * corpus's canonical table (hash → min doc_id, the batch gate's own
  * dedup rule) into a parquet LEDGER, then start the gate with
  * `ledgerDir` set — ledger-resolved hashes are answered by a
  * stream-static join and never touch the state store, so state holds
  * only hashes first seen AFTER the snapshot. Re-compact periodically
  * and restart to keep it flat. Null text is tolerated (round 14: the
  * metric columns ride as Options, so a foreign corpus classifies
  * through gateDecision exactly as the batch twin does — the
  * per-kernel null rule every sibling stream already upholds). */
object StreamGate {
  /** d7 entry: stream the documents table of `dir`. */
  def streamingCorpusGate(spark: SparkSession, dir: String): DataFrame =
    streamingCorpusGateFromDir(spark, EventOps.symlinkedDir(dir, "documents.parquet"))

  /** Compact the gate's duplicate-rule state into a durable ledger:
    * one (h, keep_id) row per distinct content hash of `docs` — the
    * batch gate's canonical table (window-min is unnecessary here; a
    * hash-groupBy min is the same one shuffle with a smaller result).
    * Run it over everything the gate has already processed, then
    * restart the gate with `ledgerDir` to shed that state. */
  def compactGateState(docs: DataFrame, ledgerDir: String): Unit =
    docs.select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("keep_id"))
      .write.mode("overwrite").parquet(ledgerDir)

  /** Lower-level entry over any directory of documents-schema parquet
    * files (specs use `maxFilesPerTrigger = 1` to prove the
    * cross-batch duplicate rule). With `ledgerDir` set, hashes the
    * ledger resolves bypass the state store (see object scaladoc). */
  def streamingCorpusGateFromDir(
      spark: SparkSession,
      srcDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      ledgerDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val stream = EventOps.streamReader(spark, StreamDedup.docsSchema, srcDir, maxFilesPerTrigger)

    // stream-static left join against the compacted canonical table:
    // per micro-batch, ledger-known hashes arrive pre-resolved
    val metrics = CorpusOps.gateMetrics(stream)
    val withLedger = ledgerDir match {
      case Some(dir) =>
        val ledger = spark.read.parquet(dir)
          .select(col("h"), col("keep_id").as("ledger_keep"))
        metrics.join(ledger, Seq("h"), "left")
          .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
            col("mean_token_len"), col("h"), col("ledger_keep"))
      case None =>
        metrics.withColumn("ledger_keep", lit(null).cast("long"))
    }

    val withKeep = withLedger
      // Option metrics: a null-text doc carries null n_tokens/ratios
      // (exactly the batch twin's columns) — a primitive decoder would
      // kill the query on the first foreign-corpus row
      .as[(Long, Option[Int], Option[Double], Option[Double], String, Option[Long])]
      .groupByKey(_._5)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String,
            rows: Iterator[(Long, Option[Int], Option[Double], Option[Double], String, Option[Long])],
            state: GroupState[Long]) => {
          // Single-pass fold. The batch-min id must be known before the
          // FIRST row is emitted (Append mode cannot retract), so the
          // group's metric rows are necessarily buffered for the batch —
          // but compactly: one narrow (id, metrics) tuple per row, no
          // sort, no hash/ledger copies. The buffer is bounded by the
          // largest single-batch duplicate class, not the corpus.
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Option[Int], Option[Double], Option[Double])]
          var minId = Long.MaxValue
          var ledger: Option[Long] = None
          while (rows.hasNext) {
            val r = rows.next()
            if (buf.isEmpty) ledger = r._6 // same hash → same ledger row
            if (r._1 < minId) minId = r._1
            buf += ((r._1, r._2, r._3, r._4))
          }
          // out-of-order hardening: if a LATER batch carries a smaller
          // id than the stored/compacted canonical, adopt it — this
          // batch and every future one then decide with the batch
          // gate's true min-id canonical. (Rows already emitted cannot
          // be retracted in Append mode — under doc_id-ordered
          // arrival, d7's stated precondition, the case never arises.)
          val keepId = (state.getOption.toList ++ ledger.toList :+ minId).min
          // bounded state: a hash the ledger already answers with the
          // same canonical never occupies the state store
          if (!ledger.contains(keepId)) state.update(keepId)
          buf.iterator.map { case (id, nTok, pr, mtl) =>
            (id, nTok, pr, mtl, keepId)
          }
        })
      .toDF("doc_id", "n_tokens", "punct_ratio", "mean_token_len", "keep_id")

    CorpusOps.gateDecision(EventOps.drainToTable(withKeep, "append"))
      .orderBy("doc_id")
  }
}
