package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.ops.Dedup
import graft.ops.Dedup.MinHashParams

/** d6: streaming near-duplicate detection — the incremental form of
  * the batch MinHash+LSH pipeline (c2), with watermarked state
  * eviction so a continuously-running ingest job holds bounded state.
  *
  * Shape: each arriving document expands to one row per LSH band
  * (same signature/banding kernels as the batch path); rows group by
  * (band, bucket) and a `flatMapGroupsWithState` operator keeps the
  * doc ids previously seen in that bucket. Each document emits, per
  * band, the number of PRIOR bucket members — summed over bands this
  * is its near-dup candidate-partner count at arrival time (an
  * arrival-ordered variant of c2's `n_candidates`; multiplicity =
  * number of shared bands). Members older than `retention` (event
  * time, judged against the watermark) stop counting as partners and
  * are pruned on the data path; fully idle buckets are additionally
  * dropped via EventTimeTimeout — so state is bounded even when a hot
  * bucket never goes idle. Saturated buckets (≥ `p.maxBucket`
  * members) report 0 partners and stop growing: the batch path drops
  * such degenerate buckets entirely, and claiming maxBucket partners
  * per arrival would invert that semantics.
  *
  * At 100 TB/day the same plan runs unchanged against a real landing
  * directory: state is sharded by (band, bucket) across executors,
  * and the per-batch work is one narrow map + one keyed shuffle.
  */
object StreamDedup {
  /** Epoch base for the synthetic per-doc event time (the documents
    * table has no timestamp column; arrival order follows doc_id). */
  private[streaming] val BaseEpochSec = 1700000000L

  /** Bucket members with their last-seen event time (ms), so aging is
    * enforced on every data batch — not only via the group timeout,
    * which can never fire in a trigger where the group has data. */
  final case class BucketState(ids: Array[Long], tsMs: Array[Long])

  private[streaming] val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** d6 entry: stream the documents table of `dir`. */
  def streamingNearDup(spark: SparkSession, dir: String): DataFrame =
    streamingNearDupFromDir(spark, EventOps.symlinkedDir(dir, "documents.parquet"))

  /** Lower-level entry over any directory of documents-schema parquet
    * files (specs use `maxFilesPerTrigger = 1` to force multi-batch
    * execution and observe eviction). */
  def streamingNearDupFromDir(
      spark: SparkSession,
      srcDir: String,
      p: MinHashParams = MinHashParams(),
      retentionSec: Long = 600L,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None,
      sinkDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val retentionMs = retentionSec * 1000L
    val raw = EventOps.streamReader(spark, docsSchema, srcDir, maxFilesPerTrigger)

    val bc = spark.sparkContext.broadcast(Dedup.hashCoefs(p))
    val bandRows = raw.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = Dedup.signatureOf(text, bc.value, p)
        Dedup.bandHashes(sig, p).iterator.zipWithIndex
          .map { case (h, b) => (b, h, id) }
      }
      .toDF("band", "bucket", "doc_id")
      .withColumn("ts", timestamp_seconds(lit(BaseEpochSec) + col("doc_id")))
      .withWatermark("ts", watermarkDelay)

    val perBand = bandRows
      .select(col("band"), col("bucket"), col("doc_id"), col("ts"))
      .as[(Int, Long, Long, java.sql.Timestamp)]
      .groupByKey { case (band, bucket, _, _) => (band, bucket) }
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long),
         rows: Iterator[(Int, Long, Long, java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // idle past retention with no new data: drop the state row
            state.remove()
            Iterator.empty
          } else {
            // age out members older than retention FIRST: a bucket that
            // stays warm never times out, so eviction must also happen
            // on the data path (a member expires once the watermark
            // passes its event time + retention)
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption.getOrElse(BucketState(Array.empty, Array.empty))
            val live = prev.ids.indices.filter(i => prev.tsMs(i) + retentionMs >= wm)
            var ids = live.map(prev.ids).toArray
            var ts = live.map(prev.tsMs).toArray
            // doc_id order = event-time order here, keeping multi-row
            // batches deterministic regardless of shuffle arrival order
            val batch = rows.toArray.sortBy(_._3)
            val out = batch.map { case (_, _, id, t) =>
              // saturated bucket = degenerate content (the batch path
              // drops such buckets entirely); report 0 partners and
              // stop growing state rather than claiming maxBucket
              // near-dups for every arrival
              val n = if (ids.length >= p.maxBucket) 0L else ids.length.toLong
              if (ids.length < p.maxBucket) { ids :+= id; ts :+= t.getTime }
              (id, n)
            }
            state.update(BucketState(ids, ts))
            // last-seen never regresses (the d8 rule): an in-watermark
            // but OLDER batch must not pull the eviction bound forward
            // past a surviving member's true latest sighting — the
            // bound covers the newest timestamp across batch AND state
            val maxTsMs = math.max(
              batch.map(_._4.getTime).max,
              if (ts.isEmpty) Long.MinValue else ts.max)
            state.setTimeoutTimestamp(maxTsMs + retentionMs)
            out.iterator
          }
      }
      .toDF("doc_id", "n_prior")

    // Per-doc summing happens INSIDE the streaming query: a document's
    // band rows all emit in the trigger that ingested it (one input row
    // fans out to its bands, and flatMapGroupsWithState emits in the
    // same batch), so the per-batch aggregate is already the doc's
    // final partner count. Each microbatch therefore lands O(docs in
    // batch) rows — the materialized output is O(docs) total, never
    // O(docs × bands).
    //
    // Durability/idempotence contract lives in EventOps.drainPerDoc.
    EventOps.drainPerDoc(perBand, sinkDir, "d6_out") { batch =>
      batch.groupBy("doc_id").agg(sum("n_prior").as("n_prior_candidates"))
    } { written =>
      written.groupBy("doc_id")
        .agg(sum("n_prior_candidates").as("n_prior_candidates"))
    }
  }
}
