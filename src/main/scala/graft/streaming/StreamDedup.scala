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
  * number of shared bands). Buckets idle longer than `retention`
  * (event time) are evicted via EventTimeTimeout — the watermark
  * bounds state exactly as the reference pipelines bound their
  * dedup window. Bucket membership is capped at `p.maxBucket`, the
  * same quadratic-explosion guard as the batch path.
  *
  * At 100 TB/day the same plan runs unchanged against a real landing
  * directory: state is sharded by (band, bucket) across executors,
  * and the per-batch work is one narrow map + one keyed shuffle.
  */
object StreamDedup {
  /** Epoch base for the synthetic per-doc event time (the documents
    * table has no timestamp column; arrival order follows doc_id). */
  private[streaming] val BaseEpochSec = 1700000000L

  final case class BucketState(ids: Array[Long])

  private val srcDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** d6 entry: stream the documents table of `dir`. */
  def streamingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = srcDirCache.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_stream_docs")
      val link = d.resolve("documents.parquet")
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$dir/documents.parquet").toAbsolutePath)
      d.toFile.deleteOnExit(); link.toFile.deleteOnExit()
      d
    })
    streamingNearDupFromDir(spark, srcDir.toString)
  }

  /** Lower-level entry over any directory of documents-schema parquet
    * files (specs use `maxFilesPerTrigger = 1` to force multi-batch
    * execution and observe eviction). */
  def streamingNearDupFromDir(
      spark: SparkSession,
      srcDir: String,
      p: MinHashParams = MinHashParams(),
      retentionSec: Long = 600L,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val retentionMs = retentionSec * 1000L
    val reader = spark.readStream.schema(docsSchema)
    val raw = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(srcDir)

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
      .as[(Int, Int, Long, java.sql.Timestamp)]
      .groupByKey { case (band, bucket, _, _) => (band, bucket) }
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Int),
         rows: Iterator[(Int, Int, Long, java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // idle past retention: evict — old members no longer count
            // as near-dup partners for future arrivals
            state.remove()
            Iterator.empty
          } else {
            var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
            // doc_id order = event-time order here, keeping multi-row
            // batches deterministic regardless of shuffle arrival order
            val batch = rows.toArray.sortBy(_._3)
            val out = batch.map { case (_, _, id, _) =>
              val n = ids.length
              if (ids.length < p.maxBucket) ids :+= id
              (id, n)
            }
            state.update(BucketState(ids))
            val maxTsMs = batch.map(_._4.getTime).max
            state.setTimeoutTimestamp(maxTsMs + retentionMs)
            out.iterator
          }
      }
      .toDF("doc_id", "n_prior")

    EventOps.drainToTable(perBand, "append")
      .groupBy("doc_id")
      .agg(sum("n_prior").as("n_prior_candidates"))
      .orderBy("doc_id")
  }
}
