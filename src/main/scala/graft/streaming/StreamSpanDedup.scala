package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** d8: streaming substring-span dedup — the incremental form of the
  * batch cross-doc span pipeline (c24), for a continuously-running
  * ingest job that must flag boilerplate spans AGAINST THE CORPUS SEEN
  * SO FAR. Where batch c24 flags every holder of a shared span, the
  * streaming form keeps each span's FIRST holder unflagged (its copy
  * is the one the corpus keeps) and flags every later arrival — the
  * ordered-arrival semantics an ingest gate actually wants.
  *
  * Shape: each arriving document expands through the SAME compiled
  * two-lane span kernel as c24 (one row per window, two-long key, no
  * window text materialized); rows group by exact span key and a
  * `flatMapGroupsWithState` operator keeps (first-holder id,
  * last-seen time) per live span. A row is a duplicate iff a DIFFERENT
  * doc already holds its span. All of a doc's windows emit in the
  * trigger that ingested it, so the per-batch `foreachBatch` step can
  * compute the doc's full interval-union coverage (same telescoping
  * lead() merge as c24) before anything is persisted — each microbatch
  * lands O(docs) rows, never O(windows).
  *
  * State is one row per DISTINCT live span — the Lee et al. streaming
  * analogue — bounded by `retentionSec` exactly like d6: spans idle
  * past retention are pruned on the data path when touched and dropped
  * via EventTimeTimeout when not. At 100 TB/day the state shards by
  * span key across executors and the per-batch work is the c24 kernel
  * scan plus one keyed shuffle. Span state is VOLUMINOUS (~n_tokens
  * rows per live doc): deploy with the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`) — the default
  * HDFSBacked provider keeps every state row on-heap and OOMs around
  * ~16M live spans per 32-thread JVM (measured: 500k×40-token docs in
  * one batch; the same probe completes on RocksDB — see ScaleProbe) —
  * AND with changelog checkpointing
  * (`...stateStore.rocksdb.changelogCheckpointing.enabled=true`):
  * commits then ship the batch's delta instead of a full snapshot,
  * 75.5 → 55.4 s at 500k docs (results/d8_provider_ab_r14.json).
  * The remaining wall is a state-INGEST floor, linear in spans (batch
  * c24 computes the identical spans in 6.45 s at 500k; the other
  * ~49 s is RocksDB ingest+commit of 16.5M states — the price of
  * incremental-gate semantics); keep state shards ≈ cores (8 shards
  * serialize ingest, 64 add per-store commit overhead).
  *
  * Determinism + oracle: with the default single-file source the
  * AvailableNow drain runs ONE batch, the watermark never advances
  * mid-run, and no span can expire — so "a different doc already
  * holds the span" reduces to the order-independent rule
  * `doc_id > min(doc_id) over the span`, which is exactly the DuckDB
  * oracle (hash-checked). Multi-batch eviction behavior is pinned by
  * StreamingSpec instead (it is watermark-schedule-dependent, like
  * d6's).
  */
object StreamSpanDedup {
  /** First holder + last-seen event time (ms) of a live span. */
  final case class SpanState(holder: Long, tsMs: Long)

  /** d8 entry: stream the documents table of `dir`. */
  def streamingSpanDedup(spark: SparkSession, dir: String): DataFrame =
    streamingSpanDedupFromDir(spark, EventOps.symlinkedDir(dir, "documents.parquet"))

  /** Per-(table-dir, n) cache of the deterministic multi-file source
    * layout — the split is pure function of the table, and Bench runs
    * the query several times (the symlinkedDir precedent). */
  private val mbSrcCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  /** Deterministic n-file split of the documents table for a
    * multi-trigger drain: bucket k = ntile(n) over doc_id order (the
    * same ANSI ntile the oracle computes), one parquet file per
    * bucket, strictly increasing modification times so the file
    * source's oldest-first ordering ingests bucket k as trigger k.
    * The layout is harness plumbing (a production ingest has real
    * arrival order); the OPERATOR under test is the unchanged d8
    * pipeline. */
  private[graft] def multiBatchDocsDir(
      spark: SparkSession, dir: String, n: Int): String =
    mbSrcCache.computeIfAbsent((dir, n), _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_d8b_src")
      tmp.toFile.deleteOnExit() // registered FIRST: deleteOnExit runs LIFO,
      // so the per-file hooks below fire before the (then-empty) dir's
      val docs = graft.Tables.documents(spark, dir)
      // localCheckpoint: without it each bucket's write re-runs the
      // full scan + single-partition ntile sort — n global sorts
      // where one does (verify-scale harness plumbing, but no reason
      // to pay n-fold)
      val withB = docs.withColumn("b",
        ntile(n).over(Window.orderBy("doc_id"))).localCheckpoint(true)
      (1 to n).foreach { k =>
        val stage = java.nio.file.Files.createTempDirectory("graft_d8b_stage")
        withB.filter(col("b") === k).drop("b")
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.toFile.listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for batch $k"))
        val dst = tmp.resolve(f"batch$k%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        // distinct mtimes: FileStreamSource orders available files by
        // modification time; equal stamps would leave trigger order
        // undefined and the replay oracle wrong
        require(dst.toFile.setLastModified(1000000000L + k * 60000L),
          s"could not stamp mtime on $dst")
        dst.toFile.deleteOnExit()
        org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
      }
      tmp.toString
    })

  /** d8b: the UNCHANGED d8 pipeline driven through a deterministic
    * ≥3-trigger drain (one file per trigger over the ntile(3) doc_id
    * split), with retention tightened to 60 s so cross-batch EVICTION
    * and first-holder HANDOFF actually occur at verify scale — the
    * multi-batch semantics the single-batch d8 hash cannot touch.
    *
    * Determinism: trigger k's watermark is fixed by construction
    * (max event time of triggers < k minus the 60 s delay; event time
    * = BaseEpochSec + doc_id, and trigger k holds a doc_id RANGE), so
    * the ordered-arrival rule replays exactly in SQL: the oracle
    * unrolls the three batch steps per span — batch-1 holder = min
    * doc; batch-k holder = prior holder if its last sighting is
    * within retention of the batch watermark, else the batch's min
    * doc; a row is dup iff its doc ≠ its batch's effective holder.
    * Since event time is BaseEpochSec + doc_id, the epoch base cancels
    * from every watermark comparison and the replay runs in doc-id
    * units (x_prior + RET + DELAY ≥ max_doc_of_prior_batches). Late
    * rows cannot occur (trigger k's doc_ids all exceed every earlier
    * doc_id, so event times sit above the watermark by construction),
    * and state timeout-removal is equivalent to the data-path expiry
    * check because the watermark is monotone. */
  def streamingSpanDedupMultiBatch(spark: SparkSession, dir: String): DataFrame =
    streamingSpanDedupFromDir(spark,
      multiBatchDocsDir(spark, dir, MultiBatchN),
      retentionSec = MultiBatchRetentionSec,
      watermarkDelay = "60 seconds",
      maxFilesPerTrigger = Some(1))

  /** d8b trigger count and retention — shared with the oracle
    * generator (the SQL unrolls exactly [[MultiBatchN]] batch steps at
    * this retention). */
  private[graft] val MultiBatchN = 3
  private[graft] val MultiBatchRetentionSec = 60L

  def streamingSpanDedupFromDir(
      spark: SparkSession,
      srcDir: String,
      retentionSec: Long = 600L,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None,
      sinkDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val retentionMs = retentionSec * 1000L
    val raw = EventOps.streamReader(spark, StreamDedup.docsSchema, srcDir, maxFilesPerTrigger)

    val winRows = raw.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
        Dedup.spanWindowHashes(toks).map { case (p, h1, h2) => (h1, h2, id, p) }
      }
      .toDF("h1", "h2", "doc_id", "p")
      .withColumn("ts",
        timestamp_seconds(lit(StreamDedup.BaseEpochSec) + col("doc_id")))
      .withWatermark("ts", watermarkDelay)

    val flagged = winRows
      .select(col("h1"), col("h2"), col("doc_id"), col("p"), col("ts"))
      .as[(Long, Long, Long, Int, java.sql.Timestamp)]
      .groupByKey { case (h1, h2, _, _, _) => (h1, h2) }
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, Long),
         rows: Iterator[(Long, Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[SpanState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // expire on the data path too: a span last seen before
            // (watermark - retention) no longer counts as held, and the
            // current batch's first arrival becomes the new holder
            val prior = state.getOption.filter(_.tsMs + retentionMs >= wm)
            var holder = prior.map(_.holder)
            // doc_id order = event-time order (deterministic whatever
            // the shuffle delivers)
            val batch = rows.toArray.sortBy(r => (r._3, r._4))
            val out = batch.map { case (_, _, id, p, _) =>
              val dup = holder.exists(_ != id)
              if (holder.isEmpty) holder = Some(id)
              (id, p, if (dup) 1 else 0)
            }
            // last-seen never regresses: an in-watermark but
            // earlier-event-time copy must not pull the expiry forward
            // past the span's true latest sighting
            val maxTsMs = math.max(
              batch.map(_._5.getTime).max,
              prior.map(_.tsMs).getOrElse(Long.MinValue))
            state.update(SpanState(holder.get, maxTsMs))
            state.setTimeoutTimestamp(maxTsMs + retentionMs)
            out.iterator
          }
      }
      .toDF("doc_id", "p", "dup")

    // per-doc rollup INSIDE each batch: every doc's windows emit in the
    // trigger that ingested it, so coverage (the same telescoping
    // interval union as c24) is complete here. Durability/idempotence
    // contract lives in EventOps.drainPerDoc.
    EventOps.drainPerDoc(flagged, sinkDir, "d8_out") { batch =>
      val byDoc = Window.partitionBy("doc_id").orderBy("p")
      val counts = batch.groupBy("doc_id").agg(
        count(lit(1)).cast("int").as("n_windows"),
        sum("dup").cast("int").as("n_dup_windows"))
      val cov = batch.filter(col("dup") === 1)
        .withColumn("c", least(lit(Dedup.SpanK),
          coalesce(lead(col("p"), 1).over(byDoc),
            col("p") + Dedup.SpanK) - col("p")))
        .groupBy("doc_id").agg(sum("c").cast("long").as("dup_tokens"))
      counts.join(cov, Seq("doc_id"), "left")
        .na.fill(0L, Seq("dup_tokens"))
    } { written =>
      written.groupBy("doc_id")
        .agg(sum("n_windows").cast("int").as("n_windows"),
          sum("n_dup_windows").cast("int").as("n_dup_windows"),
          sum("dup_tokens").cast("long").as("dup_tokens"))
    }
  }
}
