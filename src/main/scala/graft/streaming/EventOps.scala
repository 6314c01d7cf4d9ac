package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.Tables

/** Event-stream operators (SURVEY.md §2 D). d1/d2 are batch queries
  * with SQL oracles; d3 runs a genuine Structured Streaming query
  * (file source → windowed agg → memory sink) whose result is the
  * batch-parity aggregation, so it is oracle-checkable too. */
object EventOps {
  /** d1: gap-based sessionization (30-min inactivity). One shuffle on
    * user_id; windows are per-user (bounded state). */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val ev = Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy("user_id", "session_idx")
      .agg(
        min(unix_timestamp(col("ts"))).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  /** d5: sessionization via Spark's NATIVE session_window operator
    * (gap-merged windows; an event at exactly gap distance starts a
    * new session — strict `<` merge, mirrored in the oracle's `>=`
    * split condition). Complements d1, which builds the same sessions
    * from first principles with lag + cumulative sum. */
  def sessionWindow(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        unix_timestamp(col("first_ts")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** d2: tumbling 5-minute window aggregation per event type (batch
    * parity of the streaming query; uses Spark's native window()). */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket_start", "event_type")

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  private val srcDirCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.nio.file.Path]()

  /** The file stream source requires a directory (a direct file path
    * fails with "basePath must be a directory", even with an explicit
    * basePath option — verified empirically): expose a single table
    * file through a cached symlinked temp dir (at cluster scale the
    * source would be a real landing directory). Shared by every
    * streaming operator in this package. */
  private[graft] def symlinkedDir(dir: String, fileName: String): String =
    srcDirCache.computeIfAbsent((dir, fileName), _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_stream_src")
      val link = d.resolve(fileName)
      // absolute target: a relative one would resolve against the temp
      // dir, not the JVM cwd, leaving a dangling symlink
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$dir/$fileName").toAbsolutePath)
      d.toFile.deleteOnExit(); link.toFile.deleteOnExit()
      d
    }).toString

  /** Streaming source over the events table. The file stream source
    * needs an explicit schema; take it from the parquet footer (a
    * driver-side metadata read, no data scan) so `ts` matches whatever
    * encoding this testdata generation shipped — raw long nanos or
    * TIMESTAMP micros (see Tables.nanosToTimestamp, which consumers
    * apply when they need a real timestamp). */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val (schema, src) = eventsSchemaAndDir(spark, dir)
    streamReader(spark, schema, src, maxFilesPerTrigger = None)
  }

  /** The shared events-stream entry prologue (nanos conf + footer
    * schema + symlinked source dir) — used by every operator that
    * streams the events table (d3/d4 here, d10/d12/d13 entries), so a
    * change to how the events schema is derived lands once. */
  private[streaming] def eventsSchemaAndDir(
      spark: SparkSession, dir: String): (org.apache.spark.sql.types.StructType, String) = {
    Tables.enableNanosAsLong(spark)
    (spark.read.parquet(s"$dir/events.parquet").schema,
      symlinkedDir(dir, "events.parquet"))
  }

  /** The package's ONE schema'd file-stream reader (optional
    * per-trigger file cap). Eleven operators previously inlined this
    * three-liner; a source-option change now lands in one place, so no
    * operator can silently run under different trigger slicing than
    * its siblings. */
  private[streaming] def streamReader(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      srcDir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(srcDir)
  }

  /** Drain a streaming DataFrame synchronously into a uniquely-named
    * memory table and return it as a batch DataFrame.
    *
    * CONTRACT for `mode = "update"`: the memory sink APPENDS one row
    * per (key, trigger) — the returned table equals the final state
    * only under a single-trigger drain (the AvailableNow single-file
    * default of every production query here). A caller that forces
    * multiple triggers (maxFilesPerTrigger) receives a MULTISET with
    * one row per key per emitting batch and must itself keep the last
    * emission per key (StreamingSpec's multi-trigger assertions do
    * exactly that). "append" and "complete" modes have no such
    * caveat: append emits each result row once, complete rewrites the
    * table every trigger. */
  private[streaming] def drainToTable(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_sink_${runId.incrementAndGet()}"
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val spark = df.sparkSession
    // materialize and RELEASE the memory sink: the sink pins the full
    // result on the driver for the JVM lifetime otherwise, and the
    // bench drains 13 streaming ops × 3 runs each (d12's interval-join
    // fan-out is the largest output in the suite). localCheckpoint
    // severs the reference; dropping the temp view lets the sink be
    // collected (the Scratch.materialize discipline).
    val out = spark.table(name).localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Shared durable drain for the per-doc streaming rollups (d6, d8):
    * run `src` to completion under AvailableNow, writing `perBatch`'s
    * per-doc rollup of each microbatch to its own
    * `batch_id=<n>` partition with overwrite — which makes
    * foreachBatch's at-least-once retries idempotent — then return
    * `reSum` over everything written, ordered by doc_id. `reSum` is a
    * guard over O(docs) rows, a no-op while the one-trigger-per-doc
    * invariant holds (every doc lands in exactly one batch partition).
    *
    * A production run passes `sinkDir` on shared storage: the
    * checkpoint then lives UNDER the sink, so a re-invocation resumes
    * incrementally (only new input files are processed) instead of
    * re-ingesting the corpus and appending duplicate rows. Without
    * `sinkDir` the drain uses local scratch (fresh temp checkpoint
    * each call), materializes the small per-doc result, and deletes
    * the scratch so repeated harness runs don't accumulate files. */
  private[streaming] def drainPerDoc(
      src: DataFrame,
      sinkDir: Option[String],
      scratchTag: String)(
      perBatch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row] => DataFrame)(
      reSum: DataFrame => DataFrame): DataFrame = {
    val spark = src.sparkSession
    def drainAndRead(outDir: String, durable: Boolean): DataFrame = {
      val writer = src.writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          perBatch(batch).write.mode("overwrite").parquet(s"$outDir/data/batch_id=$id")
        }
        .trigger(Trigger.AvailableNow())
      val q = (if (durable) writer.option("checkpointLocation", s"$outDir/_checkpoint")
               else writer)
        .start()
      q.awaitTermination()
      // a zero-batch drain (empty landing directory — a legal state for
      // a durable deployment's first run) writes no data dir; surface
      // an empty result with the right schema (derived by running the
      // per-batch transform on an empty slice), not a PATH_NOT_FOUND /
      // schema-inference crash
      val dataDir = new org.apache.hadoop.fs.Path(s"$outDir/data")
      val fs = dataDir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(dataDir)) {
        val emptyBatch = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], src.schema)
        reSum(perBatch(emptyBatch)).orderBy("doc_id")
      } else
        reSum(spark.read.parquet(s"$outDir/data")).orderBy("doc_id")
    }
    sinkDir match {
      case Some(out) => drainAndRead(out, durable = true)
      case None => graft.Scratch.materialize(scratchTag)(drainAndRead(_, durable = false))
    }
  }

  /** round-half-away-from-zero, matching SQL round() in both Spark and
    * DuckDB (Scala math.round is half-toward-positive-infinity, which
    * diverges on negative values). */
  private def roundHalfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Per-user running aggregate carried in group state (d4). Money is
    * tracked in integer cents so state merges are order-independent
    * (a double sum would depend on shuffle order and could not
    * hash-match the oracle). */
  final case class UserState(nEvents: Long, totalCents: Long)

  /** d4: custom stateful streaming via mapGroupsWithState — per-user
    * totals accumulated in GroupState, emitted each micro-batch
    * (update mode). With an AvailableNow drain over one input file this
    * yields exactly the batch per-user totals, so the query is
    * oracle-checkable. */
  def streamingUserStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val updateState = (userId: Long, events: Iterator[(Long, Double)],
        state: GroupState[UserState]) => {
      val prev = state.getOption.getOrElse(UserState(0L, 0L))
      var n = prev.nEvents
      var cents = prev.totalCents
      events.foreach { t => n += 1; cents += roundHalfAway(t._2 * 100) }
      state.update(UserState(n, cents))
      (userId, n, cents)
    }
    // only the columns the state function reads — event_id would ride
    // the groupByKey shuffle decoded and unread
    val agg = eventsStream(spark, dir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
      .toDF("user_id", "n_events", "total_cents")
    drainToTable(agg, "update").orderBy("user_id")
  }

  /** d3: the same aggregation executed as a real Structured Streaming
    * query — file stream source, watermark, complete-mode memory sink,
    * drained synchronously with availableNow. */
  def streamingWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val stream = Tables.nanosToTimestamp(eventsStream(spark, dir))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    drainToTable(stream, "complete")
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"))
      .orderBy("bucket_start", "event_type")
  }
}
