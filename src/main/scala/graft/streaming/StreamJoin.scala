package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** d12: stream-STREAM interval join — every purchase paired with ALL
  * of the user's clicks in the preceding 12 hours, both sides live
  * streams. This is the one streaming operator class the d-layer
  * didn't yet exercise: Spark's symmetric hash join
  * (`StreamingSymmetricHashJoinExec`), where BOTH inputs buffer in
  * the state store and rows join as either side arrives. d10 answers
  * "the latest click" with custom state; d12 answers "all clicks in
  * the attribution window" with the engine's own join operator — the
  * fan-out form a marketing-attribution pipeline actually runs.
  *
  * State bounding is the textbook watermark construction: both sides
  * carry event-time watermarks AND the join condition carries the
  * time-range predicate (`c_ts ∈ [p_ts − 12 h, p_ts]`), which is
  * what lets Spark compute each side's state-eviction bound — clicks
  * older than (watermark − 12 h) can never match a future purchase
  * and are dropped from the store. Without the range predicate the
  * state would grow forever; PlanSpec-style pinning is replaced here
  * by the StreamingSpec multi-trigger equivalence test (the join
  * plan only materializes inside a started streaming query).
  *
  * Determinism + oracle: an inner equi+range join is a pure function
  * of the input SET — arrival order and trigger slicing change
  * nothing (append mode, no dedup, no "first wins"). d12 therefore
  * hash-matches its DuckDB oracle under ANY drain schedule, and the
  * StreamingSpec split-arrival test is the executable form of that
  * claim (clicks and purchases of the same pair arriving in
  * DIFFERENT triggers still join — the state store holds the early
  * side until the late side arrives). */
object StreamJoin {
  /** Attribution window: clicks this far before the purchase count. */
  val WindowHours = 12L

  /** The purchase side: (event_id, user_id, p_ts). SHARED by
    * streaming d12 and batch e18 — their "same semantics, same
    * oracle" twin claim depends on one copy of the column prep. */
  private[graft] def purchaseSide(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))

  /** The click side: (click_event_id, c_user, c_ts). */
  private[graft] def clickSide(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))

  /** The attribution join + projection — ONE copy of the equi+range
    * predicate (user match, c_ts ∈ [p_ts − WindowHours, p_ts], both
    * bounds inclusive) and the micros projection, shared by d12's
    * streaming symmetric hash join and e18's batch equi join. */
  private[graft] def joinAndProject(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $WindowHours HOURS"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        col("click_event_id"),
        unix_micros(col("c_ts")).as("click_us"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))

  /** d12 entry: stream the events table of `dir` on both sides. */
  def streamingIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val (schema, src) = EventOps.eventsSchemaAndDir(spark, dir)
    streamingIntervalJoinFromDir(spark, src, schema)
  }

  def streamingIntervalJoinFromDir(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    Tables.enableNanosAsLong(spark)
    val purchases = purchaseSide(side(spark, srcDir, schema, maxFilesPerTrigger))
      .withWatermark("p_ts", watermarkDelay)
    val clicks = clickSide(side(spark, srcDir, schema, maxFilesPerTrigger))
      .withWatermark("c_ts", watermarkDelay)

    EventOps.drainToTable(joinAndProject(purchases, clicks), "append")
      .orderBy("event_id", "click_event_id")
  }

  private def side(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    Tables.nanosToTimestamp(
      EventOps.streamReader(spark, schema, srcDir, maxFilesPerTrigger))
  }

  /** d12 LIVE-MODE state evidence: the same join drained under a real
    * multi-trigger schedule (time-ordered files, advancing watermark),
    * returning the result TABLE plus the state operator's
    * per-completed-batch total state rows. The single-batch
    * AvailableNow drain the oracle uses holds the watermark at 0 and
    * buffers both sides fully — worst case by construction; THIS path
    * measures the production claim that watermark eviction bounds
    * state at the attribution window: with input spanning many
    * windows, max-over-batches state rows must plateau at O(rows per
    * window + delay), not grow with the stream. StreamingSpec asserts
    * the plateau on a controlled fixture; the ScaleProbe d12-live arm
    * measures it at 2M events / 100 windows. */
  private[graft] def streamingIntervalJoinWithStateMetrics(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None): (DataFrame, Array[Long]) = {
    Tables.enableNanosAsLong(spark)
    val purchases = purchaseSide(side(spark, srcDir, schema, maxFilesPerTrigger))
      .withWatermark("p_ts", watermarkDelay)
    val clicks = clickSide(side(spark, srcDir, schema, maxFilesPerTrigger))
      .withWatermark("c_ts", watermarkDelay)
    val name = s"graft_d12_live_${System.identityHashCode(schema)}_${System.nanoTime()}"
    // per-batch state rows come from a LISTENER keyed by query name,
    // not from q.recentProgress alone: Spark caps recentProgress at
    // numRecentProgressUpdates (default 100), so a >100-trigger run
    // would silently drop the earliest batches from the plateau
    // measurement. recentProgress is still merged in (by batchId) as
    // a backstop for any event the async bus hasn't delivered yet.
    val byBatch = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.name == name && (p.numInputRows > 0 || p.stateOperators.nonEmpty))
          p.stateOperators.headOption.foreach(s =>
            byBatch.put(p.batchId, s.numRowsTotal))
      }
    }
    spark.streams.addListener(listener)
    try {
      val q = joinAndProject(purchases, clicks).writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the listener bus delivers asynchronously: poll (bounded) until
      // the LAST batch's event has landed in byBatch rather than
      // trusting a fixed sleep — a lagging bus on a >100-trigger run
      // would otherwise drop early batches that recentProgress (capped
      // at 100 entries) can no longer backstop
      // wait for the newest batch the listener WOULD record (its
      // effective store condition: a state-operator entry exists). The
      // target comes from recentProgress's max STATEFUL batchId, not
      // just lastProgress: when the final event is the zero-row
      // stateless commit, lastProgress alone would skip the wait and a
      // lagging bus could still lose early batches past the 100-entry
      // recentProgress cap — the exact gap this poll exists to close.
      // (A stateless final event also can't stall the deadline: the
      // target is then the latest STATEFUL batch, which the bus either
      // has delivered or will.)
      val lastBatch = (Option(q.lastProgress).toSeq ++ q.recentProgress.toSeq)
        .filter(_.stateOperators.nonEmpty)
        .map(_.batchId)
        .maxOption
      val deadline = System.nanoTime() + 5_000_000_000L
      while (lastBatch.exists(b => !byBatch.containsKey(b)) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      q.recentProgress.toSeq
        .filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
        .foreach(p => p.stateOperators.headOption.foreach(s =>
          byBatch.putIfAbsent(p.batchId, s.numRowsTotal)))
      val stateRows = {
        import scala.jdk.CollectionConverters._
        byBatch.asScala.toSeq.sortBy(_._1).map(_._2).toArray
      }
      // release the memory sink (the drainToTable discipline)
      val out = spark.table(name).localCheckpoint(true)
      spark.catalog.dropTempView(name)
      (out, stateRows)
    } finally spark.streams.removeListener(listener)
  }
}
