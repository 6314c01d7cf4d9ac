package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** d10: the e9 AS-OF join as a streaming enrichment — every arriving
  * purchase is joined, AT INGEST TIME, to the user's most recent
  * click at-or-before it among the clicks seen so far. This is the
  * attribution gate a live event pipeline runs: the enrichment has
  * to land with the purchase, not in a nightly batch.
  *
  * Shape: one `flatMapGroupsWithState` keyed by user_id. State is the
  * user's LIVE CLICK LIST (ts-ascending), NOT just the latest click —
  * a purchase that arrives out of order (older than the newest click)
  * must still resolve to the click that preceded IT, which a
  * single-row state cannot answer. The list is bounded the way d6/d8
  * bound theirs: clicks idle past `retentionSec` of the watermark are
  * pruned on the data path and the whole group is dropped via
  * EventTimeTimeout when silent — state is O(clicks per user per
  * retention window), sharded by user across executors. Within a
  * batch, rows process in (ts, click-before-purchase) order, so the
  * inclusive tie rule matches e9 exactly.
  *
  * Determinism + oracle: with the single-file AvailableNow drain the
  * query runs ONE batch — the watermark never advances mid-run, no
  * click is pruned, and in-batch processing is fully time-ordered —
  * so the result is EXACTLY batch e9, and d10 shares e9's DuckDB
  * `ASOF LEFT JOIN` oracle: the hash check certifies batch/stream
  * equivalence for the as-of operator (the d7/c16 and d9/c29
  * pattern). Multi-batch arrival/eviction semantics are pinned by
  * StreamingSpec instead (watermark-schedule-dependent, like d6/d8).
  */
object StreamAsof {
  /** Live clicks of one user, ts-ascending: (tsUs, eventId, value). */
  final case class ClickList(clicks: List[(Long, Long, Double)])

  /** d10 entry: stream the events table of `dir` (schema from the
    * parquet footer — a driver-side metadata read, like d3's). */
  def streamingAsof(spark: SparkSession, dir: String): DataFrame = {
    val (schema, src) = EventOps.eventsSchemaAndDir(spark, dir)
    streamingAsofFromDir(spark, src, schema)
  }

  def streamingAsofFromDir(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      retentionSec: Long = 24L * 3600,
      watermarkDelay: String = "60 seconds",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val retentionUs = retentionSec * 1000000L
    Tables.enableNanosAsLong(spark)
    val raw = EventOps.streamReader(spark, schema, srcDir, maxFilesPerTrigger)

    val tagged = Tables.nanosToTimestamp(raw)
      .filter(col("event_type").isin("click", "purchase"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"),
        col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[(Long, Int, Long, java.sql.Timestamp, Long, Double)]

    val enriched = tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long,
         rows: Iterator[(Long, Int, Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[ClickList]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // prior clicks still live w.r.t. the retention window
            val clicks = scala.collection.mutable.ArrayBuffer.from(
              state.getOption.map(_.clicks).getOrElse(Nil)
                .filter(_._1 + retentionUs >= wmUs))
            // ts order, clicks before purchases on ties — the e9 rule.
            // The buffer is ONE user's slice of ONE micro-batch (the
            // d8 pattern): bounded by batch sizing, never corpus-sized
            val batch = rows.toArray.sortBy(r => (r._5, r._2, r._3))
            val out = Array.newBuilder[
              (Long, Long, Long, Option[Long], Option[Long], Option[Long], Option[Double])]
            batch.foreach { case (_, tag, eventId, _, tsUs, value) =>
              if (tag == 0) {
                // batch clicks arrive ts-ascending, but a prior-state
                // click can be newer: insert in (ts, event_id) order —
                // among equal-ts clicks the e9 total order picks the
                // max event_id as "latest", so cross-batch arrival of a
                // tied click must slot by event_id, not arrival
                val at = clicks.lastIndexWhere(c =>
                  c._1 < tsUs || (c._1 == tsUs && c._2 <= eventId)) + 1
                clicks.insert(at, (tsUs, eventId, value))
              } else {
                clicks.lastIndexWhere(_._1 <= tsUs) match {
                  case -1 => out += ((eventId, userId, tsUs, None, None, None, None))
                  case i =>
                    val (cUs, cId, cVal) = clicks(i)
                    out += ((eventId, userId, tsUs,
                      Some(cId), Some(cUs), Some(tsUs - cUs), Some(cVal)))
                }
              }
            }
            if (clicks.isEmpty) state.remove()
            else {
              state.update(ClickList(clicks.toList))
              // must be strictly past the watermark: a click exactly at
              // the retention boundary survives pruning but its raw
              // timeout would equal the watermark
              state.setTimeoutTimestamp(math.max(
                clicks.last._1 / 1000L + retentionSec * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
      .toDF("event_id", "user_id", "purchase_us",
        "click_event_id", "click_us", "gap_us", "click_value")

    EventOps.drainToTable(enriched, "append").orderBy("event_id")
  }
}
