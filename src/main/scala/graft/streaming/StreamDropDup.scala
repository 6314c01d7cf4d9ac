package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** d13: Spark's NATIVE streaming deduplication operator
  * (`dropDuplicates` → `StreamingDeduplicateExec`) — the engine's own
  * exactly-once key dedup, complementing the suite's custom dedup
  * states (d6 MinHash buckets, d7 content hashes, d8 spans): here the
  * state store, key tracking, and cross-batch suppression are all the
  * engine's, and the operator emits each key's FIRST arrival only.
  *
  * Query: the distinct (user_id, event_type) activity matrix of the
  * event stream. Dedup semantics over a key set are a pure function
  * of the input SET (which keys exist), so the emitted key set equals
  * batch DISTINCT under any trigger slicing — the oracle is plain
  * `SELECT DISTINCT`, and StreamingSpec pins that a key re-arriving
  * in a LATER batch is suppressed by state (the part single-batch
  * verification can't show).
  *
  * Scale note: plain `dropDuplicates` keeps one state row per
  * distinct key forever — correct here because the key domain
  * (users × 5 event types) is enumerable and the op's contract is
  * all-time first-arrival. For unbounded key domains (content
  * hashes, span keys) the production form bounds state by time:
  * either `dropDuplicatesWithinWatermark` or the custom watermarked
  * states d6/d7/d8 already implement. */
object StreamDropDup {
  /** d13 entry: stream the events table of `dir`. */
  def streamingDropDup(spark: SparkSession, dir: String): DataFrame = {
    val (schema, src) = EventOps.eventsSchemaAndDir(spark, dir)
    streamingDropDupFromDir(spark, src, schema)
  }

  def streamingDropDupFromDir(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    Tables.enableNanosAsLong(spark)
    val raw = EventOps.streamReader(spark, schema, srcDir, maxFilesPerTrigger)
    val deduped = raw
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    EventOps.drainToTable(deduped, "append")
      .orderBy("user_id", "event_type")
  }
}
