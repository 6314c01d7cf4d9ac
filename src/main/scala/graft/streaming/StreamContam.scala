package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CorpusOps

/** d9: c29's embedding-space decontamination as a streaming ingest
  * gate — score every ARRIVING embedding against the frozen eval set
  * at ingest time, the point where a production pipeline actually
  * wants to stop benchmark leakage (before the doc lands in the
  * training corpus at all).
  *
  * Shape: the eval set is bounded by contract and frozen BEFORE the
  * stream starts (a batch read of the same table — at 100 TB/day it
  * would be the benchmark registry), then broadcast into the SAME
  * typed local-argmax kernel as batch c29 ([[CorpusOps.contamScore]],
  * shared code — the paths cannot drift). The query is STATELESS: no
  * state store, no watermark, no shuffle; every micro-batch is one
  * narrow map over the arriving files — the cheapest possible
  * streaming operator shape, and the result is arrival-order-
  * independent by construction. d9 therefore shares c29's SQL oracle
  * verbatim, and the DuckDB hash check certifies batch/stream
  * equivalence end-to-end (the d7/c16 pattern, now on the vector
  * path). */
object StreamContam {
  /** File-stream schema for the embeddings table (the file source
    * needs it explicit). */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** d9 entry: stream the embeddings table of `dir`; the eval set is
    * the frozen batch read of the same table. */
  def streamingEmbedContam(spark: SparkSession, dir: String): DataFrame =
    streamingEmbedContamFromDir(spark,
      EventOps.symlinkedDir(dir, "embeddings.parquet"),
      graft.Tables.embeddings(spark, dir))

  def streamingEmbedContamFromDir(
      spark: SparkSession,
      srcDir: String,
      evalSource: DataFrame,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val eval = CorpusOps.collectEvalSet(spark, evalSource)
    val stream = EventOps.streamReader(spark, embSchema, srcDir, maxFilesPerTrigger)
    val scored = CorpusOps.contamScore(
      stream.filter(col("vec_id") >= CorpusOps.EvalIdBound)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])],
      eval)
    EventOps.drainToTable(scored, "append").orderBy("vec_id")
  }
}
