package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish test data.
  *
  * Every operator takes `(spark, sfDir)` and reads through here, so the
  * same code runs at any scale factor — locally against
  * `/root/testdata/sf*`, or at cluster scale against a different root.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark 4 refuses to read as
    * a timestamp, so it arrives as raw long nanos under the legacy
    * conf — and plain TIMESTAMP micros (read as TIMESTAMP_NTZ).
    * Normalize both to TimestampType here so every consumer sees one
    * schema. (DuckDB reads either natively; all derived outputs are at
    * ≥second granularity, so the nanos→micros truncation is
    * oracle-safe, and at the UTC session timezone the NTZ cast is a
    * wall-clock no-op.) */
  def events(spark: SparkSession, dir: String): DataFrame = {
    enableNanosAsLong(spark)
    nanosToTimestamp(load(spark, dir, "events"))
  }

  /** The session conf that lets parquet TIMESTAMP(NANOS) be read (as
    * raw long nanos). Shared by the batch loader and streaming source;
    * harmless when the file is already micros. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize a `ts` column to TimestampType whatever the source
    * encoding: raw long nanos → truncate to micros; TIMESTAMP_NTZ →
    * reinterpret at the session timezone (UTC). */
  def nanosToTimestamp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
