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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read it as raw nanos and truncate to micros
    * (DuckDB keeps nanos — all derived outputs are at ≥second
    * granularity, so the truncation is oracle-safe). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    enableNanosAsLong(spark)
    nanosToTimestamp(load(spark, dir, "events"))
  }

  /** The session conf that lets parquet TIMESTAMP(NANOS) be read (as
    * raw long nanos). Shared by the batch loader and streaming source. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Convert a raw-nanos `ts` column to a proper timestamp (micros). */
  def nanosToTimestamp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
