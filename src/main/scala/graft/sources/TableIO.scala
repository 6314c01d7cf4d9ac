package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** csv/json variants of the relational tables (SURVEY §7 rounds-4+
  * item) — engine completeness, not reference coverage: the reference
  * has no such surface, but a corpus pipeline ingests from whatever
  * format upstream produces.
  *
  * Spark's built-in csv/json sources ARE the implementation (they are
  * distributed, splittable, and predicate-aware); what this object adds
  * is the option set that makes a round-trip BIT-FAITHFUL, which the
  * defaults are not:
  *
  *  - csv `escape` must be `"` (RFC 4180 quote-doubling). The default
  *    backslash escape corrupts text containing quotes on read-back.
  *  - `nullValue` is set to `\N` so NULL and the empty string survive
  *    as distinct values (by default both collapse to null).
  *  - `emptyValue` writes the empty string as a quoted `""`.
  *  - timestamps carry micros + zone; doubles round-trip via Spark's
  *    shortest-exact formatting on both paths.
  *  - readers take the EXPLICIT parquet schema — no inference scan
  *    (inference reads the whole input once at 100 TB) and no silent
  *    type drift; `FAILFAST` surfaces malformed rows instead of
  *    nulling them.
  *
  * Csv caveats (documented, not hidden):
  *  - with the default `multiLine=false` the reader splits files on
  *    raw newlines, so embedded newlines in quoted fields break row
  *    framing. Pass `multiLine = true` to read such data — that makes
  *    each FILE one split, the honest trade-off.
  *  - a string whose ENTIRE value is the two-char sentinel `\N` reads
  *    back as NULL: the reader compares nullValue after unquoting, so
  *    no quoting strategy can preserve it, and any other sentinel has
  *    the same hole for its own literal. Inherent to sentinel-null
  *    csv (pinned by TableIOSpec).
  * Json has neither limit and is the recommended text-bearing format. */
object TableIO {
  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private val csvOpts = Map(
    "header" -> "true",
    "escape" -> "\"",
    "nullValue" -> "\\N",
    "timestampFormat" -> TsFmt)

  def writeCsv(df: DataFrame, path: String): Unit =
    // emptyValue writes "" as a QUOTED empty field, distinct from the
    // \N null marker (write-side option; the reader maps a quoted
    // empty field back to "" via its own emptyValue default).
    // ignore*WhiteSpace default to TRUE on the WRITE side only —
    // leaving them would silently trim edge whitespace from every
    // string field before it ever reaches the file.
    df.write.mode("overwrite").options(csvOpts)
      .option("emptyValue", "\"\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema).options(csvOpts)
      .option("emptyValue", "")
      .option("multiLine", multiLine.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("timestampFormat", TsFmt).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .option("mode", "FAILFAST")
      .json(path)
}
