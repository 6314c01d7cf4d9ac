package graft.operators

import org.apache.spark.sql.DataFrame

/** Sidecar tables for DuckDB oracles of model-derived queries.
  *
  * The ANN b-rows compute over model state (k-means centroids, RaBitQ
  * codes/factors, search-result lists) that no SQL can re-derive from
  * the input tables alone. To put their ARITHMETIC under the driver's
  * hash gate anyway, the queries persist the minimal model-derived
  * inputs here (tiny: centroids, one cluster's codes, Q×k result ids)
  * and the oracle SQL recomputes the argmin / estimator algebra /
  * recall / ratio from these tables plus `embeddings` — the oracle
  * certifies the kernel math, while the persisted inputs pin exactly
  * what the kernel consumed.
  *
  * Writes happen ONLY under `graft.Verify` (which sets the system
  * property): specs and benchmarks run the same queries without the
  * extra write jobs, and the DuckDB compare always reads sidecars
  * produced by the very Verify run it is checking. The path is
  * absolute so the oracle SQL (static strings) can name it.
  */
object OracleSide {
  /** Absolute sidecar root — referenced verbatim by oracle SQL.
    * Derived from the sbt/driver working directory (the repo root) so
    * a checkout located elsewhere writes and reads inside ITSELF
    * rather than colliding on a baked-in path; overridable via the
    * `graft.oracle.side.dir` system property for harnesses that run
    * Verify from a different cwd. The oracle SQL strings are built at
    * runtime from this value, so writer and reader always agree. */
  val Dir: String = sys.props.getOrElse("graft.oracle.side.dir",
    s"${sys.props("user.dir")}/results/oracle_side")

  /** Set by [[graft.Verify]]; never set by specs or Bench. */
  def enabled: Boolean = sys.props.get("graft.oracle.side").contains("1")

  /** DuckDB FROM-clause for a sidecar table. */
  def sql(name: String): String = s"'$Dir/$name/*.parquet'"

  /** Persist `df` as the sidecar `name` iff enabled (single file —
    * these tables are model-sized by contract: at most a few hundred
    * rows for the ANN sidecars, and bounded by the hashed feature
    * space for the classifier weights — c43's nonzero multinomial
    * matrix is the largest at ≤ 6·4096 rows, ~200 KB). */
  def write(df: DataFrame, name: String): Unit =
    if (enabled)
      df.coalesce(1).write.mode("overwrite").parquet(s"$Dir/$name")
}
