package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ann.KnnExact
import graft.functions.VectorFunctions._

/** Vector-primitive queries (SURVEY.md §2 A) + exact ground-truth
  * top-k (b1). Oracle parity: distances accumulate in double,
  * rounded to 6 decimals; ids/ranks are integral. */
object VectorQueries {
  /** Consecutive-id embedding pairs — a small deterministic pair set. */
  private def pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_b") === col("id_a") + 1)
  }

  /** a1: L2 distance between consecutive embedding pairs. */
  def vecL2(spark: SparkSession, dir: String): DataFrame =
    pairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        round(vec_l2(col("va"), col("vb")), 6).as("l2"))
      .orderBy("id_a")

  /** a2: inner product between consecutive embedding pairs. */
  def vecDot(spark: SparkSession, dir: String): DataFrame =
    pairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        round(vec_dot(col("va"), col("vb")), 6).as("dot"))
      .orderBy("id_a")

  /** a3: cosine similarity between consecutive embedding pairs. */
  def vecCosine(spark: SparkSession, dir: String): DataFrame =
    pairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        round(vec_cosine(col("va"), col("vb")), 6).as("cos"))
      .orderBy("id_a")

  /** a4: per-vector L2 norm + dimensionality. */
  def vecNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(vec_norm(col("embedding")), 6).as("norm"))
      .orderBy("vec_id")

  /** a5: zero-pad vectors to a multiple of 96 (reference pads to a
    * multiple of 64, IVF.hpp:96; 96 exercises a non-trivial pad for
    * our 64-dim vectors). Checksum proves content is preserved and
    * the tail is zero. */
  def vecPad(spark: SparkSession, dir: String): DataFrame = {
    val padded = vec_pad(col("embedding"), 96)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(padded).as("padded_dim"),
        // vec_sum: codegen'd; the aggregate() HOF evaluates interpreted
        round(vec_sum(padded), 6).as("checksum"),
        padded.getItem(80).cast(DoubleType).as("tail_elem"))
      .orderBy("vec_id")
  }

  /** a6: seeded orthonormal rotation applied to every embedding
    * (Rotator.hpp surface). Hash-certified (r13): the rotation matrix
    * rows persist as a sidecar (widened to double — exact), and the
    * oracle recomputes every output in SQL: the mat-vec with in-order
    * double accumulation + the float cast (Rotator.rotate's exact IEEE
    * chain, Rotator.hpp:58-62's algebra), both norms, and the first
    * rotated element. Only the matrix CONSTRUCTION (seeded
    * Gram-Schmidt) is pinned input — its orthonormality/seed contract
    * stays spec-pinned (PropertySpec). */
  def vecRotate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val rot = new graft.ann.Rotator(dim, seed = 42L)
    if (OracleSide.enabled)
      OracleSide.write(
        rot.matrix.zipWithIndex
          .map { case (r, i) => (i, r.map(_.toDouble).toSeq) }.toSeq
          .toDF("row_idx", "row"),
        "a6_rotation")
    val bc = spark.sparkContext.broadcast(rot)
    e.select(col("vec_id").cast(LongType), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val r = bc.value
        iter.map { case (id, v) =>
          val rv = r.rotate(v)
          (id, rv.length,
            math.sqrt(graft.functions.VectorFunctions.dot(v, v)),
            math.sqrt(graft.functions.VectorFunctions.dot(rv, rv)),
            rv(0).toDouble)
        }
      }
      .toDF("vec_id", "rotated_dim", "norm_before", "norm_after", "rot_elem0")
      .select(col("vec_id"), col("rotated_dim"),
        round(col("norm_before"), 4).as("norm_before"),
        round(col("norm_after"), 4).as("norm_after"),
        round(col("rot_elem0"), 4).as("rot_elem0"))
      .orderBy("vec_id")
  }

  /** THE query workload for b1/b7/b8/b10: the first `n` embeddings.
    * Single source of truth — all search/metric queries must agree on
    * this set for recall/ratio parity. */
  /** The query-workload size shared by every b-row: the filter bound
    * that splits queries (vec_id < QueryN) from the base set
    * (vec_id >= QueryN), threaded through queryVectors, gtTopK, and
    * every oracle string — one constant, so query set and base set
    * can never silently desynchronize. */
  val QueryN = 8

  def queryVectors(spark: SparkSession, dir: String, n: Int = QueryN): Array[(Long, Array[Float])] =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < n)
      .select(col("vec_id").cast(LongType), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** b1: exact ground-truth top-10 — queries are embeddings with
    * vec_id < 8, base is the rest (compute_gt.py equivalent). */
  def gtTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    KnnExact.topK(spark, e.filter(col("vec_id") >= QueryN), queryVectors(spark, dir), k = 10)
      .orderBy("query_id", "rk")
  }

  /** Exact top-10 for the same 8 queries against the FULL base
    * (including the query vectors), used as ground truth by b8. */
  def gtTopKAll(spark: SparkSession, dir: String): DataFrame =
    KnnExact.topK(spark, Tables.embeddings(spark, dir), queryVectors(spark, dir), k = 10)

  val oracles: Map[String, String] = Map(
    // mirrors Rotator.rotate over the persisted matrix rows: each
    // output element is an in-order double inner product cast to float
    // (CAST AS REAL) and widened back; norm_after accumulates the
    // squared floats IN ROW ORDER (list ORDER BY row_idx — the same
    // trailing IEEE chain as VectorFunctions.dot). dim == paddedDim
    // (64) for these tables, so no pad arm is needed.
    "a6_vec_rotate" ->
      s"""WITH r AS (SELECT row_idx, row FROM ${OracleSide.sql("a6_rotation")}),
        |e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |rv AS (
        |  SELECT e.vec_id, r.row_idx,
        |    CAST(CAST(list_inner_product(r.row, e.v) AS REAL) AS DOUBLE) AS y
        |  FROM e CROSS JOIN r),
        |agg AS (
        |  SELECT vec_id, list(y ORDER BY row_idx) AS ys FROM rv GROUP BY vec_id)
        |SELECT e.vec_id, CAST(len(a.ys) AS INT) AS rotated_dim,
        |  ROUND(SQRT(list_sum(list_transform(e.v, x -> x*x))), 4) AS norm_before,
        |  ROUND(SQRT(list_sum(list_transform(a.ys, x -> x*x))), 4) AS norm_after,
        |  ROUND(a.ys[1], 4) AS rot_elem0
        |FROM e JOIN agg a USING (vec_id) ORDER BY vec_id""".stripMargin,
    "a1_vec_l2" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | ROUND(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS l2
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY id_a""".stripMargin,
    "a2_vec_dot" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY id_a""".stripMargin,
    "a3_vec_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY id_a""".stripMargin,
    "a4_vec_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        | ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // dim-generic: padded_dim = ceil(dim/96)*96 and the probed tail
    // element is the REAL component when dim > 80 — a testdata regen
    // at another dim shifts both sides together instead of failing the
    // hash as a phantom vector-kernel bug
    "a5_vec_pad" ->
      """SELECT vec_id,
        | CAST(((len(embedding) + 95) // 96) * 96 AS INT) AS padded_dim,
        | ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS checksum,
        | CASE WHEN len(embedding) >= 81 THEN CAST(embedding[81] AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS tail_elem
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // rank by the PRE-sqrt squared distance — KnnExact.topK's exact
    // key: sqrt can collapse two adjacent d² doubles into one value
    // and flip the id tie-break at the cut
    "b1_gt_topk" ->
      s"""SELECT query_id, neighbor_id, CAST(rk AS INT) AS rk FROM (
        | SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_sum(list_transform(
        |        list_zip(CAST(q.embedding AS DOUBLE[]),
        |                 CAST(b.embedding AS DOUBLE[])),
        |        x -> (x[1]-x[2])*(x[1]-x[2]))), b.vec_id) AS rk
        | FROM embeddings q, embeddings b
        | WHERE q.vec_id < $QueryN AND b.vec_id >= $QueryN) t
        |WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,
  )
}
