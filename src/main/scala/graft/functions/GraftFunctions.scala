package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT vec_l2sq(a, b) ...")` works alongside the Column
  * API. Register per-session with [[GraftFunctions.register]], or
  * globally via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  /** Wrap a builder with an arity check, so `vec_norm(a, b)` fails the
    * query with a clear message instead of silently ignoring `b` (and
    * a missing argument doesn't surface as an index error). Thrown as
    * Spark's own WRONG_NUM_ARGS AnalysisException — a user error on
    * the analysis channel (JDBC/Thrift frontends classify it as such),
    * not an uncategorized IllegalArgumentException with a stack trace. */
  private def arity(n: Int, name: String)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        // the public AnalysisException(errorClass, params) constructor
        // (QueryCompilationErrors is private[sql]); docroot must be
        // supplied here — only Spark's internal error helpers fill it
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"),
          Option.empty[Throwable])
      b(es)
    }

  private val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("vec_l2sq", arity(2, "vec_l2sq")(es => VecL2Sq(es(0), es(1))),
      "squared L2 distance between two vectors"),
    ("vec_dot", arity(2, "vec_dot")(es => VecDot(es(0), es(1))),
      "inner product of two vectors"),
    ("vec_sum", arity(1, "vec_sum")(es => VecSum(es(0))),
      "sum of a vector's elements"),
    ("vec_l2", arity(2, "vec_l2")(es => VectorFunctions.l2Expr(es(0), es(1))),
      "L2 distance between two vectors"),
    ("vec_norm", arity(1, "vec_norm")(es => VectorFunctions.normExpr(es(0))),
      "L2 norm of a vector"),
    ("vec_cosine", arity(2, "vec_cosine")(es => VectorFunctions.cosineExpr(es(0), es(1))),
      "cosine similarity of two vectors (null for zero-norm inputs)"),
    ("vec_normalize", arity(1, "vec_normalize")(es =>
      VectorFunctions.normalizeExpr(es(0))),
      "L2-normalize a vector to unit length (zero vectors unchanged)"))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b, _) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  private[functions] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b, usage) =>
      // ExpressionInfo's 3-arg ctor is (className, db, name); the
      // usage text needs the extended ctor
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage,
          "", "", "", "", "", "", "built-in"),
        b)
    }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) to get the vector functions
  * in every session, including SQL-only clients. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.SimplifyVectorExpressions)
  }
}
