package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT vec_l2sq(a, b) ...")` works alongside the Column
  * API. Register per-session with [[GraftFunctions.register]], or
  * globally via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("vec_l2sq", es => VecL2Sq(es(0), es(1)), "squared L2 distance between two vectors"),
    ("vec_dot", es => VecDot(es(0), es(1)), "inner product of two vectors"),
    ("vec_sum", es => VecSum(es(0)), "sum of a vector's elements"),
    ("vec_l2", es => Sqrt(VecL2Sq(es(0), es(1))), "L2 distance between two vectors"),
    ("vec_norm", es => Sqrt(VecDot(es(0), es(0))), "L2 norm of a vector"),
    ("vec_cosine", es => Divide(VecDot(es(0), es(1)),
      Multiply(Sqrt(VecDot(es(0), es(0))), Sqrt(VecDot(es(1), es(1))))),
      "cosine similarity of two vectors"))

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
