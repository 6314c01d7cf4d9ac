package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.VecL2Sq

/** Catalyst optimizer rule: algebraic simplification of graft's vector
  * expressions. `vec_l2sq(x, x)` is identically 0 for any non-null x —
  * the O(D) loop is replaced by a null-preserving constant, letting
  * downstream constant folding eliminate whole predicates (e.g. a
  * self-join distance filter `vec_l2sq(v, v) < eps` becomes `true`).
  *
  * Demonstrates the extension seam for deeper rewrites (e.g. pushing a
  * distance-threshold filter below a join). Registered either via
  * `GraftExtensions` at session build, or injected into a live session
  * with [[SimplifyVectorExpressions.install]].
  */
object SimplifyVectorExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VecL2Sq(l, r) if l.deterministic && l.semanticEquals(r) =>
        If(IsNull(l), Literal(null, DoubleType), Literal(0.0))
    }

  /** Add the rule to an already-running session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
