package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VecL2Sq

/** Catalyst optimizer rule: eliminate the per-row sqrt when a vector
  * L2 distance is only compared against a non-negative constant —
  * `sqrt(vec_l2sq(a,b)) < c` ⇔ `vec_l2sq(a,b) < c²` (monotonicity of
  * sqrt on [0, ∞); NaN inputs compare false on both sides, squared-c
  * overflow to +∞ preserves the comparison for all finite distances).
  * This is the common shape of a radius/near-dup filter, where the
  * sqrt is pure per-row overhead.
  *
  * Soundness note: an earlier draft folded `vec_l2sq(x, x)` to 0.0,
  * which is WRONG for arrays containing NULL or NaN elements (the
  * expression returns NULL / NaN there) — constant-folding
  * distance algebra over IEEE doubles needs this kind of care.
  *
  * Registered via `GraftExtensions`, or injected into a live session
  * with [[SimplifyVectorExpressions.install]].
  */
object SimplifyVectorExpressions extends Rule[LogicalPlan] {
  private object NonNegLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(d: Double, org.apache.spark.sql.types.DoubleType) if d >= 0 => Some(d)
      case _ => None
    }
  }
  private object SqrtOfL2Sq {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(v: VecL2Sq) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // radius / near filters (distance below a constant)
      case LessThan(SqrtOfL2Sq(v), NonNegLit(c))           => LessThan(v, Literal(c * c))
      case LessThanOrEqual(SqrtOfL2Sq(v), NonNegLit(c))    => LessThanOrEqual(v, Literal(c * c))
      case GreaterThan(NonNegLit(c), SqrtOfL2Sq(v))        => GreaterThan(Literal(c * c), v)
      case GreaterThanOrEqual(NonNegLit(c), SqrtOfL2Sq(v)) => GreaterThanOrEqual(Literal(c * c), v)
      // far / outlier filters (distance above a constant) — the mirror
      // image (diversity sampling, contamination distance gates); the
      // identical monotonicity argument applies
      case GreaterThan(SqrtOfL2Sq(v), NonNegLit(c))        => GreaterThan(v, Literal(c * c))
      case GreaterThanOrEqual(SqrtOfL2Sq(v), NonNegLit(c)) => GreaterThanOrEqual(v, Literal(c * c))
      case LessThan(NonNegLit(c), SqrtOfL2Sq(v))           => LessThan(Literal(c * c), v)
      case LessThanOrEqual(NonNegLit(c), SqrtOfL2Sq(v))    => LessThanOrEqual(Literal(c * c), v)
    }

  /** Add the rule to an already-running session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
