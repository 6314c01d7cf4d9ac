package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VecL2Sq

/** Catalyst optimizer rule: eliminate the per-row sqrt when a vector
  * L2 distance is only compared against a non-negative finite
  * constant. The rewrite is EXACTLY value-preserving, not merely
  * algebraic: `sqrt(v) < c ⇔ v < c²` holds over the reals but is off
  * by 1 ulp in doubles whenever c² is not representable (fl(c·c)
  * rounds up and sqrt(fl(c·c)) rounds back to exactly c — the
  * boundary row flips). Instead the rule computes, once at rewrite
  * time, the exact double threshold T = min{v : sqrt(v) ≥ c} (resp.
  * > c) by walking the few ulps around fl(c·c) — Math.sqrt is
  * correctly rounded and monotone, so {sqrt(v) < c} = {v < T}
  * exactly, for every double v. Installing the rule can therefore
  * never change a result row, which is the bar in a repo whose
  * outputs are certified row-exact against an oracle.
  *
  * NaN: vec_l2sq yields NaN only from NaN elements; sqrt(NaN) = NaN,
  * and Spark's comparison ordering places NaN above every double on
  * BOTH the original and rewritten predicate (same side of every
  * threshold), so NaN rows keep their pre-rewrite behavior in all
  * eight shapes. NULL propagates identically. Infinite c is left
  * un-rewritten (no finite threshold exists for the strict shapes).
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
      case Literal(d: Double, org.apache.spark.sql.types.DoubleType)
        if d >= 0 && !d.isInfinity => Some(d)
      case _ => None
    }
  }
  private object SqrtOfL2Sq {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(v: VecL2Sq) => Some(v)
      case _ => None
    }
  }

  /** Smallest double v ≥ 0 with sqrt(v) ≥ c (`strict = false`) or
    * sqrt(v) > c (`strict = true`). The boundary sits within a few
    * ulps of fl(c·c) (Math.sqrt is correctly rounded), so the walk
    * terminates in O(1); c must be finite and ≥ 0. */
  private[graft] def sqrtThreshold(c: Double, strict: Boolean): Double = {
    def ok(x: Double) = if (strict) Math.sqrt(x) > c else Math.sqrt(x) >= c
    var v = c * c
    while (!ok(v)) v = Math.nextUp(v)
    while (v > 0 && ok(Math.nextDown(v))) v = Math.nextDown(v)
    v
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // radius / near filters (distance below a constant):
      //   sqrt(v) <  c ⇔ v < T≥   (T≥ = min{v : sqrt(v) ≥ c})
      //   sqrt(v) ≤  c ⇔ v < T>   (T> = min{v : sqrt(v) > c})
      case LessThan(SqrtOfL2Sq(v), NonNegLit(c)) =>
        LessThan(v, Literal(sqrtThreshold(c, strict = false)))
      case LessThanOrEqual(SqrtOfL2Sq(v), NonNegLit(c)) =>
        LessThan(v, Literal(sqrtThreshold(c, strict = true)))
      case GreaterThan(NonNegLit(c), SqrtOfL2Sq(v)) =>
        GreaterThan(Literal(sqrtThreshold(c, strict = false)), v)
      case GreaterThanOrEqual(NonNegLit(c), SqrtOfL2Sq(v)) =>
        GreaterThan(Literal(sqrtThreshold(c, strict = true)), v)
      // far / outlier filters (distance above a constant) — the mirror
      // image (diversity sampling, contamination distance gates):
      //   sqrt(v) >  c ⇔ v ≥ T>
      //   sqrt(v) ≥  c ⇔ v ≥ T≥
      case GreaterThan(SqrtOfL2Sq(v), NonNegLit(c)) =>
        GreaterThanOrEqual(v, Literal(sqrtThreshold(c, strict = true)))
      case GreaterThanOrEqual(SqrtOfL2Sq(v), NonNegLit(c)) =>
        GreaterThanOrEqual(v, Literal(sqrtThreshold(c, strict = false)))
      case LessThan(NonNegLit(c), SqrtOfL2Sq(v)) =>
        LessThanOrEqual(Literal(sqrtThreshold(c, strict = true)), v)
      case LessThanOrEqual(NonNegLit(c), SqrtOfL2Sq(v)) =>
        LessThanOrEqual(Literal(sqrtThreshold(c, strict = false)), v)
    }

  /** Add the rule to an already-running session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
