package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector primitives over `array<float>` / `array<double>` columns
  * (SURVEY.md §2 A; reference kernels: /root/reference/inc/utils/space.hpp
  * L2Sqr / inner product).
  *
  * These are native Catalyst expressions with `doGenCode`, so they stay
  * inside whole-stage codegen (no boxed UDF per row) — the Spark
  * analogue of the reference's SIMD kernels. Accumulation is in double
  * regardless of element type, sequentially, matching DuckDB's list
  * functions for oracle parity.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** Java snippet reading element i of array variable `v` as double. */
  protected def getter(v: String): String =
    if (elemIsFloat) s"(double) $v.getFloat(i)" else s"$v.getDouble(i)"
  protected def getD(v: ArrayData, i: Int): Double =
    if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

/** Squared L2 distance between two vectors. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = getD(x, i) - getD(y, i); s += d * d; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int i = 0; i < $n; i++) {
         |  double $d = ${getter(x)} - ${getter(y)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product between two vectors. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += getD(x, i) * getD(y, i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int i = 0; i < $n; i++) {
         |  $s += (${getter(x)}) * (${getter(y)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def ex(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Squared L2 distance (space.hpp L2Sqr). */
  def vec_l2sq(a: Column, b: Column): Column = col(VecL2Sq(ex(a), ex(b)))
  /** L2 distance. */
  def vec_l2(a: Column, b: Column): Column = sqrt(vec_l2sq(a, b))
  /** Inner product (space.hpp IP). */
  def vec_dot(a: Column, b: Column): Column = col(VecDot(ex(a), ex(b)))
  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))
  /** Cosine similarity. */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
  /** Zero-pad a float vector so its length is a multiple of `m`
    * (reference pads to a multiple of 64, IVF.hpp:96). */
  def vec_pad(a: Column, m: Int): Column = {
    val padCount = (lit(m) - size(a) % lit(m)) % lit(m)
    concat(a, array_repeat(lit(0.0f), padCount))
  }
  /** Scalar Java kernels, for typed/mapPartitions paths. */
  def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  def dotF(a: Array[Float], b: Array[Float]): Float = dot(a, b).toFloat
}
