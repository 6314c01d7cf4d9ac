package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  * functions for oracle parity. Policy also matches DuckDB: mismatched
  * lengths raise, a null element makes the result null.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  // lazy vals: the interpreted eval path reads these per ELEMENT per
  // row (the VecSum rule) — re-deriving dataType's pattern match there
  // is 2d matches per row for nothing
  private lazy val leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** Java snippet reading element `idx` of array variable `v` as double. */
  protected def getter(v: String, leftSide: Boolean, idx: String): String =
    if (if (leftSide) leftIsFloat else rightIsFloat) s"(double) $v.getFloat($idx)"
    else s"$v.getDouble($idx)"
  protected def getD(v: ArrayData, leftSide: Boolean, i: Int): Double =
    if (if (leftSide) leftIsFloat else rightIsFloat) v.getFloat(i).toDouble
    else v.getDouble(i)

  protected def checkLengths(x: ArrayData, y: ArrayData): Unit =
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector lengths differ (${x.numElements()} vs ${y.numElements()})")

  /** Shared accumulate loop: `combine` folds (a_i, b_i) into the sum.
    * Returns null if any element is null (DuckDB list-function policy). */
  protected def evalLoop(a: Any, b: Any)(combine: (Double, Double) => Double): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    checkLengths(x, y)
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += combine(getD(x, leftSide = true, i), getD(y, leftSide = false, i))
      i += 1
    }
    s
  }

  /** Shared codegen: emits the length check, null-element handling and
    * accumulation; `combineJava(a, b)` is the Java expression added to
    * the accumulator. The element getters are hoisted into locals so a
    * combine that uses each operand twice (l2sq's (a-b)·(a-b)) still
    * pays exactly two polymorphic ArrayData accessor calls per element
    * — the call sites see UnsafeArrayData, GenericArrayData AND
    * ColumnarArray, so the JIT cannot be trusted to devirtualize+CSE
    * them on the hottest per-row loop in the library. */
  protected def genLoop(ctx: CodegenContext, ev: ExprCode)(
      combineJava: (String, String) => String): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector lengths differ (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $va = ${getter(x, leftSide = true, i)};
         |  double $vb = ${getter(y, leftSide = false, i)};
         |  $s += ${combineJava(va, vb)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Squared L2 distance between two vectors. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalLoop(a, b)((u, v) => { val d = u - v; d * d })
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genLoop(ctx, ev)((u, v) => s"(($u) - ($v)) * (($u) - ($v))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product between two vectors. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalLoop(a, b)((u, v) => u * v)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genLoop(ctx, ev)((u, v) => s"($u) * ($v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2-normalize a vector to unit length. Zero vectors pass through
  * unchanged (no 0/0, no NaNs); a null element nulls the result. The
  * norm is computed ONCE per row — an ArrayTransform-lambda
  * formulation re-evaluates the norm expression per element, turning
  * the corpus-prep pass O(d²) per row. Output element type matches
  * the input (float stays float, double stays double), so both If
  * branches and SQL double-array literals type-check. Reference role:
  * python/utils/preprocess.py:1-5. */
case class VecNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  override def prettyName: String = "vec_normalize"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${t.catalogString}")
  }
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    if (s == 0.0) return x
    val inv = 1.0 / math.sqrt(s)
    if (elemIsFloat) {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (x.getFloat(i) * inv).toFloat; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) * inv; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val v = ctx.freshName("v"); val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      val jt = if (elemIsFloat) "float" else "double"
      def get(idx: String) =
        if (elemIsFloat) s"(double) $x.getFloat($idx)" else s"$x.getDouble($idx)"
      val cast = if (elemIsFloat) "(float)" else ""
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = ${get(i)};
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  if ($s == 0.0) {
         |    ${ev.value} = $x;
         |  } else {
         |    double $inv = 1.0 / Math.sqrt($s);
         |    $jt[] $out = new $jt[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $out[$j] = $cast(${get(j)} * $inv);
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sum of a vector's elements (sequential double accumulation, the
  * codegen replacement for the interpreted `aggregate()` HOF). */
case class VecSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "vec_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${t.catalogString}")
  }
  // lazy val: the interpreted eval reads this per element
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      s += (if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val get = if (elemIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $get;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, If, Literal, Multiply, Sqrt}

  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def ex(c: Column): Expression = GraftColumnBridge.expression(c)

  // Expression-level compositions — the single definition behind BOTH
  // the Column API below and the SQL registration in GraftFunctions,
  // so the two surfaces cannot drift.
  private[functions] def l2Expr(a: Expression, b: Expression): Expression =
    Sqrt(VecL2Sq(a, b))
  private[functions] def normExpr(a: Expression): Expression =
    Sqrt(VecDot(a, a))
  /** Cosine with a zero-norm guard: Spark 4's default ANSI mode makes
    * a bare Divide THROW on a 0.0 divisor (all-zero vectors — padding
    * rows, failed encoders), so the degenerate case yields null
    * instead of killing the query. */
  private[functions] def cosineExpr(a: Expression, b: Expression): Expression = {
    val denom = Multiply(normExpr(a), normExpr(b))
    If(EqualTo(denom, Literal(0.0)),
      Literal.create(null, DoubleType),
      Divide(VecDot(a, b), denom))
  }

  /** L2-normalization as a raw expression — shared by the Column API
    * and the SQL registration (see [[VecNormalize]]). */
  private[functions] def normalizeExpr(a: Expression): Expression = VecNormalize(a)

  /** Element sum (codegen; replaces the interpreted aggregate() HOF). */
  def vec_sum(a: Column): Column = col(VecSum(ex(a)))

  /** Squared L2 distance (space.hpp L2Sqr). */
  def vec_l2sq(a: Column, b: Column): Column = col(VecL2Sq(ex(a), ex(b)))
  /** L2 distance. */
  def vec_l2(a: Column, b: Column): Column = col(l2Expr(ex(a), ex(b)))
  /** Inner product (space.hpp IP). */
  def vec_dot(a: Column, b: Column): Column = col(VecDot(ex(a), ex(b)))
  /** L2 norm. */
  def vec_norm(a: Column): Column = col(normExpr(ex(a)))
  /** Cosine similarity (null for zero-norm inputs, see [[cosineExpr]]). */
  def vec_cosine(a: Column, b: Column): Column = col(cosineExpr(ex(a), ex(b)))
  /** L2-normalize a float vector to unit length (see [[normalizeExpr]]). */
  def vec_normalize(a: Column): Column = col(normalizeExpr(ex(a)))
  /** Zero-pad a float vector so its length is a multiple of `m`
    * (reference pads to a multiple of 64, IVF.hpp:96). */
  def vec_pad(a: Column, m: Int): Column = {
    val padCount = (lit(m) - size(a) % lit(m)) % lit(m)
    concat(a, array_repeat(lit(0.0f), padCount))
  }
  /** Scalar Java kernels, for typed/mapPartitions paths. Both sides
    * must have the same length — enforced loudly, matching the SQL
    * expressions' policy: a silent min-length truncation would turn a
    * missed padding step into a partial distance that only surfaces
    * as mysteriously bad recall. */
  def l2sq(a: Array[Float], b: Array[Float]): Double = {
    val n = requireSameDim(a, b, "l2sq")
    var s = 0.0; var i = 0
    while (i < n) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }
  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = requireSameDim(a, b, "dot")
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  private def requireSameDim(
      a: Array[Float], b: Array[Float], name: String): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"$name: vector lengths differ (${a.length} vs ${b.length})")
    a.length
  }
}
