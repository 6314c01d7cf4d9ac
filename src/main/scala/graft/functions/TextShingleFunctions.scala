package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle + Bloom-position kernels (SURVEY.md §2 C; the
  * c17/c39/d14 hot path).
  *
  * The declarative formulation — split → sequence → transform(slice →
  * concat_ws) → array_distinct — is semantically right but runs the
  * higher-order lambdas INTERPRETED per array element (Spark evaluates
  * HOF lambdas outside whole-stage codegen), and the round-13 profile
  * showed it dominating c39 (1.7 s of a 3.2 s query at sf0.1, shared
  * with c17). These native expressions produce the same values in one
  * byte-level pass and stay inside codegen via a static kernel call.
  *
  * Exactness contracts (the oracle hashes depend on them):
  *  - [[DistinctShingles]] ≡ `when(size(t) >= k, array_distinct(
  *    transform(sequence(1, size(t)-k+1), i -> concat_ws(" ",
  *    slice(t, i, k))))).otherwise(array())` with
  *    `t = split(text, " ")` (limit −1: trailing empty tokens KEPT).
  *    Because every token gap is exactly one space byte, the joined
  *    k-gram equals the byte substring from token i's start to token
  *    i+k−1's end — no per-element array is ever built. Distinctness
  *    keeps first-occurrence order (array_distinct's rule). NULL text
  *    → empty array (the `otherwise` branch), matching the SQL form.
  *  - [[Md5SlicePositions]] ≡ `array((conv(substring(md5(s), 1+4i,
  *    4), 16, 10) :: int % width) + i·width·strided, i < hashes)` —
  *    consecutive 16-bit big-endian md5 slices, computed from the raw
  *    digest bytes (byte pair (2i, 2i+1)) without materializing the
  *    hex string. Bloom (c39/d14): width 2¹⁶, unstrided; CMS
  *    (c41/d15): width CmsWidth, strided rows. NULL in → NULL out
  *    (md5's rule) — deliberately NOT the old projection's
  *    array-of-NULLs shape; every call site filters nulls upstream,
  *    and ShingleExprSpec pins both the non-null equivalence and this
  *    boundary difference.
  */
object TextKernels {
  private val md5Local =
    java.lang.ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Distinct k-gram shingles of `text` (space-delimited tokens,
    * trailing empties kept), first-occurrence order; empty array for
    * null/short text. Byte-level: UTF-8 guarantees 0x20 never occurs
    * inside a multi-byte sequence, so token boundaries are space
    * BYTES and each shingle is one byte-slice of the input. */
  def distinctShingles(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return Empty
    val bytes = text.getBytes
    val n = bytes.length
    // token start offsets: 0 and every byte after a space
    var tokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    if (tokens < k) return Empty
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = n + 1 // sentinel: end of token j is starts(j+1)-1
    val nSh = tokens - k + 1
    val seen = new java.util.HashSet[UTF8String](nSh * 2)
    val out = new java.util.ArrayList[AnyRef](nSh)
    var s = 0
    while (s < nSh) {
      val from = starts(s)
      val until = starts(s + k) - 1 // end of token s+k-1
      val sh = UTF8String.fromBytes(bytes, from, until - from)
      if (seen.add(sh)) out.add(sh)
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The `hashes` 16-bit md5-slice positions of one string, straight
    * from the digest bytes (the hex-slice semantics without the hex):
    * slice_i = bytes (2i, 2i+1) big-endian; position_i =
    * (slice_i % width) + i·width·(strided ? 1 : 0). Bloom (c39/d14)
    * uses width = 2¹⁶, strided = false (the mod is a no-op); CMS
    * (c41/d15) uses width = CmsWidth, strided = true (each hash lands
    * in its own row of the flattened matrix). */
  def md5Positions(
      s: UTF8String, hashes: Int, width: Int, strided: Boolean): ArrayData = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Int](hashes)
    var i = 0
    while (i < hashes) {
      val slice = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
      out(i) = slice % width + (if (strided) i * width else 0)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** See [[TextKernels.distinctShingles]]. Never null (empty array for
  * null text — the SQL `otherwise(array())` branch). */
case class DistinctShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def prettyName: String = "text_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.distinctShingles(
      child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // The object's class is `graft.functions.TextKernels$` and MODULE$
    // lives on THAT class — stripping the `$` would reference the mirror
    // class, which has no MODULE$ field, and Janino would reject the
    // generated code (silently de-codegen-ing the whole stage via the
    // fallback). CodegenSpec pins compilation with fallback disabled.
    val kernel = TextKernels.getClass.getName + ".MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.distinctShingles(${c.isNull} ? null : ${c.value}, $k);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** See [[TextKernels.md5Positions]]. Null in → null out. */
case class Md5SlicePositions(
    child: Expression, hashes: Int, width: Int, strided: Boolean)
    extends UnaryExpression {
  require(hashes >= 1 && hashes <= 8,
    s"md5 yields at most 8 16-bit slices, got $hashes")
  require(width >= 1 && width <= 65536,
    s"width must be in [1, 65536], got $width")
  override def prettyName: String = "md5_slice_positions"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.md5Positions(s.asInstanceOf[UTF8String], hashes, width, strided)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // See DistinctShingles.doGenCode: the MODULE$ field is on the
    // `TextKernels$` class itself, so the `$` must be kept.
    val kernel = TextKernels.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $kernel.md5Positions($s, $hashes, $width, $strided);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextShingleFunctions {
  /** Column of distinct k-gram shingles of `text` (the c17/c39 shared
    * shingle definition, single-pass form). */
  def textShingles(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      DistinctShingles(GraftColumnBridge.expression(text), k))

  /** Column of the `hashes` 16-bit md5-slice Bloom positions
    * (width 2¹⁶, unstrided). */
  def bloomPositionsCol(s: Column, hashes: Int): Column =
    GraftColumnBridge.column(Md5SlicePositions(
      GraftColumnBridge.expression(s), hashes, 65536, strided = false))

  /** Column of the CMS flattened-matrix positions: row i's cell is
    * (slice_i % width) + i·width. */
  def cmsPositionsCol(s: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(Md5SlicePositions(
      GraftColumnBridge.expression(s), depth, width, strided = true))
}
