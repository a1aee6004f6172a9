package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static helpers the generated code calls: tight primitive loops over
  * two long-array columns, no per-element boxing. */
object GraftVec {
  // ArrayData.getLong on a null slot returns an undefined value; the
  // contract is null-free quantized vectors, so a null element is a bug in
  // the caller — fail loudly instead of folding garbage into the sum.
  private def nullElement(op: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$op: null element at index $i — inputs must be null-free quantized vectors")

  // A dims mismatch is a caller bug (the engine's quantized vectors and
  // centroids are all dims-length); truncating to the shorter input would
  // return a plausible-looking partial sum where the composed
  // zip_with/aggregate form these kernels replace would NULL-poison the
  // result — fail loudly instead.
  private def lenMismatch(op: String, na: Int, nb: Int): Nothing =
    throw new IllegalArgumentException(
      s"$op: input length mismatch ($na vs $nb) — vectors must share dims")

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) lenMismatch("dot_long", n, b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("dot_long", i)
      s += a.getLong(i) * b.getLong(i); i += 1
    }
    s
  }

  def dist2(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) lenMismatch("dist2_long", n, b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("dist2_long", i)
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Σ (n·xᵢ − sᵢ)² with an unsigned 128-bit accumulator, returned as
    * DECIMAL(38,0): the nl²-scaled exact distance of a member vector to
    * a label centroid s/n without materializing per-dimension rows. The
    * per-term square (≤ ~2¹²⁶) uses multiplyHigh; n·x uses multiplyExact
    * so an input outside the documented range fails loudly. Bit-identical
    * to the per-(key, dim) DECIMAL aggregation it replaces — both are
    * the same exact integer. */
  def nscaledDist2(x: ArrayData, s: ArrayData, n: Long): org.apache.spark.sql.types.Decimal = {
    val len = x.numElements()
    if (len != s.numElements()) lenMismatch("nscaled_dist2", len, s.numElements())
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < len) {
      if (x.isNullAt(i) || s.isNullAt(i)) nullElement("nscaled_dist2", i)
      val t = Math.subtractExact(
        Math.multiplyExact(n, x.getLong(i)), s.getLong(i))
      val tlo = t * t
      val thi = Math.multiplyHigh(t, t) // t² ≥ 0 and < 2¹²⁶: hi word exact
      val nlo = lo + tlo
      hi = Math.addExact(hi,
        thi + (if (java.lang.Long.compareUnsigned(nlo, lo) < 0) 1L else 0L))
      lo = nlo
      i += 1
    }
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    val d = org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi))
    if (!d.changePrecision(38, 0))
      throw new ArithmeticException(
        "nscaled_dist2: result exceeds DECIMAL(38,0)")
    d
  }

  /** Σ (aᵢ−mᵢ)² for an int64 vector against a float64 centroid — the
    * IEEE fold runs in strict index order, bit-identical to the composed
    * `aggregate(zip_with(a, m, (x, c) => (x−c)²), 0.0, +)` it replaces. */
  def dist2d(a: ArrayData, m: ArrayData): Double = {
    val n = a.numElements()
    if (n != m.numElements()) lenMismatch("dist2_ld", n, m.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || m.isNullAt(i)) nullElement("dist2_ld", i)
      val d = a.getLong(i).toDouble - m.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Base for fused long-vector kernels over `ArrayType(LongType)` columns.
  *
  * Exists per the custom-operator preference order (SURVEY §7.3): the
  * composed built-in form `aggregate(zip_with(a, b, ...), 0L, ...)` runs
  * the lambda INTERPRETED per element (higher-order functions don't join
  * whole-stage codegen and box every element); these expressions compile
  * to one static-call primitive loop inside the generated code. Used by
  * every similarity-search operator (brute-force/LSH/IVF ANN) on the
  * int64-quantized embedding arrays — candidates × 64 evaluations per
  * query batch. Inputs are the engine's quantized vectors: equal-length,
  * null-free (see VectorOps.quantized). A length mismatch or a null
  * ELEMENT violates that contract and raises IllegalArgumentException —
  * truncating to the shorter input would return a plausible partial
  * distance, and ArrayData.getLong on a null slot would silently yield
  * an undefined long, where the composed zip_with/aggregate form these
  * kernels replace NULL-poisons instead.
  */
sealed abstract class LongVecKernel extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == ArrayType(LongType, containsNull = true)) {
      if (right.dataType.isInstanceOf[ArrayType] &&
          right.dataType.asInstanceOf[ArrayType].elementType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> inputs, got ${right.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got ${left.dataType.simpleString}")
}

/** Σ aᵢ·bᵢ over two int64 arrays (exact; caller guarantees range). */
case class DotLong(left: Expression, right: Expression) extends LongVecKernel {
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLong = copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two int64 arrays (exact squared L2 distance). */
case class Dist2Long(left: Expression, right: Expression) extends LongVecKernel {
  override def prettyName: String = "dist2_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.dist2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Dist2Long = copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−mᵢ)² of an ARRAY<BIGINT> vector against an ARRAY<DOUBLE>
  * centroid (k-means assignment hot path: vectors × centroids
  * evaluations per Lloyd round). */
case class Dist2LongDouble(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "dist2_ld"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<DOUBLE>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dist2d(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.dist2d($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Dist2LongDouble =
    copy(left = newLeft, right = newRight)
}

/** nl²-scaled exact squared distance of an int64 member vector to a
  * label centroid given as (component-sum array, member count):
  * Σ (n·xᵢ − sᵢ)² as DECIMAL(38,0), 128-bit accumulation inside — one
  * kernel eval per (vector, label) pair replaces a dims-fold exploded
  * join + per-pair DECIMAL aggregation (nearest-centroid QA hot path). */
case class NScaledDist2(first: Expression, second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.types.{DecimalType, LongType => LT}

  override def prettyName: String = "nscaled_dist2"
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LT, _), ArrayType(LT, _), LT) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>, BIGINT), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def nullSafeEval(x: Any, s: Any, n: Any): Any =
    GraftVec.nscaledDist2(x.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, s, n) => s"graft.functions.GraftVec.nscaledDist2($x, $s, $n)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): NScaledDist2 = copy(first = f, second = s, third = t)
}

object LongVec {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  def dist2(a: Column, b: Column): Column =
    GraftBridge.column(Dist2Long(GraftBridge.expression(a), GraftBridge.expression(b)))

  def dist2d(a: Column, m: Column): Column =
    GraftBridge.column(Dist2LongDouble(GraftBridge.expression(a), GraftBridge.expression(m)))

  def nscaledDist2(x: Column, s: Column, n: Column): Column =
    GraftBridge.column(NScaledDist2(GraftBridge.expression(x),
      GraftBridge.expression(s), GraftBridge.expression(n)))
}
