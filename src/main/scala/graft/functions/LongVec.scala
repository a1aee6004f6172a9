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

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("dot_long", i)
      s += a.getLong(i) * b.getLong(i); i += 1
    }
    s
  }

  def dist2(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
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

  /** Σ (aᵢ−mᵢ)² for an int64 vector against a float64 centroid — the
    * IEEE fold runs in strict index order, bit-identical to the composed
    * `aggregate(zip_with(a, m, (x, c) => (x−c)²), 0.0, +)` it replaces. */
  def dist2d(a: ArrayData, m: ArrayData): Double = {
    val n = math.min(a.numElements(), m.numElements())
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
  * null-free (see VectorOps.quantized); like the composed form with such
  * inputs, extra elements past the shorter length are ignored. A null
  * ELEMENT violates that contract and raises IllegalArgumentException
  * (ArrayData.getLong on a null slot would otherwise silently yield an
  * undefined long).
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

object LongVec {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  def dist2(a: Column, b: Column): Column =
    GraftBridge.column(Dist2Long(GraftBridge.expression(a), GraftBridge.expression(b)))

  def dist2d(a: Column, m: Column): Column =
    GraftBridge.column(Dist2LongDouble(GraftBridge.expression(a), GraftBridge.expression(m)))
}
