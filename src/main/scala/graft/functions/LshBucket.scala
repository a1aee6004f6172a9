package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Plane-matrix cache + kernel for [[LshBucket]]: random-hyperplane
  * components are md5-derived ints in [-1000, 1000] — EXACTLY the
  * engine's SQL/oracle derivation `h32("j,g") % 2001 - 1000` (see
  * VectorOps.lshBuckets' planes frame and LlmOps.planesCte) — computed
  * once per (nPlanes, dim) and shared; the per-row work is nPlanes
  * integer dot products over the vector. */
object LshPlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def planes(nPlanes: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      Array.tabulate(np, d)((j, g0) => h32(s"$j,${g0 + 1}") % 2001L - 1000L)
    })

  def bucket(v: ArrayData, nPlanes: Int, dim: Int): Long = {
    val p = planes(nPlanes, dim)
    val n = math.min(dim, v.numElements())
    var b = 0L
    var j = 0
    while (j < nPlanes) {
      val pj = p(j)
      var s = 0L
      var g = 0
      while (g < n) {
        if (v.isNullAt(g))
          throw new IllegalArgumentException(
            s"lsh_bucket: null element at index $g — inputs must be " +
              "null-free quantized vectors")
        s += v.getLong(g) * pj(g)
        g += 1
      }
      if (s > 0L) b |= 1L << j
      j += 1
    }
    b
  }
}

/** Random-hyperplane LSH bucket id of an int64-quantized vector: nPlanes
  * sign bits of md5-derived hyperplane projections, as ONE codegen'd
  * map-side expression.
  *
  * Replaces the composed form — posexplode (dims× row inflation) →
  * broadcast join against an nPlanes×dim plane frame (another nPlanes×
  * inflation) → two hash aggregations — with a single per-row kernel:
  * at 100 TB the bucket assignment runs at scan width with ZERO
  * shuffles and zero intermediate rows. Exact int64 dot products and
  * the identical md5 plane derivation make it bit-identical to both the
  * composed form and the DuckDB oracle (OpsSpec asserts). */
case class LshBucket(child: Expression, nPlanes: Int, dim: Int)
  extends UnaryExpression {

  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<BIGINT> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    LshPlanes.bucket(v.asInstanceOf[ArrayData], nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.LshPlanes.bucket($v, $nPlanes, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def apply(c: Column, nPlanes: Int, dim: Int): Column =
    GraftBridge.column(LshBucket(GraftBridge.expression(c), nPlanes, dim))
}
