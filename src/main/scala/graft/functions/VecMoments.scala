package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable accumulator for [[VecMoments]]: element-wise Σx and Σx² plus
  * the row count. Arrays are sized lazily from the first vector seen and
  * grown if a longer vector arrives. Ragged-input caveat: the SUMS match
  * what an explode + per-(key, dim) aggregation would produce (a short
  * vector simply contributes nothing to the tail dimensions), but `n` is
  * the GROUP row count, not a per-dimension count — a mean `s(g)/n` over
  * ragged inputs divides tail dimensions by more rows than reached them.
  * Callers deriving means (centroid builds) assume fixed-dimension
  * vectors, the embedding-table contract throughout this engine. */
final class VecMomentsBuf(
    var n: Long,
    var s: Array[Long],
    var q: Array[Long]) {

  private def grow(dims: Int): Unit = {
    if (s == null) { s = new Array[Long](dims); q = new Array[Long](dims) }
    else if (dims > s.length) {
      s = java.util.Arrays.copyOf(s, dims)
      q = java.util.Arrays.copyOf(q, dims)
    }
  }

  private def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"vec_moments: null element at index $i — inputs must be " +
        "null-free vectors")

  def add(v: ArrayData): Unit = {
    val dims = v.numElements()
    grow(dims)
    var i = 0
    while (i < dims) {
      if (v.isNullAt(i)) nullElement(i)
      val x = v.getLong(i)
      // addExact: a Σx² overflow (possible past ~10⁸ members per group at
      // 1e5 quantization) must fail loudly, never fold garbage silently
      s(i) = Math.addExact(s(i), x)
      q(i) = Math.addExact(q(i), Math.multiplyExact(x, x))
      i += 1
    }
    n += 1
  }

  /** Float input: quantize inline — `floor(x.toDouble * 1e5).toLong`,
    * bit-identical to VectorOps.quantized (float→double is lossless,
    * both floor the same double) — so the scan's raw float arrays stream
    * straight into the buffer with no interpreted per-element lambda. */
  def addFloat(v: ArrayData): Unit = {
    val dims = v.numElements()
    grow(dims)
    var i = 0
    while (i < dims) {
      if (v.isNullAt(i)) nullElement(i)
      val x = Math.floor(v.getFloat(i).toDouble * 100000d).toLong
      s(i) = Math.addExact(s(i), x)
      q(i) = Math.addExact(q(i), Math.multiplyExact(x, x))
      i += 1
    }
    n += 1
  }

  def merge(o: VecMomentsBuf): Unit = {
    if (o.s != null) {
      grow(o.s.length)
      var i = 0
      while (i < o.s.length) {
        s(i) = Math.addExact(s(i), o.s(i))
        q(i) = Math.addExact(q(i), o.q(i))
        i += 1
      }
    }
    n += o.n
  }
}

/** Element-wise first and second moments of an `ARRAY<BIGINT>` column in
  * ONE pass and ONE buffer: returns `struct(n BIGINT, s ARRAY<BIGINT>,
  * q ARRAY<BIGINT>)` with `s(g) = Σ x_g`, `q(g) = Σ x_g²` over the
  * group's vectors.
  *
  * Exists per the custom-operator preference order (SURVEY §7.3): the
  * composed built-in form — `posexplode` then a hash aggregation keyed by
  * (group, dim) — inflates the member stream dims× (64–128× for real
  * embedding tables) before it can reduce, and every inflated row pays
  * hash-map probing on a two-part key. This aggregate keeps rows whole:
  * per input row it runs one primitive loop over the array into a
  * per-group `Array[Long]` buffer, so a 100 TB vector table streams
  * through map-side partial aggregation at scan width and only
  * groups × dims longs ever reach the exchange — the same shuffle shape
  * as the exploded form, minus the dims× row inflation in front of it.
  *
  * Exactness: sums are int64 with `Math.addExact` (a Σx² overflow past
  * ~10⁸ members·1e10-scale squares per group fails loudly rather than
  * wrapping); results are order- and partitioning-independent, so
  * downstream exact-decimal math stays bit-identical to a SQL oracle
  * computing the same moments from an exploded stream.
  *
  * Null handling: null rows (no vector) are skipped, matching what the
  * exploded form's inner `posexplode` does; null ELEMENTS violate the
  * quantized-vector contract and raise (see GraftVec). An all-null group
  * evaluates to n=0 with empty moment arrays. */
case class VecMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsBuf] with UnaryLike[Expression] {

  override def prettyName: String = "vec_moments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "vec_moments requires ARRAY<BIGINT> (pre-quantized) or ARRAY<FLOAT> " +
        s"(quantized inline) input, got ${other.simpleString}")
  }

  private lazy val floatInput: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false)),
    StructField("q", ArrayType(LongType, containsNull = false))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): VecMomentsBuf =
    new VecMomentsBuf(0L, null, null)

  override def update(b: VecMomentsBuf, input: InternalRow): VecMomentsBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (floatInput) b.addFloat(v.asInstanceOf[ArrayData])
      else b.add(v.asInstanceOf[ArrayData])
    }
    b
  }

  override def merge(b: VecMomentsBuf, o: VecMomentsBuf): VecMomentsBuf = {
    b.merge(o); b
  }

  override def eval(b: VecMomentsBuf): Any = {
    val s = if (b.s == null) Array.emptyLongArray else b.s
    val q = if (b.q == null) Array.emptyLongArray else b.q
    InternalRow(b.n, new GenericArrayData(s), new GenericArrayData(q))
  }

  override def serialize(b: VecMomentsBuf): Array[Byte] = {
    val dims = if (b.s == null) 0 else b.s.length
    val bb = ByteBuffer.allocate(4 + 8 + 16 * dims)
    bb.putInt(dims).putLong(b.n)
    var i = 0
    while (i < dims) { bb.putLong(b.s(i)); i += 1 }
    i = 0
    while (i < dims) { bb.putLong(b.q(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMomentsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val dims = bb.getInt
    val n = bb.getLong
    if (dims == 0) new VecMomentsBuf(n, null, null)
    else {
      val s = new Array[Long](dims)
      val q = new Array[Long](dims)
      var i = 0
      while (i < dims) { s(i) = bb.getLong; i += 1 }
      i = 0
      while (i < dims) { q(i) = bb.getLong; i += 1 }
      new VecMomentsBuf(n, s, q)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMoments =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecMoments =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): VecMoments =
    copy(child = newChild)
}

object VecMoments {
  /** Aggregate `Column` face: `vecMoments(arr)` ⇒ struct(n, s, q). */
  def apply(c: Column): Column =
    GraftBridge.column(
      VecMoments(GraftBridge.expression(c)).toAggregateExpression())
}
