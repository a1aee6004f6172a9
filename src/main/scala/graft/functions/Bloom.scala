package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column faces over Spark's built-in Bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's injected runtime filters, not SQL-registered in this
  * build, so bridged here like the other native expressions).
  *
  * Determinism: the filter's bitset is an OR of per-item bit patterns —
  * order- and partitioning-free — and xxhash64 is seed-fixed, so the
  * built filter and every membership probe are bit-reproducible across
  * runs, retries, and cluster sizes. */
object Bloom {

  /** Build a Bloom filter over a (SMALL) frame's column and return its
    * serialized bytes. The driver collect is ONE bounded sketch —
    * `numBits/8` bytes regardless of input row count — the same shape
    * Spark's runtime-filter injection ships to the big side; never call
    * this on a corpus-scale frame. */
  def buildFilter(df: DataFrame, c: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe against an inlined filter (foldable binary, as
    * might_contain's type check requires): no false negatives; false
    * positives at the rate the (expectedItems, numBits) sizing gives. */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(filterBytes),
      GraftBridge.expression(xxhash64(c))))
}
