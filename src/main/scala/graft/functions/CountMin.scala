package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * typed, MERGEABLE Spark [[Aggregator]] — the point-query complement
  * of the [[MisraGries]] heavy-hitter summary in the sketch family:
  * fixed depth×width counter matrix, one streaming pass, and a
  * perfectly associative merge (element-wise sum), so a 100 TB token
  * stream reduces to a few-KB sketch with map-side combine everywhere.
  *
  * Guarantees with THESE (fixed, md5-derived) hash rows:
  * estimate(x) = min_i cell(i, h_i(x)) is ALWAYS ≥ the true count
  * (deterministically — every occurrence lands in the counted cells),
  * and the classic ≤ true + e·N/width bound holds in expectation over
  * the hash family. Both faces are spec-checked; the estimate is also
  * exactly reproducible in SQL (the q184 oracle) because
  * h_i(x) = md5-prefix32(s"i|x") mod width — the engine-wide h32
  * contract.
  *
  * The buffer is a flat Seq[Long] of depth·width counters encoded as a
  * native array column — no Kryo blobs; partials shuffle as data. */
class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2, "CountMin needs depth >= 1, width >= 2")

  // one digest per thread: tasks are single-threaded but the
  // deserialized aggregator instance may be shared
  @transient private lazy val mdTl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** h32("i|tok") mod width — bit-identical to the SQL form
    * ('0x' || substr(md5(i || '|' || tok), 1, 8))::BIGINT % width. */
  private def cell(i: Int, tok: String): Int = {
    val md = mdTl.get()
    md.reset()
    val d = md.digest(s"$i|$tok"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % width).toInt
  }

  def zero: Array[Long] = Array.fill(depth * width)(0L)

  def reduce(b: Array[Long], tok: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      b(i * width + cell(i, tok)) += 1L
      i += 1
    }
    b
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  def finish(b: Array[Long]): Array[Long] = b

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], tok: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + cell(i, tok))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
