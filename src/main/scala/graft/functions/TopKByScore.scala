package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group as a typed, MERGEABLE [[Aggregator]]: each
  * partial carries AT MOST k (score, id) pairs, so a "top 5 per key"
  * over a 100 TB fact table shuffles k rows per key per map task
  * instead of sorting every row of the group the way the
  * `row_number() OVER (PARTITION BY … ORDER BY …)` window does. The
  * window plan must (1) shuffle ALL rows to the key's reducer and
  * (2) sort the whole partition; this aggregator reduces map-side and
  * merges k-bounded buffers — the same partial-vs-final contrast as
  * count vs collect.
  *
  * Ordering: score DESC, id ASC on ties — a total order, so the result
  * is deterministic under any partitioning and merge order (spec-checked
  * the way [[MisraGries]] is).
  *
  * The buffer is a sorted-descending Seq of ≤ k pairs encoded natively
  * as array&lt;struct&lt;score,id&gt;&gt; (no Kryo blobs). Insertion is
  * O(k) — for the small k of a "top values" surface the constant beats
  * a heap's bookkeeping, and the merge is a k-bounded sorted merge. */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, "TopKByScore needs k >= 1")

  @inline private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: Seq[(Long, Long)] = Vector.empty

  def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (b.size >= k && !beats(x, b.last)) b
    else {
      val i = b.indexWhere(e => beats(x, e)) match {
        case -1 => b.size
        case j  => j
      }
      val grown = (b.take(i) :+ x) ++ b.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // k-bounded merge of two sorted-descending runs
    val out = Vector.newBuilder[(Long, Long)]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < b1.size || j < b2.size)) {
      val takeLeft = j >= b2.size || (i < b1.size && beats(b1(i), b2(j)))
      if (takeLeft) { out += b1(i); i += 1 }
      else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
