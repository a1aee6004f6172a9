package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The k SMALLEST long values of a group as a typed, MERGEABLE
  * [[Aggregator]] — the ascending mirror of [[TopKByScore]], built for
  * df-capped postings collection (winnowPairs): one aggregation yields
  * both the group's size class and its member list with AT MOST k longs
  * of state per key, where `collect_list` + a separate df-count join
  * holds the whole group.
  *
  * The capped buffer is exactly what makes a df-cap filter safe to fuse
  * into the collection: a group at or under `k` members keeps ALL of
  * them (no discard can trigger), so a consumer that filters
  * `size(ids) <= k - 1` reads complete, deterministic member lists; a
  * hotter group saturates at `k` sorted-smallest values — O(k) state
  * however hot the key, never a corpus-length list in one buffer.
  *
  * Ordering: ascending, duplicates kept (collect_list parity). The
  * buffer is a sorted-ascending Seq encoded natively as array&lt;long&gt;
  * (no Kryo blobs); insertion is O(k) and the merge is a k-bounded
  * sorted merge, so the result is deterministic under any partitioning
  * and merge order. */
class MinKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, "MinKLongs needs k >= 1")

  def zero: Seq[Long] = Vector.empty

  def reduce(b: Seq[Long], x: Long): Seq[Long] = {
    val n = b.size
    if (n >= k && x >= b(n - 1)) b
    else {
      // one pre-sized array + two arraycopies per insert (r16): this is
      // the per-row hot path of winnowPairs' biggest aggregation, and
      // the previous immutable take/:+/++/drop chain allocated four
      // vectors per insert (r15 verdict item 8)
      var i = 0
      while (i < n && b(i) <= x) i += 1
      val m = math.min(n + 1, k)
      val out = new Array[Long](m)
      var t = 0
      while (t < i && t < m) { out(t) = b(t); t += 1 }
      if (i < m) out(i) = x
      t = i + 1
      while (t < m) { out(t) = b(t - 1); t += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
    // k-bounded merge of two sorted-ascending runs
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < b1.size || j < b2.size)) {
      val takeLeft = j >= b2.size || (i < b1.size && b1(i) <= b2(j))
      if (takeLeft) { out += b1(i); i += 1 }
      else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[Long]): Seq[Long] = b

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
