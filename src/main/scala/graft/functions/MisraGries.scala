package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed, MERGEABLE Spark
  * [[Aggregator]] — the bounded-memory answer to "which tokens exceed
  * N/k of the corpus" that a 100 TB pipeline can afford: one streaming
  * pass, at most k−1 counters per partition, and an associative partial
  * merge (Agarwal et al., "Mergeable Summaries", PODS'12), so the
  * classic guarantee — EVERY item with true frequency > N/k survives
  * into the final summary — holds under arbitrary partitioning and
  * merge order. Counter values are lower bounds within N/k of the true
  * count; the exact-membership check against this guarantee is
  * oracle-anchored by q140b (same pattern as q57b for the HLL sketch).
  *
  * Reference intent: the chat/chart layer surfaces "top values" per
  * column (lambdas/chat_api/tools.py:115-123 caps row/point counts);
  * this provides the sketch that computes them in one pass at scale.
  *
  * The buffer is an immutable Map (persistent HAMT — effectively O(1)
  * updated/removed), encoded by Spark's native map Encoder: no Kryo
  * blobs, the partial state shuffles as a real MapType column.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "MisraGries needs k >= 2")
  private val m = k - 1 // counter capacity

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < m => b.updated(tok, 1L)
      case None =>
        // classic MG step: decrement every counter, drop the zeros
        b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  /** Mergeable-summaries combine: sum counters, and if over capacity
    * subtract the (m+1)-th largest combined count from everything and
    * drop the non-positives — equivalent to a batch of MG decrements,
    * so the error bound adds, not multiplies. */
  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= m) combined
    else {
      val d = combined.values.toArray.sortWith(_ > _).apply(m)
      combined.collect { case (t, c) if c > d => t -> (c - d) }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
