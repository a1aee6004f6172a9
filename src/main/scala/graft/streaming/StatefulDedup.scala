package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful cross-batch deduplication for streams.
  *
  * The reference resolves duplicates with a two-level rule (SURVEY §2.9):
  * earliest `_insert_date` wins WITHIN a micro-batch (W1,
  * serverless_processing_iceberg/main.py:64-74) and the latest batch wins
  * ACROSS batches via upsert — which requires a mutable sink. For
  * append-only sinks (event logs, training-data corpora) the streaming-
  * native answer is keyed state: `flatMapGroupsWithState` remembers which
  * keys have been seen and emits each key exactly once, so downstream
  * consumers never need a merge pass.
  *
  * Scale notes (100 TB):
  *  - state is ONE boolean per key, hash-partitioned by key — the same
  *    shuffle the dedup would need anyway; the state store scales
  *    horizontally with executors and is checkpointed incrementally;
  *  - unbounded key cardinality needs bounded state: pass `stateTtl` to
  *    evict keys idle longer than the TTL (a key recurring after
  *    eviction re-emits — the standard windowed-dedup tradeoff, same as
  *    dropDuplicates + watermark);
  *  - within one micro-batch the lexicographically earliest `orderCols`
  *    row wins, matching the batch path's W1 direction exactly.
  */
object StatefulDedup {

  /** SQL-`ASC`-compatible comparison for order-column values: timestamps
    * at full precision, integral/floating numerics by value, strings
    * lexicographically, nulls first (Spark's ASC default). */
  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
    case (x: java.lang.Float, y: java.lang.Float) => java.lang.Float.compare(x, y)
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }

  private def lexLt(a: Seq[Any], b: Seq[Any]): Boolean = {
    var i = 0
    while (i < a.length) {
      val c = cmpVal(a(i), b(i))
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  /** Emit each key's first-seen record exactly once across micro-batches.
    * Also runs in batch mode (Spark executes flatMapGroupsWithState over
    * a batch frame with empty initial state), where it reduces to W1 —
    * that equivalence is what the q58 oracle checks.
    *
    * @param df        streaming (or batch) DataFrame
    * @param keyCols   dedup key columns (the endpoint's primary key)
    * @param orderCols timestamp-ish column(s); the lexicographically
    *                  smallest value wins within a batch (W1:
    *                  earliest-wins; later columns break ties)
    * @param stateTtl  optional processing-time TTL (e.g. "24 hours")
    *                  after which an idle key's state is evicted
    */
  def firstSeen(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      stateTtl: Option[String] = None): DataFrame = {
    implicit val rowEnc: Encoder[Row] = ExpressionEncoder(df.schema)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val ordIdx = orderCols.map(df.schema.fieldIndex)
    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    df.groupByKey { r =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString(" ")
    }.flatMapGroupsWithState(OutputMode.Append, timeout) {
      (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) Iterator.empty
        else {
          state.update(true)
          stateTtl.foreach(state.setTimeoutDuration)
          // W1 within the batch: lexicographically earliest orderCols.
          // `rows` may yield a REUSED Row object (Spark mutates the same
          // backing row as the iterator advances), so the retained winner
          // must be a defensive copy — holding the reference silently
          // turns "earliest" into "whatever the iterator last held".
          var best: Row = null
          var bestOrd: Seq[Any] = null
          rows.foreach { r =>
            val o = ordIdx.map(i => r.get(i))
            if (best == null || lexLt(o, bestOrd)) { best = r.copy(); bestOrd = o }
          }
          Iterator.single(best)
        }
    }.toDF()
  }
}
