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

  /** Code-point-order string comparison, matching Spark SQL's binary
    * (UTF8_BINARY) `ASC` collation. `String.compareTo` is UTF-16
    * code-UNIT order, which sorts supplementary characters (emoji,
    * astral CJK — surrogate pairs starting at 0xD800) BELOW BMP chars in
    * [U+E000, U+FFFF]; UTF-8 byte order = code-POINT order does not. */
  private def cmpCodePoints(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** SQL-`ASC`-compatible comparison for order-column values: timestamps
    * (both flavors) and dates at full precision, numerics by value,
    * strings in code-point order (= Spark's UTF8_BINARY collation),
    * nulls first (Spark's ASC default). Order-column types are
    * enumerated explicitly — an unlisted type (array, struct, map,
    * binary) is rejected rather than compared by `toString`, which would
    * only approximate SQL ordering. */
  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
    case (x: java.lang.Float, y: java.lang.Float) => java.lang.Float.compare(x, y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => java.lang.Boolean.compare(x, y)
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    case (x: String, y: String) => cmpCodePoints(x, y)
    case (x, y) => throw new IllegalArgumentException(
      s"unsupported order-column type for stateful dedup: " +
        s"${x.getClass.getName} vs ${y.getClass.getName}")
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
