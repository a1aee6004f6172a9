package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state.
  *
  * A streaming join keeps both sides' unmatched rows in state; without a
  * time bound that state grows forever. The interval form — effect
  * within [cause_ts, cause_ts + gap) on the same key — plus watermarks
  * on BOTH sides gives Spark the eviction bound: rows older than
  * watermark + gap can never match and are dropped. The same plan runs
  * identically in batch (where it is the inner-join face of
  * ops.Temporal.rangeJoin's semantics).
  */
object StreamJoin {

  /** Attribute `effectType` events to the `causeType` event of the same
    * user that happened at most `gapSeconds` earlier. Works on batch and
    * streaming frames alike; on streams, pass watermarked inputs or set
    * `watermark` to have it applied here.
    */
  def attribute(events: DataFrame, causeType: String, effectType: String,
      gapSeconds: Long, watermark: String = "1 hour"): DataFrame = {
    val isStreaming = events.isStreaming
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (isStreaming) df.withWatermark(tsCol, watermark) else df
    val cause = wm(events.filter(col("event_type") === causeType)
      .select(col("event_id").as("cause_id"), col("user_id"),
        col("ts").as("cause_ts")), "cause_ts")
    val effect = wm(events.filter(col("event_type") === effectType)
      .select(col("event_id").as("effect_id"),
        col("user_id").as("effect_user"), col("ts").as("effect_ts")),
      "effect_ts")
    cause.join(effect,
      col("user_id") === col("effect_user")
        && col("effect_ts") >= col("cause_ts")
        && col("effect_ts") < col("cause_ts")
          + expr(s"INTERVAL $gapSeconds SECONDS"))
      .select(col("cause_id"), col("effect_id"), col("user_id"),
        col("cause_ts"), col("effect_ts"))
  }
}
