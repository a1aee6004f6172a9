package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gold.IncrementalAgg

/** Streaming gold maintenance: keep an [[IncrementalAgg]] aggregate
  * fresh from a streaming source — bronze→silver→gold stays O(batch)
  * end-to-end, never a scheduled O(history) rebuild.
  *
  * Exactly-once discipline: `foreachBatch` re-delivers the last batch
  * after a restart, and additive merges are NOT idempotent — replaying
  * a fold double-counts. The state directory therefore records the last
  * applied batch id, and [[foldBatch]] skips any batch at-or-below it
  * (ids are strictly increasing per checkpoint). One marker write per
  * micro-batch; the fold itself is the same code path q89 hash-checks
  * in batch mode.
  */
object GoldStream {

  private def markerPath(statePath: String) =
    Paths.get(statePath, "_last_batch_id")

  private[graft] def lastApplied(statePath: String): Long = {
    val p = markerPath(statePath)
    if (Files.isRegularFile(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** Idempotently fold one micro-batch into the persisted aggregate:
    * a batch id at or below the recorded watermark is a replay and is
    * skipped. Returns true iff the batch was applied. */
  def foldBatch(spark: SparkSession, statePath: String, batch: DataFrame,
      batchId: Long, keys: Seq[String],
      measures: Map[String, Column]): Boolean = {
    if (batchId <= lastApplied(statePath)) false
    else {
      IncrementalAgg.update(spark, statePath, batch, keys, measures)
      Files.createDirectories(Paths.get(statePath))
      Files.write(markerPath(statePath),
        batchId.toString.getBytes(StandardCharsets.UTF_8))
      true
    }
  }

  /** Start continuous maintenance of the gold aggregate at `statePath`
    * from `stream`. */
  def maintain(stream: DataFrame, statePath: String, checkpoint: String,
      keys: Seq[String], measures: Map[String, Column],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch.sparkSession, statePath, batch, batchId, keys,
          measures): Unit
      }
      .start()
}
