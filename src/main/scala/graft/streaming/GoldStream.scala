package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gold.IncrementalAgg
import graft.silver.Upsert

/** Streaming gold maintenance: keep an [[IncrementalAgg]] aggregate
  * fresh from a streaming source — bronze→silver→gold stays O(batch)
  * end-to-end, never a scheduled O(history) rebuild.
  *
  * Exactly-once discipline: `foreachBatch` re-delivers the last batch
  * after a restart, and additive merges are NOT idempotent — replaying
  * a fold double-counts. The replay watermark (`_last_batch_id`) is
  * therefore written INTO the staged state directory before the atomic
  * swap, so state and watermark commit together: a crash at any point
  * leaves either the old state with the old marker or the new state
  * with the new marker, never folded state without its marker. (Spark's
  * parquet reader ignores `_`-prefixed files, so the marker rides in
  * the data directory invisibly.) The swap itself is two renames with a
  * crash window where NO state dir exists; `foldBatch` closes it by
  * running [[graft.silver.Upsert.healSwap]] before reading the marker —
  * restoring the displaced pre-swap state instead of silently treating
  * the table as empty. The interrupted batch's watermark was never
  * committed, so the replay re-folds it exactly once.
  *
  * The marker also records the CHECKPOINT identity: batch ids restart
  * at 0 for a fresh checkpointLocation, so pairing old state with a new
  * checkpoint would otherwise silently skip every delivery forever.
  * A mismatch fails loudly instead.
  */
object GoldStream {

  private def markerPath(statePath: String) =
    Paths.get(statePath, "_last_batch_id")

  /** (recorded checkpoint id, last applied batch id); ("", -1) when no
    * marker exists. A corrupt marker throws — that is operator-level
    * damage, and guessing -1 would re-fold (double-count) batches. */
  private[graft] def readMarker(statePath: String): (String, Long) = {
    val p = markerPath(statePath)
    if (!Files.isRegularFile(p)) ("", -1L)
    else {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n", 2)
      (if (lines.length > 1) lines(1).trim else "", lines(0).trim.toLong)
    }
  }

  private[graft] def lastApplied(statePath: String): Long =
    readMarker(statePath)._2

  /** Idempotently fold one micro-batch into the persisted aggregate:
    * a batch id at or below the recorded watermark (from the SAME
    * checkpoint) is a replay and is skipped. Returns true iff the batch
    * was applied. */
  def foldBatch(spark: SparkSession, statePath: String, batch: DataFrame,
      batchId: Long, keys: Seq[String], measures: Map[String, Column],
      checkpointId: String = ""): Boolean = {
    // repair an interrupted swap FIRST: a crash between the swap's two
    // renames leaves no state dir, and reading the (then-missing) marker
    // as ("", -1) would silently rebuild from only the replayed batch
    Upsert.healSwap(Paths.get(statePath))
    // fence token captured WITH the watermark read: the stream itself
    // serializes its own foldBatch calls, but a second (misconfigured)
    // writer on the same state path would otherwise last-win silently —
    // with the token its swap (or ours) rejects loudly instead
    val gen0 = graft.core.Fence.generation(Paths.get(statePath))
    val (recordedCkpt, last) = readMarker(statePath)
    if (checkpointId.nonEmpty && recordedCkpt.nonEmpty
        && recordedCkpt != checkpointId)
      throw new IllegalStateException(
        s"state at $statePath was built by checkpoint '$recordedCkpt' but " +
          s"this stream uses '$checkpointId'; batch ids are only " +
          "monotonic per checkpoint — delete the state or restore the " +
          "original checkpoint")
    if (batchId <= last) {
      // replay of an already-folded batch: skip the fold but still RUN
      // the batch plan. An upstream stateful operator (dedup, stream
      // join) commits its state stores per-partition WITH the batch's
      // execution, and Spark validates those commits at trigger end —
      // returning without touching the DataFrame fails the restarted
      // query (STATE_STORE_COMMIT_VALIDATION_FAILED; found by
      // StreamingCrashMatrixSpec's swap.before-retire kill, where the
      // fold landed but the checkpoint didn't).
      batch.foreach(_ => ())
      false
    } else {
      val delta = IncrementalAgg.partials(batch, keys, measures)
      val path = Paths.get(statePath)
      val merged =
        if (graft.core.Fs.nonEmpty(path)) {
          val state = spark.read.parquet(statePath)
          IncrementalAgg.merge(state, delta, keys, measures.keys.toSeq)
        } else delta
      // The staged parquet IS the materialization: the merge plan reads
      // the old state files while writing tmp (they still exist — the
      // swap happens after), and nothing references them once the swap
      // lands. No executor-local blocks anywhere, so losing an executor
      // mid-fold just fails the write and leaves the old state + marker
      // intact for a clean re-fold.
      val tmp = statePath + ".tmp-" + System.nanoTime()
      graft.core.Fence.withStage(Paths.get(tmp)) {
        merged.write.mode("overwrite").parquet(tmp)
        // marker goes into the STAGED dir: state + watermark swap
        // atomically
        Files.write(Paths.get(tmp).resolve("_last_batch_id"),
          s"$batchId\n$checkpointId".getBytes(StandardCharsets.UTF_8))
        Upsert.atomicSwap(Paths.get(tmp), path, Some(gen0))
      }
      true
    }
  }

  /** Start continuous maintenance of the gold aggregate at `statePath`
    * from `stream`. The checkpoint path doubles as the checkpoint
    * identity recorded beside the replay watermark. */
  def maintain(stream: DataFrame, statePath: String, checkpoint: String,
      keys: Seq[String], measures: Map[String, Column],
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch.sparkSession, statePath, batch, batchId, keys,
          measures, checkpointId = checkpoint): Unit
      }
      .start()
}
