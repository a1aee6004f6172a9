package graft.silver

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance for sessionized derived silver tables
  * (`click_sessions`): fold each appended click batch into persisted
  * session state instead of re-sessionizing the whole history.
  *
  * Why it matters at 100 TB: the derived `click_sessions` layout that
  * q141 reads is rebuilt WHOLE in the bench's untimed maintenance
  * phase; at scale the rebuild IS the cost — O(history) per refresh,
  * exactly the full-refresh anti-pattern [[graft.gold.IncrementalAgg]]
  * removes for gold aggregates (the reference's medallion design
  * likewise maintains silver incrementally,
  * serverless_processing_iceberg/main.py:95-151). Here the fold is
  * O(batch + the affected users' session lists): only users present in
  * the batch are touched, and each touched user contributes one
  * user-sized interval merge.
  *
  * EXACTNESS (the reason intervals are sufficient state): a session of
  * a sorted event set breaks exactly at consecutive gaps > g. Within
  * any computed session, consecutive events chain with gaps <= g, so an
  * interval can never span a > g hole of the full union — a session
  * interval of ANY subset that crossed the hole would need an internal
  * consecutive gap > g, a contradiction. Hence sessionize(all events)
  * equals the gap-tolerant interval merge of sessionize(state events)
  * and sessionize(batch events), for ANY split — including out-of-order
  * appends where a late batch lands between, before, or bridging
  * existing sessions. IncrementalSessionsSpec proves fold-equality
  * against the one-shot rebuild across random (non-chronological)
  * splits.
  */
object IncrementalSessions {

  /** Session intervals of one clicks frame, the `click_sessions`
    * schema: (user_id, session_idx, s_start, s_end) with 1-based
    * time-ordered indexes and epoch-microsecond bounds. Same
    * computation as `queries.Advanced.clickSessions`, parameterized by
    * input frame. */
  def sessions(clicks: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val us = graft.functions.Dialect.tsUs _
    graft.ops.Temporal.sessionize(clicks, keyCol = "user_id",
        tsCol = "ts", tieCol = "event_id", gapSeconds = gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(us(min(col("ts"))).as("s_start"),
        us(max(col("ts"))).as("s_end"))
      .select(col("user_id"), col("session_idx"),
        col("s_start"), col("s_end"))
  }

  /** Fold a delta's session intervals into existing session state.
    * Untouched users pass through UNCHANGED (no recompute, no shuffle
    * work beyond the user-keyed anti/semi joins); affected users get a
    * gap-tolerant interval merge and a fresh 1-based re-index. Both
    * inputs and the output use the `click_sessions` schema. */
  def mergeSessions(state: DataFrame, delta: DataFrame,
      gapSeconds: Long = 1800L): DataFrame = {
    val g = gapSeconds * 1000000L
    val affected = delta.select(col("user_id")).distinct()
    val untouched = state.join(affected, Seq("user_id"), "left_anti")
      .select(col("user_id"), col("session_idx"),
        col("s_start"), col("s_end"))
    val pool = state.join(affected, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("s_start"), col("s_end"))
      .unionByName(delta.select(col("user_id"), col("s_start"),
        col("s_end")))
    // gap-tolerant interval merge, the sessionize recurrence lifted to
    // intervals: sorted by start, a row opens a new merged session iff
    // it starts more than g after everything before it ends (running
    // max handles contained/overlapping intervals); the group id is
    // then exactly the 1-based time-ordered session_idx
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s_start"), col("s_end"))
    val prevEnd = max(col("s_end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val merged = pool
      .withColumn("_new",
        when(prevEnd.isNull || col("s_start") - prevEnd > g, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("s_start")).as("s_start"),
        max(col("s_end")).as("s_end"))
      .select(col("user_id"), col("session_idx"),
        col("s_start"), col("s_end"))
    untouched.unionByName(merged)
  }

  // --------------------------------------------------------------------
  // Bucketed state store: the persisted session state lives as ONE
  // parquet file per user_id-hash bucket (pmod(murmur3(user_id),
  // StateBuckets) — the SAME law as the derived layout's bucket spec),
  // so a batch fold READS only the touched buckets' files and WRITES
  // only their replacements; every untouched bucket's file carries into
  // the next state generation as a hard link (metadata-only). Before
  // r11 the fold rewrote the WHOLE state parquet per batch and the
  // layout refresh scanned the full state — the two remaining
  // O(history) terms on this path (r10 verdict task 2). The store
  // mechanics (marker, staged-file containment, link carry, atomic
  // swap, legacy upgrade) are the generic [[BucketedState]], shared
  // with the incremental gold aggregate.
  // --------------------------------------------------------------------

  val StateBuckets = 32

  /** The state dir's data files grouped by bucket id (part index). */
  private[graft] def stateBucketFiles(statePath: String)
      : Map[Int, Seq[java.nio.file.Path]] =
    BucketedState.bucketFiles(statePath)

  /** Fold one click batch into the bucketed session state at
    * `statePath`, touching only the batch's user_id-hash buckets.
    * Returns (touched bucket ids, the NEW state restricted to exactly
    * those buckets) — what the bucket-scoped layout refresh needs,
    * with no full-state scan anywhere on the path. */
  def updateTouched(spark: SparkSession, statePath: String,
      batchClicks: DataFrame, gapSeconds: Long = 1800L)
      : (Set[Int], DataFrame) = {
    val delta = sessions(batchClicks, gapSeconds)
    BucketedState.fold(spark, statePath, delta, Seq("user_id"),
      StateBuckets) {
      case (Some(slice), d) => mergeSessions(slice, d, gapSeconds)
      case (None, d) => d
    }
  }

  /** Fold one click batch into the persisted session state at
    * `statePath` (atomic swap, [[graft.gold.IncrementalAgg.update]]'s
    * durability contract), returning the refreshed FULL state. The fold
    * itself is bucket-scoped ([[updateTouched]]); only this
    * convenience read spans the whole store. */
  def update(spark: SparkSession, statePath: String, batchClicks: DataFrame,
      gapSeconds: Long = 1800L): DataFrame = {
    updateTouched(spark, statePath, batchClicks, gapSeconds)
    spark.read.parquet(statePath)
  }

  /** Append-time maintenance for the `click_sessions` DERIVED layout:
    * fold the batch into the bucketed state store, then refresh the
    * bucketed layout the q141 read path resolves. O(touched buckets)
    * END-TO-END: the state fold reads and writes only the batch's
    * user_id-hash buckets ([[updateTouched]]), and the layout refresh
    * stages exactly the same touched content
    * ([[BucketedTables.refreshDerivedLayoutTouched]]) — no step on
    * this path scans or rewrites the full history (r10 verdict task
    * 2; before r11 the state parquet was rewritten whole per batch and
    * the refresh filtered a table-sized frame). The state path is the
    * layout's WRITER TAG, so a layout built by someone else (e.g. a
    * full-history ensureDerivedLayout) is never corrupted by a
    * carry-across — it takes the full rewrite instead. */
  def maintainClickSessionsLayout(spark: SparkSession, dir: String,
      statePath: String, batchClicks: DataFrame,
      gapSeconds: Long = 1800L): String = {
    val (touched, touchedContent) =
      updateTouched(spark, statePath, batchClicks, gapSeconds)
    BucketedTables.refreshDerivedLayoutTouched(spark, dir,
      "click_sessions", Seq("user_id"),
      sortCols = Seq("user_id", "session_idx"),
      numBuckets = StateBuckets, writerTag = Some(statePath))(
      touchedContent, touched)(
      if (graft.core.Fs.nonEmpty(Paths.get(statePath)))
        spark.read.parquet(statePath)
      else touchedContent)
  }
}
