package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus-drift monitor: per event-time tumbling window, the
  * total-variation distance between the window's bucketed feature
  * histogram and a STATIC baseline distribution — the live version of
  * [[graft.ops.Diagnostics.distributionDrift]] (same TV semantics, no
  * transcendentals), for catching an ingest feed going off-profile
  * while it happens rather than at the next batch audit.
  *
  * Shape: two chained stateful aggregations (Spark's multi-stateful
  * append-mode support — the second groups on `window_time` of the
  * first's window, the documented chained-window pattern), with the
  * baseline attached by a stateless broadcast stream-static join
  * between them. State per window is one count per occupied bucket;
  * the final TV fold runs over a ≤|buckets| collected array per
  * window, never over rows.
  *
  * Baseline buckets ABSENT from a window still count: TV over the full
  * support decomposes as ½(Σ_present |p−q| + (1 − Σ_present q)), so the
  * missing mass needs no outer join. Windows emit only once closed by
  * the watermark (append mode) — late data inside the watermark still
  * lands in its window.
  *
  * @param baseline static (bucket, p) frame, p summing to 1 over the
  *                 reference corpus's support. */
object DriftStream {

  def windowedDrift(events: DataFrame, baseline: DataFrame, bucket: Column,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val perBucket = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val withBase = perBucket
      .join(broadcast(baseline.select(col("bucket"), col("p"))),
        Seq("bucket"), "left")
      .na.fill(0.0, Seq("p"))
    withBase
      .groupBy(window(window_time(col("w")), windowLen).as("w2"))
      .agg(collect_list(struct(col("n"), col("p"))).as("h"))
      .select(col("w2.start").as("window_start"),
        col("w2.end").as("window_end"),
        expr("aggregate(h, 0L, (a, x) -> a + x.n)").as("n_events"),
        expr("""round((aggregate(h, 0D, (a, x) ->
                  a + abs(CAST(x.n AS DOUBLE)
                    / aggregate(h, 0L, (acc, y) -> acc + y.n) - x.p))
                + (1.0D - aggregate(h, 0D, (a, x) -> a + x.p))) / 2.0, 9)""")
          .as("tv"))
  }
}
