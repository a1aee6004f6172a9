package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Workload-shape diagnostics for pre-flight checks on big joins and
  * aggregations: which keys are hot, how hot, and what salting factor
  * would level them.
  *
  * Scale design (100 TB): one hash aggregation over the keyed frame
  * (map-side combine reduces each input split to its distinct keys), one
  * single-row global summary broadcast back over the per-key counts, and
  * a distributed top-k (`TakeOrderedAndProject` — per-partition heaps,
  * never a global sort) for the report. The full key histogram never
  * leaves the executors and nothing is collected to the driver.
  */
object Diagnostics {

  /** Per-key hot-spot report for a prospective join/aggregation key:
    * the `topN` heaviest keys with row count, share of all rows, skew
    * factor (count ÷ mean count — 1.0 = perfectly level), and the salt
    * fan-out that would level each key (`ceil(skew)`, the number of
    * sub-keys `saltedJoin`-style splitting needs so no sub-key exceeds
    * the mean). Deterministic order: count desc, key asc.
    *
    * Feed the `salt` column of the hottest row into a salted-join fan-out
    * (see `Statistics.saltedJoin` / q94) or AQE's skew-join thresholds.
    */
  def skewDiagnosis(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n_rows"))
    // single-row global summary; broadcast-joined onto the per-key counts
    // (the 1-row crossJoin(broadcast(...)) idiom — see TextOps.bm25)
    val totals = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n_rows"),
        (col("n_rows").cast("double") / col("total")).as("share"),
        ((col("n_rows") * col("n_keys")).cast("double") / col("total"))
          .as("skew"),
        ceil((col("n_rows") * col("n_keys")).cast("double") / col("total"))
          .cast("long").as("salt"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topN)
  }

  /** Distribution-drift report between a baseline corpus and a candidate
    * batch over any bucketed feature (length bucket, language, source,
    * quality tercile …): per-bucket counts, proportions, and the
    * total-variation contribution |p_base − p_cand| / 2. Ingest-QA ops
    * sum the last column for the TV distance (0 = identical mix,
    * 1 = disjoint) and alert on buckets whose contribution jumps.
    *
    * Total variation rather than KL: TV needs only +,−,×,÷ on exact
    * integer counts — IEEE-deterministic and engine-reproducible —
    * where KL's transcendental log varies in the last ulp across math
    * libraries (the q122 scaled-log trick exists, but a drift ALERT
    * should not depend on 1e-6-scale rounding policy). Buckets missing
    * on one side count 0 there (the full drift is still charged).
    *
    * Shape at scale: one map-side-combined aggregation per side (each
    * reduced to its bucket histogram before any exchange), a full-outer
    * join of two bucket-bounded frames, and 1-row totals broadcast
    * back — the corpora themselves are never joined or shuffled. */
  def distributionDrift(base: DataFrame, cand: DataFrame,
      bucket: Column): DataFrame = {
    def hist(df: DataFrame, n: String) =
      df.groupBy(bucket.as("bucket")).agg(count(lit(1)).as(n))
    val joined = hist(base, "n_base").join(hist(cand, "n_cand"),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
    val totals = joined.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cand")).as("t_cand"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_base"), col("n_cand"),
        (col("n_base").cast("double") / col("t_base")).as("p_base"),
        (col("n_cand").cast("double") / col("t_cand")).as("p_cand"))
      .withColumn("tv_contrib",
        abs(col("p_base") - col("p_cand")) / 2.0)
      .orderBy(col("bucket"))
  }
}
