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
}
