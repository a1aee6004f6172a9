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

  /** Pairwise two-sample Kolmogorov–Smirnov statistic between every
    * group's distribution of an integer-valued column — the
    * distribution-shape drift test that total-variation bucketing
    * ([[distributionDrift]]) approximates: D = max_x |F_a(x) − F_b(x)|
    * over the empirical CDFs, location- and shape-sensitive with no
    * bucketing choice to tune.
    *
    * Returns (group_a, group_b, na, nb, ks) for all ordered pairs
    * a < b.
    *
    * EXACT arithmetic: the CDFs are compared as integer cross products
    * — D's numerator is max |cum_a·n_b − cum_b·n_a| over the merged
    * support, all int64, and ks is ONE division by n_a·n_b. No float
    * comparison ever happens, so the max is engine-independent. The
    * cross products stay in int64 up to ~3·10⁹ rows per group; widen
    * them to DECIMAL(38,0) beyond (the [[graft.queries.Q.cents]] rule).
    *
    * Shape at scale: one (group, value) count aggregation; the value
    * grid (distinct values of the column — the bounded-domain contract
    * of any KS over ints) broadcasts against the per-group histograms;
    * cumulative counts are per-group windows over grid-sized frames;
    * the pair comparison is a grid-keyed equi-join whose output
    * reduces map-side to one row per pair. */
  /** Chi-squared independence screen between two categorical columns
    * (e.g. source × language): the full contingency grid with observed
    * counts, expected counts under independence, and each cell's χ²
    * contribution — the standard "is language balanced across sources"
    * corpus-QA check, with the cells that drive the statistic visible
    * instead of just the aggregate.
    *
    * Returns (a, b, o, e, chi2) per grid cell (zero-observation cells
    * of observed margins included — they contribute e).
    *
    * Determinism (the q122 contract): o and the margins are exact
    * int64; e = row·col/n and the cell term (o−e)²/e are single IEEE
    * chains on exact ints, the term rounds once to ×10⁶ and the grand
    * total (if the caller sums chi2) is order-free integer math.
    *
    * Shape at scale: one (a, b) count aggregation; margins re-aggregate
    * that reduced frame; the grid is margins × margins (bounded
    * categorical dimensions) assembled with broadcast joins. */
  def chiSquared(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // NOT persisted: margins, totals and the grid join re-run a
    // two-skinny-column scan + map-combined aggregation — measured
    // cheaper to recompute than to cache (same finding as
    // [[ksPairwise]], ProfileKs)
    val obs = df.select(aCol.cast("string").as("a"),
        bCol.cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(col("a")).agg(sum(col("o")).as("rs"))
    val cb = obs.groupBy(col("b")).agg(sum(col("o")).as("cs"))
    val tot = obs.agg(sum(col("o")).as("n"))
    ra.crossJoin(broadcast(cb))
      .join(obs, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("o"),
        col("rs"), col("cs"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("o"),
        ((col("rs") * col("cs")).cast("double") / col("n")).as("e"))
      .withColumn("chi2",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e")
          * 1e6).cast("long").cast("double") / 1e6)
  }

  def ksPairwise(df: DataFrame, group: Column, value: Column): DataFrame = {
    // NOT persisted: the reduced (group, value, count) frame feeds
    // several consumers, but its lineage is a two-skinny-column scan +
    // map-combined aggregation — measured CHEAPER to recompute than to
    // round-trip the in-memory columnar cache (ProfileKs, sf1:
    // 0.61 s uncached vs 0.96 s cached).
    val h = df.select(group.cast("string").as("g"),
        value.cast("long").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
    val grid = h.select(col("x")).distinct()
    val groups = h.select(col("g")).distinct()
    // zero-filled per-group histogram on the merged support, then
    // cumulative counts via a per-group window (grid-sized partitions)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    // group size = the group's max cumulative count — one more window
    // function on the SAME g-partitioning (no extra exchange) instead
    // of a separate aggregate + two join-backs
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val cum = groups.crossJoin(broadcast(grid))
      .join(h, Seq("g", "x"), "left")
      .select(col("g"), col("x"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", max(col("cum")).over(wg))
    val a = cum
      .select(col("g").as("group_a"), col("x"),
        col("cum").as("ca"), col("n").as("na"))
    val b = cum
      .select(col("g").as("group_b"), col("x"),
        col("cum").as("cb"), col("n").as("nb"))
    a.join(b, Seq("x"))
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num"))
      .select(col("group_a"), col("group_b"), col("na"), col("nb"),
        (col("num").cast("double") / (col("na") * col("nb"))).as("ks"))
  }
}
