package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Dialect.tsUs

/** Temporal operators the reference's DuckDB dialect exposes but Spark has
  * no single built-in for: as-of joins (DuckDB `ASOF JOIN`) and gap-based
  * sessionization.
  *
  * Scale design (100 TB):
  *  - the as-of join is the UNION-SORT formulation: tag both inputs, union,
  *    and run one `last(_, ignoreNulls)` window partitioned by the join
  *    key — exactly ONE shuffle on the key, never a range-expanded join.
  *    The naive inequality join (`l.key = r.key AND r.ts < l.ts` + argmax)
  *    materializes O(|l|·matches) intermediate rows — quadratic per key —
  *    and is how a 100 TB as-of dies; the union form moves each input row
  *    exactly once.
  *  - sessionization is a single keyed window pass (lag + running sum):
  *    one shuffle by the session key, no self-join, no driver state.
  */
object Temporal {

  /** Backward as-of join: for each left row, the single most recent right
    * row with `right.tsCol < left.tsCol` (strictly before) and equal keys.
    * Right-side value columns come back null when no prior row exists
    * (LEFT OUTER semantics, like DuckDB `ASOF LEFT JOIN`).
    *
    * Ties inside the right table (equal key+ts) resolve to the row with
    * the greatest `tieCol`, which the caller must make unique per
    * (key, ts) — a monotone event id does.
    *
    * Both inputs are tagged and unioned; within the key-partitioned sort,
    * right rows order before left rows at equal ts via the side flag so
    * an equal-ts right row is NOT visible to the left row (strict <).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // All rightVals travel as ONE struct column, so the single
    // last(_, ignoreNulls) picks one matched right ROW and every value —
    // nulls included — comes from it. Per-column last() would instead
    // backfill a null field from an OLDER row (and different columns from
    // different rows), diverging from ASOF JOIN row semantics.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_r", lit(null).cast(rStructType))
    val r0 = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", col(tieCol).cast("long"))
      .withColumn("_r", struct(rightVals.map(col): _*))
    val rPadded = leftCols.foldLeft(r0)(
      (d, c) => if (d.columns.contains(c)) d else
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col): _*)
    val u = l.unionByName(rPadded)
    // strict-before: at equal ts the left row (side 0) sorts BEFORE right
    // rows (side 1), so rowsBetween(unboundedPreceding, currentRow) at a
    // left row sees only strictly-earlier right rows; right-side ties
    // resolve to the last (greatest _tie) in sort order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  /** Bucketed range join: match point rows to interval rows with equal
    * keys and `start <= pt < end`, without a range-expanded join.
    *
    * The naive formulation — an equi-join on keys with the range predicate
    * as a join filter — hash-partitions ONLY on the key, so every
    * (point, interval) pair under a key is generated before filtering:
    * O(points·intervals) per key, which at 100 TB is a cross join in
    * disguise. Instead the timeline is cut into fixed buckets of
    * `bucketUs`: each interval replicates to the buckets it overlaps
    * (≤ len/bucket + 1 copies), each point hashes to exactly one bucket,
    * and the join key becomes (keys, bucket) — equi-join, AQE-splittable,
    * with the exact range predicate applied after the match. Each
    * matching pair is produced exactly once (a point lives in one
    * bucket), so no dedup pass is needed.
    *
    * `ptUs`, `startUs`, `endUs` are epoch-microsecond long columns
    * (end exclusive); intervals with end <= start match nothing.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      ptUs: String, startUs: String, endUs: String,
      bucketUs: Long): DataFrame = {
    val iv = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("_bucket", explode(sequence(
        floor(col(startUs) / bucketUs).cast("long"),
        floor((col(endUs) - 1) / bucketUs).cast("long"))))
    val pt = points
      .withColumn("_bucket", floor(col(ptUs) / bucketUs).cast("long"))
    pt.join(iv, keys :+ "_bucket")
      .filter(col(ptUs) >= col(startUs) && col(ptUs) < col(endUs))
      .drop("_bucket")
  }

  /** Bucketed interval-OVERLAP join: match left intervals to right
    * intervals with equal keys and `lStart <= rEnd && rStart <= lEnd`
    * (closed-interval overlap), without a range-expanded join.
    *
    * Same timeline-bucketing idea as [[rangeJoin]], on BOTH sides: each
    * interval replicates to every `bucketUs` bucket it touches, the join
    * becomes an equi-join on (keys, bucket), and the exact overlap
    * predicate filters after the match. Two overlapping intervals share
    * at least one bucket (any instant of their intersection lies in a
    * bucket both touch), so the candidate set is complete; a pair can
    * share several buckets, so candidates attribute each match to ONE
    * canonical shared bucket — the greatest of the two start-buckets —
    * instead of a distinct pass: exactly-once without a dedup shuffle.
    *
    * Sizing: replication is len/bucketUs + 1 per interval — pick
    * `bucketUs` near the median interval length so short intervals copy
    * ~once and a long interval's copies parallelize its own matching
    * (the same sizing rule every bucketed interval join ships with). */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStartUs: String, lEndUs: String, rStartUs: String, rEndUs: String,
      bucketUs: Long): DataFrame = {
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn("_bucket", explode(sequence(
          floor(col(s) / bucketUs).cast("long"),
          floor(col(e) / bucketUs).cast("long"))))
    val l = bucketed(left, lStartUs, lEndUs)
    val r = bucketed(right, rStartUs, rEndUs)
    l.join(r, keys :+ "_bucket")
      .filter(col(lStartUs) <= col(rEndUs) && col(rStartUs) <= col(lEndUs))
      // canonical bucket: the first bucket the INTERSECTION touches =
      // max of the two start buckets — each overlapping pair passes once
      .filter(col("_bucket") === greatest(
        floor(col(lStartUs) / bucketUs).cast("long"),
        floor(col(rStartUs) / bucketUs).cast("long")))
      .drop("_bucket")
  }

  /** Per-left-interval count of overlapping right intervals — including
    * ZERO — in one join + one aggregation. The naïve form is
    * [[overlapJoin]] → count → left-join the counts back onto `left`,
    * which pays a second traversal of the left subtree plus an attach
    * shuffle; here the bucketed join runs LEFT OUTER with the overlap +
    * canonical-bucket predicates inside the JOIN CONDITION (for matches
    * this is the exact [[overlapJoin]] semantics; non-matching left
    * replicas survive with null right columns), and the group-count then
    * both collapses the bucket replicas and counts matches — nulls
    * aren't counted, so a session's unmatched replicas contribute 0.
    * Measured ~30% faster than join-back at sf0.1 and one fewer shuffle
    * at any scale.
    *
    * Returns all of `left`'s columns plus `n_overlap`. Rows of `left`
    * must be distinct (they are grouped by all columns to collapse
    * bucket replicas); invalid intervals (end < start) are dropped from
    * BOTH sides, as in [[overlapJoin]]. */
  def overlapCount(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStartUs: String, lEndUs: String, rStartUs: String, rEndUs: String,
      bucketUs: Long): DataFrame = {
    // rename right's key columns so the join condition can be explicit
    // (keys share names across the two sides by contract)
    val r0 = keys.foldLeft(right.filter(col(rEndUs) >= col(rStartUs))) {
      (df, k) => df.withColumnRenamed(k, s"_r_$k")
    }
    val l = left.filter(col(lEndUs) >= col(lStartUs))
      .withColumn("_lb", explode(sequence(
        floor(col(lStartUs) / bucketUs).cast("long"),
        floor(col(lEndUs) / bucketUs).cast("long"))))
    val r = r0.withColumn("_rb", explode(sequence(
      floor(col(rStartUs) / bucketUs).cast("long"),
      floor(col(rEndUs) / bucketUs).cast("long"))))
    val cond = keys.map(k => col(k) === col(s"_r_$k"))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col("_lb") === col("_rb") &&
      col(lStartUs) <= col(rEndUs) && col(rStartUs) <= col(lEndUs) &&
      col("_lb") === greatest(
        floor(col(lStartUs) / bucketUs).cast("long"),
        floor(col(rStartUs) / bucketUs).cast("long"))
    l.join(r, cond, "left_outer")
      .groupBy(left.columns.map(col).toIndexedSeq: _*)
      .agg(count(col(rStartUs)).as("n_overlap"))
  }

  /** [[overlapCount]] for SELECTIVE keys: joins on `keys` alone with the
    * overlap test as a join-condition filter — no bucket replication, no
    * bucket key in the exchange. When per-key interval counts are bounded
    * (a user's sessions × a user's errors), this is the right plan at ANY
    * scale: the left side often arrives already partitioned by `keys`
    * (e.g. straight out of a sessionize window) and then pays NO exchange
    * at all, while the bucketed form would re-shuffle BOTH sides on
    * (keys, bucket) and replicate rows per touched bucket. Use the
    * bucketed [[overlapCount]] when keys are coarse or absent (per-key
    * match volume unbounded — there the bucket key is what keeps a
    * single key's timeline parallel and skew-splittable). */
  def overlapCountKeyed(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStartUs: String, lEndUs: String, rStartUs: String, rEndUs: String)
      : DataFrame = {
    require(keys.nonEmpty, "keyed overlap count needs join keys; " +
      "use overlapCount(bucketUs) for the keyless case")
    val r0 = keys.foldLeft(right.filter(col(rEndUs) >= col(rStartUs))) {
      (df, k) => df.withColumnRenamed(k, s"_r_$k")
    }
    val l = left.filter(col(lEndUs) >= col(lStartUs))
    val cond = keys.map(k => col(k) === col(s"_r_$k")).reduce(_ && _) &&
      col(lStartUs) <= col(rEndUs) && col(rStartUs) <= col(lEndUs)
    l.join(r0, cond, "left_outer")
      .groupBy(left.columns.map(col).toIndexedSeq: _*)
      .agg(count(col(rStartUs)).as("n_overlap"))
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gapSeconds`. Returns the
    * input plus a `session_idx` column (1-based, per key, in time order;
    * ties broken by `tieCol`). One keyed window pass — one shuffle. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull ||
      graft.functions.Dialect.tsUs(col(tsCol)) - graft.functions.Dialect.tsUs(prevTs) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("_new", isNew)
      .withColumn("session_idx",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("_new")
  }

  /** Top event PATHS: the most frequent ordered `len`-step event-type
    * sequences across users — the path-mining complement of pairwise
    * transition counts (q110b): "view > cart > purchase" as a first-class
    * countable object.
    *
    * Returns the top `k` (path, n) rows, path as "a>b>c", ranked
    * (n desc, path asc).
    *
    * Shape at scale: ONE user-keyed shuffle collects each user's
    * (ts, event_id, type) triples; ordering and window extraction are
    * per-row array lambdas on the collected list (per-user event counts
    * are bounded in any real funnel corpus — the same per-key-bounded
    * contract as sessionize); path counts combine map-side and the
    * global top-k plans as TakeOrderedAndProject. Total order
    * (ts, event_id) makes the sequence deterministic under ties. */
  def topPaths(events: DataFrame, len: Int = 3, k: Int = 20): DataFrame = {
    require(len >= 2, "path length must be >= 2")
    val perUser = events
      .where(col("event_type").isNotNull)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(expr("transform(evs, e -> e.event_type)").as("ts"))
    perUser
      .where(size(col("ts")) >= len)
      .select(explode(expr(
        s"""transform(sequence(1, size(ts) - ${len - 1}),
            i -> array_join(slice(ts, i, $len), '>'))""")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Exponentially time-decayed aggregate per key: each event
    * contributes value · 2^(−age/halfLife), age measured against the
    * corpus max timestamp — the recency-weighted engagement/importance
    * score of feature stores and trending rankers, computed batch-side
    * in closed form (no per-event state machine).
    *
    * Returns (key, n_events, decayed) with decayed = Σ value·2^(−age/hl).
    *
    * Determinism (the q122 contract): each event's decayed term is
    * rounded ONCE to scaled (×10⁶) int64 — all microsecond arithmetic
    * is exact int64, the exponent division and pow are single IEEE
    * operations on exact inputs — so the per-key sum is order-free
    * integer math that any engine reproduces.
    *
    * Shape at scale: the reference timestamp is a 1-row aggregate
    * broadcast (`crossJoin(broadcast(…))`); terms are map-side; ONE
    * key-partitioned map-combined aggregation. An incremental refresh
    * multiplies a stored total by a constant decay factor and adds the
    * new batch — the closed form here is what makes that fold correct. */
  def decayedAggregate(events: DataFrame, key: Column, ts: Column,
      value: Column, halfLifeHours: Double = 6.0): DataFrame = {
    val tmax = events.agg(max(tsUs(ts)).as("tmax_us"))
    events.crossJoin(broadcast(tmax))
      .select(key.as("key"),
        round(value * pow(lit(2.0),
          -((col("tmax_us") - tsUs(ts)) / 3600000000.0) / halfLifeHours)
          * 1e6).cast("long").as("term"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("term")).cast("double") / 1e6).as("decayed"))
  }
}
