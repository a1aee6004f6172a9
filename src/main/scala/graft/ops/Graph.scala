package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics — the join-per-round pattern
  * that [[DedupOps.connectedComponents]] uses for labels, applied to
  * weighted PageRank. Each round is ONE edge-keyed join plus ONE
  * dst-keyed aggregation (both map-side combined), with
  * [[graft.core.Stage]] truncating lineage per round so the plan stays
  * flat at any iteration count — the execution shape that survives a
  * 1000-executor graph.
  *
  * Determinism (the q174 contract on a graph): ranks are EXACT
  * ×10⁹-scaled int64 at every round. A round computes per-edge
  * contributions round(d · r_src · w / outW_src) — one IEEE expression
  * over exactly-agreed ints, rounded once (Spark SQL `round` = HALF_UP
  * = DuckDB `round`) — and per-node sums are order-free integer math,
  * so an unrolled SQL replica reproduces the entire trajectory
  * bit-for-bit regardless of partitioning.
  */
object Graph {

  /** Weighted PageRank over a SYMMETRIC edge list (src, dst, w) —
    * symmetric input means no dangling mass (every node that receives
    * also emits), which is exactly the shape of co-occurrence graphs.
    * Returns (id, rank) with rank the final scaled iterate / 10⁹.
    *
    * `edges` must contain each undirected edge in BOTH directions.
    *
    * Adaptive, the [[DedupOps.connectedComponents]] pattern: when the
    * edge set fits `driverEdgeLimit` rows (default 2²² directed rows
    * ≈ 100 MB of longs — a broadcast-side budget), the whole trajectory
    * runs as ONE collect plus driver integer math instead of
    * `iters` × (join + aggregation) scheduled rounds. Near-dup and
    * co-occurrence graphs are the duplicated/correlated SLIVER of a
    * corpus — orders of magnitude smaller than the corpus that produced
    * them — so the fast path is the common case at every scale
    * (measured: q187's 10 rounds collapse from ~4 s of stage waves to
    * milliseconds at sf0.1), while boilerplate-heavy corpora with
    * corpus-sized graphs take the distributed rounds. Both paths
    * compute the identical ×10⁹-scaled integer trajectory
    * (spec-asserted against each other, ties included).
    *
    * The size probe persists the RAW edge frame and counts it — ONE run
    * of the caller's edge pipeline (an LSH near-dup verify, a
    * co-purchase explode — the expensive part), after which every
    * consumer in either path (the fast-path collect; the distributed
    * path's out-weight aggregation, edge join and node distinct) is a
    * cache-local read. The alternatives both double-execute that
    * pipeline somewhere: a `limit(n+1).collect()` probe pays a full
    * extra run plus a wasted limit-sized transfer whenever the graph
    * turns out big (measured on q185 at sf1), and building the
    * ow-joined frame first consumes the raw input twice (measured on
    * q187 at sf0.1). */
  def pageRank(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85,
      driverEdgeLimit: Int = 1 << 22): DataFrame = {
    require(iters >= 1, "pageRank needs iters >= 1")
    // driverEdgeLimit budget honesty: 2²² rows ≈ 100 MB of long payload,
    // but collect() materializes BOXED rows (~3-5× transiently) — sized
    // for this engine's 24 GB driver JVM; deployments with small
    // drivers pass a lower limit (connectedComponents' 2²⁰ is the
    // conservative reference point)
    // NULL-weight edges are DROPPED here, before the paths split: they
    // carry no rank mass in the distributed rounds (sum() skips the null
    // contribution and the null ow term), and the driver fast path's
    // getLong would NPE on them — one filter makes both paths total and
    // identical (r9 advisor).
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .filter(col("w").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EVERYTHING from the first action on is inside the try: a failure
    // during the probe count or the distributed pre-loop would otherwise
    // pin the graph-sized persist in this long-lived session's cache
    try {
      val nEdges = e.count() // the one pipeline execution
      require(nEdges > 0, "pageRank needs a non-empty graph")
      if (nEdges <= driverEdgeLimit)
        return pageRankDriver(e, e.collect(), iters, damping)
      val ew = prEdges(e)
      try {
        val nodes = graft.core.Stage(
          ew.select(col("src").as("id")).distinct())
        val n = nodes.count()
        val r0 = rhu(1000000000.0 / n)
        val base = rhu((1 - damping) * 1000000000.0 / n)
        var r = nodes.select(col("id"), lit(r0).as("r"))
        (1 to iters).foreach { i =>
          val contrib = prRound(ew, r, damping, base)
          // lineage truncation every 5 rounds — without ANY truncation
          // the plan nests one join deeper per iteration and a recompute
          // cascades; truncating EVERY round pays a full materialization
          // job per iteration. Five nested rounds stay a flat chain of
          // shuffle stages inside one job (measured fastest; trajectory
          // identical by construction)
          r = if (i % 5 == 0 || i == iters) graft.core.Stage(contrib)
              else contrib
        }
        // the final iterate is materialized (Stage is eager), so both
        // cached frames can be released before returning
        r.select(col("id"), (col("r").cast("double") / 1e9).as("rank"))
      } finally ew.unpersist(false)
    } finally e.unpersist(false)
  }

  /** HALF_UP on the EXACT binary value of x — the shape of the driver-
    * computed constants (r0, base) in both paths. (math.round's
    * floor(x+0.5) double-rounds near halves; this does not.) */
  private def rhu(x: Double): Long = new java.math.BigDecimal(x)
    .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Spark SQL `round(double)` semantics at scale 0 — HALF_UP away from
    * zero. Spark's Round rounds the shortest-decimal representation; at
    * scale 0 that provably equals plain half-away-from-zero on the
    * binary value: every decimal tie k.5 with |k| < 2⁵² is exactly
    * representable, so a double is on/off a tie identically under both
    * readings. The frac subtraction is exact (Sterbenz: f ≤ x < f+1
    * ≤ 2f for f ≥ 1, mirrored for negatives; trivially exact around 0),
    * so the comparison never double-rounds the way floor(x + 0.5)
    * would. Sign-aware because HALF_UP is away-from-zero: round(-2.5)
    * is -3, which a floor-based half-up would miss — weights are
    * non-negative in every current caller, but the public contract
    * doesn't require it and the trajectories must match regardless. */
  private def sqlRound(x: Double): Long =
    if (x >= 0) {
      val f = math.floor(x)
      (if (x - f >= 0.5) f + 1.0 else f).toLong
    } else {
      val f = math.ceil(x)
      (if (f - x >= 0.5) f - 1.0 else f).toLong
    }

  /** The bounded-driver trajectory: exactly the distributed rounds —
    * v0 = r0 on distinct src; each round, every edge whose src holds a
    * rank contributes round(d·r·w/ow) to its dst (ow fixed from the
    * full edge set), and the new iterate is the per-dst sums + base —
    * in dense-int-indexed arrays. Ids stay opaque (`Any`), so long and
    * string node ids both take the fast path. */
  private def pageRankDriver(e: DataFrame,
      rows: Array[org.apache.spark.sql.Row], iters: Int,
      damping: Double): DataFrame = {
    val idx = new java.util.HashMap[Any, Integer]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Any]
    def intern(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue
      else { idx.put(v, ids.length); ids += v; ids.length - 1 }
    }
    val m = rows.length
    val srcI = new Array[Int](m); val dstI = new Array[Int](m)
    val w = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = rows(i)
      srcI(i) = intern(row.get(0)); dstI(i) = intern(row.get(1))
      w(i) = row.getLong(2); i += 1
    }
    val nn = ids.length
    val ow = new Array[Long](nn)
    val isSrc = new Array[Boolean](nn)
    i = 0
    while (i < m) { ow(srcI(i)) += w(i); isSrc(srcI(i)) = true; i += 1 }
    val n = isSrc.count(identity)
    val r0 = rhu(1000000000.0 / n)
    val base = rhu((1 - damping) * 1000000000.0 / n)
    val none = java.lang.Long.MIN_VALUE // "node absent from this iterate"
    var r = Array.tabulate(nn)(j => if (isSrc(j)) r0 else none)
    var t = 0
    while (t < iters) {
      val acc = Array.fill(nn)(none)
      i = 0
      while (i < m) {
        val rs = r(srcI(i))
        if (rs != none) {
          // the distributed round's expression tree, same IEEE order:
          // ((damping * r) * w) / ow, rounded once
          val c = sqlRound(damping * rs.toDouble * w(i).toDouble
            / ow(srcI(i)).toDouble)
          val d = dstI(i)
          acc(d) = (if (acc(d) == none) 0L else acc(d)) + c
        }
        i += 1
      }
      i = 0
      while (i < nn) { if (acc(i) != none) acc(i) += base; i += 1 }
      r = acc; t += 1
    }
    val spark = e.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        e.schema("src").dataType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType)))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    i = 0
    while (i < nn) {
      if (r(i) != none) out.add(
        org.apache.spark.sql.Row(ids(i), r(i).toDouble / 1e9))
      i += 1
    }
    spark.createDataFrame(out, schema)
  }

  /** The persisted per-round edge frame (src, dst, w, ow) — computed
    * once, HASH-PARTITIONED BY src, held with `cache()` rather than a
    * checkpoint: an `InMemoryTableScan` REPORTS its partitioning to the
    * planner (and AQE leaves cached output partitioning alone —
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`
    * defaults false), while a checkpoint's `LogicalRDD` comes back with
    * unknown partitioning and re-shuffles the EDGES — the graph-sized
    * side — every round (observed in the r8 plan audit). With the
    * cache, each round's rank join consumes the src clustering in
    * place, so the only per-round edge-sized movement is gone; the dst
    * message aggregation (node-sized) is the round's one shuffle.
    * Callers unpersist after the final iterate is materialized. */
  private[graft] def prEdges(e: DataFrame): DataFrame = {
    val ow = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    e.join(ow, "src").repartition(col("src")).cache()
  }

  /** One PageRank round: rank join on src (exchange-free against the
    * src-partitioned staged edge frame) then the dst-keyed message
    * aggregation — the round's single shuffle. Package-visible so
    * PlanAuditSpec can pin that shape. */
  private[graft] def prRound(ew: DataFrame, r: DataFrame,
      damping: Double, base: Long): DataFrame =
    ew.join(r, ew("src") === r("id"))
      .select(col("dst"),
        round(lit(damping) * col("r") * col("w") / col("ow"))
          .cast("long").as("t"))
      .groupBy(col("dst"))
      .agg((sum(col("t")) + base).as("r"))
      .select(col("dst").as("id"), col("r"))

  /** Per-node triangle counts over an UNDIRECTED edge list (a, b),
    * a ≠ b, by the degree-ordered orientation algorithm (Suri & Vassilvitskii,
    * WWW'11 "Counting Triangles and the Curse of the Last Reducer"):
    * orient every edge from its lower-(degree, id) endpoint to the
    * higher one, build wedges only from each node's ORIENTED neighbor
    * list, and close them against the oriented edge set. The
    * orientation is the scale story: a hub of degree Δ has oriented
    * out-degree O(√m), so wedge volume is O(m^{3/2}) total instead of
    * Σ deg² — the "last reducer" never happens.
    *
    * Returns (id, n_tri) for every node in ≥ 1 triangle. Exact integer
    * counts — trivially deterministic.
    *
    * Shape: two aggregations (degrees, wedge grouping is implicit in
    * the self-join) and two equi-joins, all on node/edge keys.
    *
    * The oriented edge frame is STAGED (one eager materialization):
    * it feeds both wedge sides and the closure set, and everything the
    * caller piped in sits below it — the r16 q186 before-plan
    * re-executed the caller's ENTIRE co-purchase pair-mining pipeline
    * once per consumer subtree (30 lineitem scans, 32 pair-expansion
    * Generates in one plan). A `persist` was tried first and measured
    * SLOWER than the recomputation at sf0.1 (1.68 → 2.4-3.4 s full
    * q186: the InMemoryRelation pins pre-AQE plan choices below every
    * consumer), while Stage hands AQE a materialized LogicalRDD with
    * real sizes. The frame is the oriented dup/co-occurrence sliver —
    * edge-sized, never corpus-sized. */
  def triangleCounts(undirected: DataFrame): DataFrame = {
    val e = undirected.select(
        least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // orient by the (degree, id) total order: lo -> hi
    val oriented = graft.core.Stage(e
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u"), col("e.v")))
    // wedges u -> (v, w) from u's oriented neighbors, v < w in the
    // SAME orientation order is not needed: close (v, w) against the
    // oriented edge set directly (each triangle has exactly ONE node
    // with two oriented out-edges into it — exactly-once by design)
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
      .where(col("v") < col("w"))
    // canonicalize the closure edge numerically so the join stays a
    // pure equi-join on (v, w) — an OR of the two orientations would
    // degenerate to a nested-loop join
    val closures = oriented
      .select(least(col("u"), col("v")).as("v"),
        greatest(col("u"), col("v")).as("w"))
    val tris = wedges.join(closures, Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }
}
