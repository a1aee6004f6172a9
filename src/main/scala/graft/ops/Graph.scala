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
    * `edges` must contain each undirected edge in BOTH directions. */
  def pageRank(edges: DataFrame, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank needs iters >= 1")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
    val ew = prEdges(e)
    val nodes = graft.core.Stage(
      e.select(col("src").as("id")).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    // constants in the same arithmetic shape the SQL oracle uses —
    // HALF_UP on the exact double value (math.round's floor(x+0.5)
    // double-rounds near halves; SQL round does not)
    def rhu(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val r0 = rhu(1000000000.0 / n)
    val base = rhu((1 - damping) * 1000000000.0 / n)
    var r = nodes.select(col("id"), lit(r0).as("r"))
    try {
      (1 to iters).foreach { i =>
        val contrib = prRound(ew, r, damping, base)
        // lineage truncation every 5 rounds — without ANY truncation the
        // plan nests one join deeper per iteration and a recompute
        // cascades; truncating EVERY round pays a full materialization
        // job per iteration. Five nested rounds stay a flat chain of
        // shuffle stages inside one job (measured fastest; trajectory
        // identical by construction)
        r = if (i % 5 == 0 || i == iters) graft.core.Stage(contrib)
            else contrib
      }
    } finally {
      // the final iterate is materialized (Stage is eager), so the
      // cached edge frame can be released before returning — and a
      // FAILED iteration must release it too, or each crashed call pins
      // a graph-sized copy in this long-lived session's cache
      ew.unpersist(false)
    }
    r.select(col("id"), (col("r").cast("double") / 1e9).as("rank"))
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
    * the self-join) and two equi-joins, all on node/edge keys. */
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
    val oriented = e
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u"), col("e.v"))
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
