package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import Q._

/** Statistical / analytical operators: exact-arithmetic correlation and
  * dispersion, ntile bucketing, lead/lag deltas, grouping sets,
  * time-series gap filling, range-frame moving windows, dictionary-level
  * fuzzy matching, and the Lloyd-refined IVF quantizer (rows-only).
  *
  * Cross-engine determinism strategy (see [[Q]]): every aggregate that
  * feeds a DOUBLE result is first computed as an EXACT integer/decimal
  * sum (order-free under any shuffle schedule), and only the final
  * arithmetic happens in IEEE754 — identical in Spark and DuckDB.
  */
object Statistics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  val defs: Map[String, QueryDef] = Map(

    // ---- Lloyd-refined IVF assignment (no SQL oracle: iterative ML) -----
    // Rows-only check; cross-engine determinism is instead proven by the
    // TemporalSpec partition-independence test (bit-identical under
    // repartition), and the IVF subset property in OpsSpec.
    "q73_kmeans_refine" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.VectorOps.kmeansRefine(t(spark, dir, "embeddings"),
            nCells = 8, iters = 2)
          .select(col("vec_id"), col("cell_id"), round(col("dist2"), 4)
            .as("dist2"))
          .orderBy(col("vec_id")),
      oracle = None),

    // ---- the SAME iterative path, first Lloyd step unrolled in SQL ------
    // Anchors q73's loop with a real hash-matched oracle: the seed
    // assignment is all integer-valued doubles (exact, order-free sums)
    // and the refreshed per-(cell, dim) stats are exact int64 sums +
    // counts + one IEEE division — every value engine-exact. Runs through
    // the same seedCentroids/assignToCentroids/centroidStats code
    // kmeansRefine iterates.
    "q73b_kmeans_iter1" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.VectorOps.kmeansStep(t(spark, dir, "embeddings"), nCells = 8)
          .orderBy(col("cell_id"), col("g")),
      oracle = Some(s"""
        WITH ${graft.queries.LlmOps.quantCte},
        seedids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS cell_id
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        cents AS (SELECT cell_id, g, CAST(x AS DOUBLE) AS cm
          FROM xv JOIN seedids USING (vec_id)),
        d AS (SELECT xv.vec_id, cents.cell_id,
            SUM((CAST(x AS DOUBLE) - cm) * (CAST(x AS DOUBLE) - cm)) AS dist2
          FROM xv JOIN cents USING (g) GROUP BY 1, 2),
        asg AS (SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist2, cell_id) AS rn FROM d)
          WHERE rn = 1)
        SELECT cell_id, g, CAST(SUM(x) AS BIGINT) AS s,
          COUNT(*) AS c, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS cm
        FROM xv JOIN asg USING (vec_id)
        GROUP BY cell_id, g ORDER BY cell_id, g""")),

    // ---- Exact-arithmetic correlation / stddev ---------------------------
    // corr/stddev from single-pass integer co-moments: cent-scaled
    // quantities and prices summed under DECIMAL(38,0) (exact at any SF;
    // the int64 products are bounded by 1e14 per row). The final formula
    // runs on doubles converted from exact integers — totals stay under
    // 2^63 through sf1, where both engines' integer->double conversion is
    // round-to-nearest — so the result is bit-identical and the round(6)
    // is belt-and-braces.
    "q74_stats_moments" -> QueryDef(
      build = (spark, dir) => {
        val q = cents(col("l_quantity"))
        val p = cents(col("l_extendedprice"))
        val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
        fan(t(spark, dir, "lineitem"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast(LongType).as("n"),
            sum(q.cast(DecimalType(38, 0))).as("sq"),
            sum(p.cast(DecimalType(38, 0))).as("sp"),
            sum((q * q).cast(DecimalType(38, 0))).as("sqq"),
            sum((p * p).cast(DecimalType(38, 0))).as("spp"),
            sum((q * p).cast(DecimalType(38, 0))).as("sqp"))
          .select(col("l_returnflag"), col("n"),
            round((d(col("n")) * d(col("sqp")) - d(col("sq")) * d(col("sp")))
              / sqrt((d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq")))
                * (d(col("n")) * d(col("spp")) - d(col("sp")) * d(col("sp")))),
              6).as("corr_qty_price"),
            round(sqrt((d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq")))
                / (d(col("n")) * (d(col("n")) - lit(1.0)))) / 100.0, 6)
              .as("stddev_qty"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some(raw"""
        WITH m AS (
          SELECT l_returnflag,
                 COUNT(*)::BIGINT AS n,
                 SUM(CAST(round(l_quantity*100) AS BIGINT)) AS sq,
                 SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS sp,
                 SUM(CAST(round(l_quantity*100) AS BIGINT)
                   * CAST(round(l_quantity*100) AS BIGINT)) AS sqq,
                 SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round(l_extendedprice*100) AS BIGINT)) AS spp,
                 SUM(CAST(round(l_quantity*100) AS BIGINT)
                   * CAST(round(l_extendedprice*100) AS BIGINT)) AS sqp
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round((n::DOUBLE * sqp::DOUBLE - sq::DOUBLE * sp::DOUBLE)
                 / sqrt((n::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                      * (n::DOUBLE * spp::DOUBLE - sp::DOUBLE * sp::DOUBLE)),
                 6) AS corr_qty_price,
               round(sqrt((n::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0))) / 100.0, 6) AS stddev_qty
        FROM m ORDER BY l_returnflag""")),

    // ---- Ntile decile bucketing -----------------------------------------
    // Both engines implement SQL-standard NTILE (first (rows mod k)
    // buckets get the extra row); the (price, orderkey) sort is total, so
    // bucket boundaries are engine-independent.
    "q75_ntile_deciles" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "orders")
          .withColumn("decile", ntile(10).over(
            Window.orderBy(col("o_totalprice"), col("o_orderkey")))
            .cast(LongType))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("decile")),
      oracle = Some("""
        SELECT decile, COUNT(*) AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM (SELECT o_totalprice,
                     NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile
              FROM orders)
        GROUP BY decile ORDER BY decile""")),

    // ---- Scale-safe NTILE (range bucketing via exact boundaries) --------
    // q75 is the Catalyst-parity row: a GLOBAL ntile plans a
    // single-partition window (Spark warns about it in Verify). This row
    // is the engine's scale path for the same semantics:
    // Quantile.bucketize solves the k-1 exact boundary ranks by
    // histogram bisection (≤ ⌈64/13⌉+1 shared passes) and assigns
    // buckets with a broadcast range lookup — no global sort, no
    // one-task window. Bit-exact vs NTILE on the unique o_orderkey.
    "q192_ntile_bucketize" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Quantile.bucketize(
            t(spark, dir, "orders"), col("o_orderkey"), 8)
          .select(col("o_orderkey"),
            col("bucket").cast(LongType).as("bucket"))
          .orderBy(col("o_orderkey")),
      oracle = Some("""
        SELECT o_orderkey,
               NTILE(8) OVER (ORDER BY o_orderkey) AS bucket
        FROM orders ORDER BY o_orderkey""")),

    // ---- Per-group scale-safe NTILE -------------------------------------
    // A PARTITIONED window is only as parallel as its groups: one
    // corpus-sized group (the dominant source in a per-source quality
    // split) is still one task. bucketizeGrouped bisects every
    // (group, boundary) pair through shared histogram passes and
    // assigns buckets with a broadcast per-group range lookup.
    // Bit-exact vs NTILE on the per-group-unique doc_id.
    "q193_grouped_ntile" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Quantile.bucketizeGrouped(
            t(spark, dir, "documents"), col("source"), col("doc_id"), 4)
          .select(col("doc_id"), col("source"),
            col("bucket").cast(LongType).as("bucket"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id, source,
               NTILE(4) OVER (PARTITION BY source ORDER BY doc_id)
                 AS bucket
        FROM documents ORDER BY doc_id""")),

    // ---- Lead/lag inter-event gaps --------------------------------------
    // Per-user event cadence: microsecond gaps from LAG over the total
    // (ts, event_id) order; the mean divides an exact int64 gap sum.
    "q76_event_gaps" -> QueryDef(
      build = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(spark, dir, "events")
          .withColumn("gap_us",
            graft.functions.Dialect.tsUs(col("ts")) - lag(graft.functions.Dialect.tsUs(col("ts")), 1).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("gap_us")).as("total_gap"),
            max(col("gap_us")).as("max_gap_us"))
          .select(col("user_id"), col("n_events"),
            // NO round(): decimal-rounding a binary double differs between
            // the engines in the last ulp (Spark rounds the exact decimal
            // expansion, DuckDB scales-and-rounds); the bare quotient of
            // two exact int64s is already bit-deterministic IEEE754
            (col("total_gap").cast(DoubleType)
              / (col("n_events") - lit(1)).cast(DoubleType))
              .as("avg_gap_us"),
            col("max_gap_us"))
          .filter(col("n_events") > 1)
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               SUM(gap_us)::DOUBLE / (COUNT(*) - 1)::DOUBLE
                 AS avg_gap_us,
               MAX(gap_us) AS max_gap_us
        FROM g GROUP BY user_id HAVING COUNT(*) > 1
        ORDER BY user_id""")),

    // ---- GROUPING SETS (beyond ROLLUP/CUBE: a chosen subset) ------------
    "q77_grouping_sets" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderpriority")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).cast(DoubleType).as("rev_cents"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
            col("n"), (col("rev_cents") / 100.0).as("revenue"))
          .orderBy(col("status"), col("priority")),
      oracle = Some("""
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        ORDER BY status, priority""")),

    // ---- Time-series gap filling ----------------------------------------
    // Dense daily spine via sequence() over the global [min, max] date
    // range (two scalars broadcast from a tiny agg — no driver collect),
    // left-joined to the daily rollup; missing days surface as 0.
    // At 100 TB the spine is still only O(days) rows — the join
    // broadcasts the spine, so the fact side never shuffles.
    "q78_gap_fill" -> QueryDef(
      build = (spark, dir) => {
        val orders = t(spark, dir, "orders")
        val daily = orders
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("o_totalprice"))).as("rev_cents"))
        val bounds = orders.agg(
          to_date(min(col("o_orderdate"))).as("d0"),
          to_date(max(col("o_orderdate"))).as("d1"))
        val spine = bounds
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        spine.join(daily, Seq("day"), "left")
          .select(col("day"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"),
            (coalesce(col("rev_cents"), lit(0L)).cast(DoubleType) / 100.0)
              .as("revenue"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH bounds AS (
          SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
                 CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders),
        spine AS (
          SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
            AS day FROM bounds),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt,
                 SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_cents
          FROM orders GROUP BY 1)
        SELECT s.day, COALESCE(d.cnt, 0) AS n_orders,
               COALESCE(d.rev_cents, 0)::DOUBLE / 100.0 AS revenue
        FROM spine s LEFT JOIN daily d USING (day)
        ORDER BY s.day""")),

    // ---- Range-frame moving window (7-day revenue) ----------------------
    // RANGE frame over integer epoch-days: the moving sum adds exact
    // int64 cent totals, so shuffle order can't change the result. A
    // single unpartitioned window over O(days) pre-aggregated rows —
    // the full-table aggregation upstream is what scales, the window
    // input stays tiny at any SF.
    "q79_moving_revenue" -> QueryDef(
      build = (spark, dir) => {
        val daily = t(spark, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
          .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01")))
        val w = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
        daily
          .select(col("day"),
            (col("rev_cents").cast(DoubleType) / 100.0).as("revenue"),
            (sum(col("rev_cents")).over(w).cast(DoubleType) / 100.0)
              .as("rev_7d"),
            count(lit(1)).over(w).as("days_in_window"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_cents,
                 CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS epoch_day
          FROM orders GROUP BY 1, 3)
        SELECT day, rev_cents::DOUBLE / 100.0 AS revenue,
               (SUM(rev_cents) OVER (ORDER BY epoch_day
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))::DOUBLE
                 / 100.0 AS rev_7d,
               COUNT(*) OVER (ORDER BY epoch_day
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS days_in_window
        FROM daily ORDER BY day""")),

    // ---- Dictionary-level fuzzy match (edit distance) -------------------
    // Fuzzy joins at scale run on the DISTINCT value dictionary, not the
    // fact table: distinct p_name is O(vocabulary) regardless of row
    // count, the pairwise pass is dictionary², and results broadcast
    // back. Both engines implement classic Levenshtein.
    "q80_fuzzy_pairs" -> QueryDef(
      build = (spark, dir) => {
        val dict = t(spark, dir, "part").select(col("p_name")).distinct()
        dict.as("a").join(dict.select(col("p_name").as("b_name")).as("b"),
            col("p_name") < col("b_name"))
          .select(col("p_name").as("name_a"), col("b_name").as("name_b"),
            levenshtein(col("p_name"), col("b_name")).cast(LongType)
              .as("dist"))
          .filter(col("dist") <= 3)
          .orderBy(col("name_a"), col("name_b"))
      },
      oracle = Some("""
        WITH dict AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM dict a JOIN dict b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
        ORDER BY name_a, name_b""")),

    // ---- C4-style passage-level exact dedup -----------------------------
    "q81_passage_dedup" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.DedupOps.passageDedup(t(spark, dir, "documents"), width = 8)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
          FROM documents),
        chunks AS (
          SELECT doc_id, g AS pos,
                 array_to_string(tk[(g*8+1):((g+1)*8)], ' ') AS passage
          FROM (SELECT doc_id, tk,
                       unnest(generate_series(0, (len(tk)-1)//8)) AS g
                FROM toks)),
        ranked AS (
          SELECT doc_id, pos, passage,
                 row_number() OVER (PARTITION BY passage
                                    ORDER BY doc_id, pos) AS rn
          FROM chunks)
        SELECT doc_id, COUNT(*) AS n_passages,
               SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
                 ORDER BY pos), '') AS kept_text
        FROM ranked GROUP BY doc_id ORDER BY doc_id""")),

    // ---- exact duplicate-SPAN detection (Lee et al. substring dedup) ----
    // 5-token rolling fingerprints → corpus-wide dup count → per-doc
    // gaps-and-islands merge into maximal spans ≥ 10 tokens. Catches
    // boilerplate runs pasted MID-document that whole-doc and passage
    // dedup both miss.
    "q125_dup_spans" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.DedupOps.duplicateSpans(t(spark, dir, "documents"),
            k = 5, minSpan = 10)
          .orderBy(col("doc_id"), col("span_id")),
      oracle = Some(s"""
        WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
        g AS (SELECT doc_id, p,
                ${h32Sql("array_to_string(toks[p:p+4], ' ')")} AS kg
              FROM (SELECT doc_id, toks,
                      unnest(generate_series(1, greatest(len(toks) - 4, 1)))
                        AS p
                    FROM tk)
              WHERE p + 4 <= len(toks)),
        dup AS (SELECT kg FROM g GROUP BY kg HAVING COUNT(*) >= 2),
        dp AS (SELECT doc_id, p FROM g JOIN dup USING (kg)),
        isl AS (SELECT doc_id, p,
                  MAX(p + 4) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_reach
                FROM dp),
        sp AS (SELECT doc_id, p,
                 CAST(SUM(CASE WHEN prev_reach IS NULL OR p > prev_reach
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS span_id
               FROM isl)
        SELECT doc_id, span_id, MIN(p) AS start_tok,
               MAX(p) + 4 AS end_tok,
               MAX(p) + 4 - MIN(p) + 1 AS n_toks
        FROM sp GROUP BY doc_id, span_id
        HAVING MAX(p) + 4 - MIN(p) + 1 >= 10
        ORDER BY doc_id, span_id"""),
      bench = true),

    // ---- duplicate-span REMOVAL (the actionable half of q125) -----------
    "q127_span_strip" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.DedupOps.stripDuplicateSpans(t(spark, dir, "documents"),
            k = 5, minSpan = 10)
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
        g AS (SELECT doc_id, p,
                ${h32Sql("array_to_string(toks[p:p+4], ' ')")} AS kg
              FROM (SELECT doc_id, toks,
                      unnest(generate_series(1, greatest(len(toks) - 4, 1)))
                        AS p
                    FROM tk)
              WHERE p + 4 <= len(toks)),
        dup AS (SELECT kg FROM g GROUP BY kg HAVING COUNT(*) >= 2),
        dp AS (SELECT doc_id, p FROM g JOIN dup USING (kg)),
        isl AS (SELECT doc_id, p,
                  MAX(p + 4) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_reach
                FROM dp),
        sp AS (SELECT doc_id, p,
                 CAST(SUM(CASE WHEN prev_reach IS NULL OR p > prev_reach
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS span_id
               FROM isl),
        spans AS (SELECT doc_id, MIN(p) AS start_tok, MAX(p) + 4 AS end_tok
                  FROM sp GROUP BY doc_id, span_id
                  HAVING MAX(p) + 4 - MIN(p) + 1 >= 10),
        toks2 AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos] AS tok
                  FROM (SELECT doc_id, toks,
                          unnest(generate_series(1, greatest(len(toks), 1)))
                            AS pos
                        FROM tk)
                  WHERE pos <= len(toks)),
        kept AS (SELECT t.doc_id, COUNT(*) AS n_kept,
                   COALESCE(string_agg(tok, ' ' ORDER BY pos), '')
                     AS clean_text
                 FROM toks2 t
                 WHERE NOT EXISTS (SELECT 1 FROM spans s
                   WHERE s.doc_id = t.doc_id
                     AND t.pos BETWEEN s.start_tok AND s.end_tok)
                 GROUP BY t.doc_id),
        base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM tk)
        SELECT b.doc_id, b.n_tok,
          b.n_tok - COALESCE(k.n_kept, 0) AS n_removed,
          COALESCE(k.clean_text, '') AS clean_text
        FROM base b LEFT JOIN kept k USING (doc_id)
        ORDER BY doc_id"""),
      bench = true),

    // ---- Z-order (Morton) clustering key --------------------------------
    // The write-side layout op is Layout.zorderBy (range-partition +
    // sort on the interleaved key); this query checks the z-value math
    // itself: per high-order z-bucket, the row count and the bounding
    // box of both source columns — exactly the per-file zonemap a
    // z-ordered write produces.
    "q82_zorder_buckets" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "orders")
          .select(
            graft.ops.Layout.zValue(
              col("o_custkey").bitwiseAND(lit(65535L)),
              col("o_orderkey").bitwiseAND(lit(65535L))).as("z"),
            col("o_custkey"), col("o_orderkey"))
          .groupBy(shiftright(col("z"), 16).as("z_bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("o_custkey")).as("min_cust"),
            max(col("o_custkey")).as("max_cust"),
            min(col("o_orderkey")).as("min_order"),
            max(col("o_orderkey")).as("max_order"))
          .orderBy(col("z_bucket")),
      oracle = Some(s"""
        WITH z AS (
          SELECT ${graft.ops.Layout.zValueSql(
            "(o_custkey & 65535)", "(o_orderkey & 65535)")} AS z,
                 o_custkey, o_orderkey
          FROM orders)
        SELECT (z >> 16) AS z_bucket, COUNT(*) AS n,
               MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
               MIN(o_orderkey) AS min_order, MAX(o_orderkey) AS max_order
        FROM z GROUP BY 1 ORDER BY z_bucket""")),

    // ---- Native session windows (Structured-Streaming-compatible) ------
    // Spark's session_window in batch mode — the same operator runs
    // unchanged under readStream + watermark (see streaming.BronzeStream).
    // Oracle reconstructs gap sessions with LAG + running break count.
    "q83_session_window" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            col("sw.end").as("session_end"), col("n_events"))
          .orderBy(col("user_id"), col("session_start")),
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        m AS (
          SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                           OR us - LAG(us) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        s AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start""")),

    // ---- Per-dimension embedding statistics ------------------------------
    // Column-wise corpus stats over the vector column: one posexplode +
    // a (dim)-keyed aggregation — 64·n rows shuffled as partial sums
    // only. Means divide exact int64 sums of the quantized components,
    // so the doubles are bit-identical cross-engine. Overflow headroom:
    // the rounding numerator 2*abs(sx*10)+n wraps int64 at ~4.6e12
    // vectors per dim (|x| <= 1e5), and only on the Spark side — the
    // DuckDB oracle's SUM(int) is HUGEINT and stays exact — so past
    // that, widen sx and the numerator to DECIMAL(38,0).
    "q84_dim_stats" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "embeddings")
          .select(posexplode(graft.ops.VectorOps.quantized(col("embedding")))
            .as(Seq("pos0", "x")))
          .select((col("pos0") + 1).as("dim"), col("x"))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            min(col("x")).as("min_q"),
            max(col("x")).as("max_q"))
          .select(col("dim").cast(LongType).as("dim"), col("n"),
            // round(sx/n/1e5, 6) computed in EXACT integer arithmetic:
            // round-half-away-from-zero of the rational (10*sx)/n is
            // sign * floor((2*|10*sx| + n) / (2*n)). Rounding the DOUBLE
            // quotient instead is engine-dependent exactly at ties
            // (Spark rounds the shortest decimal repr HALF_UP, DuckDB
            // rounds the binary double) — a tie the skew fixture's
            // duplicated vectors actually produce.
            (expr("CAST((CASE WHEN sx >= 0 THEN 1 ELSE -1 END) * " +
              "((2*abs(sx*10) + n) DIV (2*n)) AS DOUBLE)") / 1e6)
              .as("mean"),
            col("min_q"), col("max_q"))
          .orderBy(col("dim")),
      oracle = Some(s"""
        WITH ${LlmOps.quantCte}
        SELECT g AS dim, COUNT(*) AS n,
               CAST((CASE WHEN SUM(x) >= 0 THEN 1 ELSE -1 END) *
                 ((2*abs(SUM(x)*10) + COUNT(*)) // (2*COUNT(*)))
                 AS DOUBLE) / 1e6 AS mean,
               MIN(x) AS min_q, MAX(x) AS max_q
        FROM xv GROUP BY g ORDER BY dim""")),

    // ---- Ordered funnel (view -> click -> purchase) ----------------------
    // Three keyed passes over events, each a conditional-min aggregation;
    // no window, no self-join explosion — the per-user state is three
    // timestamps regardless of event count.
    "q85_funnel" -> QueryDef(
      build = (spark, dir) => {
        val ev = t(spark, dir, "events")
        val s1 = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"))
        val s2 = ev.join(s1, "user_id").groupBy(col("user_id"), col("tv"))
          .agg(min(when(col("event_type") === "click"
            && col("ts") > col("tv"), col("ts"))).as("tc"))
        val s3 = ev.join(s2, "user_id")
          .groupBy(col("user_id"), col("tv"), col("tc"))
          .agg(min(when(col("event_type") === "purchase"
            && col("ts") > col("tc"), col("ts"))).as("tp"))
        s3.agg(
          sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_view_click"),
          sum(when(col("tp").isNotNull, 1L).otherwise(0L))
            .as("n_view_click_purchase"))
      },
      oracle = Some("""
        WITH s1 AS (
          SELECT user_id,
                 MIN(ts) FILTER (WHERE event_type = 'view') AS tv
          FROM events GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, s1.tv,
                 MIN(e.ts) FILTER (WHERE e.event_type = 'click'
                                     AND e.ts > s1.tv) AS tc
          FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id, s1.tv),
        s3 AS (
          SELECT e.user_id, s2.tv, s2.tc,
                 MIN(e.ts) FILTER (WHERE e.event_type = 'purchase'
                                     AND e.ts > s2.tc) AS tp
          FROM events e JOIN s2 USING (user_id)
          GROUP BY e.user_id, s2.tv, s2.tc)
        SELECT SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_view,
               SUM(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_view_click,
               SUM(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_view_click_purchase
        FROM s3""")),

    // ---- Cohort retention matrix ----------------------------------------
    // Cohort = a user's first active day; cell (cohort_day, offset) =
    // distinct users active `offset` days after their cohort day. Pure
    // integer date arithmetic — deterministic by construction.
    "q86_retention" -> QueryDef(
      build = (spark, dir) => {
        val ev = t(spark, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val cohort = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.join(cohort, "user_id")
          .select(col("user_id"), col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("offset"))
          .filter(col("offset") <= 7)
          .distinct()
          .groupBy(col("cohort_day"), col("offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .select(col("cohort_day"), col("offset").cast(LongType)
            .as("offset"), col("n_users"))
          .orderBy(col("cohort_day"), col("offset"))
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        cohort AS (SELECT user_id, MIN(day) AS cohort_day
                   FROM ev GROUP BY user_id)
        SELECT cohort_day, (day - cohort_day)::BIGINT AS "offset",
               COUNT(DISTINCT user_id) AS n_users
        FROM ev JOIN cohort USING (user_id)
        WHERE day - cohort_day <= 7
        GROUP BY cohort_day, "offset"
        ORDER BY cohort_day, "offset" """)),

    // ---- Hopping (sliding) windows in batch ------------------------------
    // window(ts, 1h, 30m): every event lands in exactly two windows.
    // The same expression runs under readStream + watermark. Window
    // starts exported as epoch-microsecond ints to sidestep engine
    // timestamp rendering.
    "q87_hopping_window" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .select(graft.functions.Dialect.tsUs(col("w.start")).as("w_start_us"),
            col("event_type"), col("n"), col("n_users"))
          .orderBy(col("w_start_us"), col("event_type")),
      oracle = Some("""
        WITH e AS (
          SELECT event_type, user_id,
                 (epoch_us(ts) // 1800000000) * 1800000000
                   - j * 1800000000 AS w_start_us
          FROM events,
               (SELECT unnest(generate_series(0, 1)) AS j))
        SELECT w_start_us, event_type, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM e GROUP BY 1, 2 ORDER BY w_start_us, event_type""")),

    // ---- streaming drift monitor, batch face (same plan both modes) -----
    // the ONE floating fold in the TV report (per-window sum over ≤4
    // bucket contributions) is order-dependent at the 1e-16 level; the
    // op rounds to 9 decimals, far above that noise, so the hash-match
    // against DuckDB's differently-ordered SUM is exact
    "q162_stream_drift" -> QueryDef(
      build = (spark, dir) => {
        import spark.implicits._
        val ev = t(spark, dir, "events").select(col("ts"),
          least(floor(col("value") / 125.0), lit(3)).cast("long").as("bucket"))
        val baseline = Seq((0L, 0.25), (1L, 0.25), (2L, 0.25), (3L, 0.25))
          .toDF("bucket", "p")
        graft.streaming.DriftStream.windowedDrift(ev, baseline, col("bucket"))
          .select(
            graft.functions.Dialect.tsUs(col("window_start")).as("w_start_us"),
            col("n_events"), col("tv"))
          .orderBy(col("w_start_us"))
      },
      oracle = Some("""
        WITH e AS (SELECT
            (epoch_us(ts) // 3600000000) * 3600000000 AS w_start_us,
            least(CAST(floor(value / 125.0) AS BIGINT), 3) AS bucket
          FROM events),
        h AS (SELECT w_start_us, bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM e GROUP BY 1, 2),
        wb AS (SELECT h.w_start_us, h.n, COALESCE(b.p, 0.0) AS p
               FROM h LEFT JOIN (VALUES (0, 0.25), (1, 0.25), (2, 0.25),
                 (3, 0.25)) AS b(bucket, p) ON b.bucket = h.bucket),
        t AS (SELECT w_start_us, CAST(SUM(n) AS BIGINT) AS ntot
              FROM h GROUP BY 1)
        SELECT wb.w_start_us, CAST(SUM(wb.n) AS BIGINT) AS n_events,
          round((SUM(abs(CAST(wb.n AS DOUBLE) / t.ntot - wb.p))
            + (1.0 - SUM(wb.p))) / 2.0, 9) AS tv
        FROM wb JOIN t USING (w_start_us)
        GROUP BY wb.w_start_us ORDER BY wb.w_start_us""")),

    // ---- UNPIVOT (wide metrics -> long) ----------------------------------
    "q88_unpivot" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(cents(col("l_quantity"))).cast(DoubleType).as("qty_c"),
            sum(cents(col("l_extendedprice"))).cast(DoubleType).as("price_c"),
            count(lit(1)).cast(DoubleType).as("cnt"))
          .select(col("l_returnflag"),
            expr("""stack(3, 'sum_qty', qty_c / 100.0,
                             'sum_price', price_c / 100.0,
                             'n_rows', cnt) AS (metric, value)"""))
          .orderBy(col("l_returnflag"), col("metric")),
      oracle = Some("""
        WITH wide AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
                 CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                   AS DOUBLE) / 100.0 AS sum_price,
                 COUNT(*)::DOUBLE AS n_rows
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, value
        FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_rows))
        ORDER BY l_returnflag, metric""")),

    // ---- Incremental aggregate maintenance ------------------------------
    // Daily revenue built by folding THREE disjoint batches into
    // persisted mergeable state (gold.IncrementalAgg) — the oracle is
    // the one-shot aggregation, so a hash match proves incremental ==
    // full recompute, bit-exact.
    "q89_incremental_agg" -> QueryDef(
      build = (spark, dir) => {
        val orders = t(spark, dir, "orders")
        val statePath = java.nio.file.Files
          .createTempDirectory("graft-incagg-").toString + "/state"
        val measures = Map("price_c" -> cents(col("o_totalprice")))
        var state: DataFrame = null
        (0 until 3).foreach { i =>
          val batch = orders.filter(col("o_orderkey") % 3 === i)
            .select(to_date(col("o_orderdate")).as("day"),
              col("o_totalprice"))
          state = graft.gold.IncrementalAgg.update(
            spark, statePath, batch, Seq("day"), measures)
        }
        state.select(col("day"), col("n"),
          (col("sum_price_c").cast(DoubleType) / 100.0).as("revenue"),
          (col("min_price_c").cast(DoubleType) / 100.0).as("min_price"),
          (col("max_price_c").cast(DoubleType) / 100.0).as("max_price"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
               SUM(CAST(round(o_totalprice*100) AS BIGINT))::DOUBLE / 100.0
                 AS revenue,
               MIN(CAST(round(o_totalprice*100) AS BIGINT))::DOUBLE / 100.0
                 AS min_price,
               MAX(CAST(round(o_totalprice*100) AS BIGINT))::DOUBLE / 100.0
                 AS max_price
        FROM orders GROUP BY 1 ORDER BY day""")),

    // ---- Column profiling (DuckDB SUMMARIZE analog) ---------------------
    // One pass computes every column's profile as parallel aggregate
    // COLUMNS (no per-column re-scan), then pivots long via stack —
    // n-columns × O(1) aggregates, a single partial-agg shuffle.
    "q90_profile" -> QueryDef(
      build = (spark, dir) => {
        val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        val aggs = cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
            countDistinct(col(c)).as(s"dist_$c"),
            min(length(col(c).cast(StringType))).cast(LongType)
              .as(s"minl_$c"),
            max(length(col(c).cast(StringType))).cast(LongType)
              .as(s"maxl_$c"))
        } :+ count(lit(1)).as("n_rows")
        val stacked = cols.map(c =>
          s"'$c', null_$c, dist_$c, minl_$c, maxl_$c").mkString(", ")
        t(spark, dir, "customer")
          .agg(aggs.head, aggs.tail: _*)
          .select(col("n_rows"), expr(s"""stack(${cols.size}, $stacked)
            AS (column_name, n_null, n_distinct, min_len, max_len)"""))
          .select(col("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_len"), col("max_len"))
          .orderBy(col("column_name"))
      },
      oracle = Some(Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .map(c => s"""
          SELECT '$c' AS column_name, COUNT(*) AS n_rows,
                 SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_null,
                 COUNT(DISTINCT $c) AS n_distinct,
                 MIN(length($c::VARCHAR))::BIGINT AS min_len,
                 MAX(length($c::VARCHAR))::BIGINT AS max_len
          FROM customer""")
        .mkString("", " UNION ALL ", " ORDER BY column_name"))),

    // ---- Constraint / data-quality suite --------------------------------
    // PK uniqueness, FK orphans (left-anti), domain ranges — each check
    // an aggregate or anti-join count, unioned into one report. The
    // anti-joins broadcast the PK side when it fits, else shuffle on
    // the key — never a full cross comparison.
    "q91_constraints" -> QueryDef(
      build = (spark, dir) => {
        val orders = t(spark, dir, "orders")
        val lineitem = t(spark, dir, "lineitem")
        val customer = t(spark, dir, "customer")
        val nation = t(spark, dir, "nation")
        def one(name: String, n: DataFrame) = n.select(lit(name)
          .as("check_name"), col("n_violations"))
        val pkDup = orders.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("n_violations"))
        val fkOrphanLi = lineitem.join(orders,
            lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        val fkOrphanCust = customer.join(nation,
            customer("c_nationkey") === nation("n_nationkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        val rangeQty = lineitem.filter(col("l_quantity") <= 0
            || col("l_quantity") > 50)
          .agg(count(lit(1)).as("n_violations"))
        val nullName = customer.filter(col("c_name").isNull)
          .agg(count(lit(1)).as("n_violations"))
        one("pk_orders_unique", pkDup)
          .unionByName(one("fk_lineitem_orders", fkOrphanLi))
          .unionByName(one("fk_customer_nation", fkOrphanCust))
          .unionByName(one("range_quantity", rangeQty))
          .unionByName(one("null_customer_name", nullName))
          .orderBy(col("check_name"))
      },
      oracle = Some("""
        SELECT 'pk_orders_unique' AS check_name,
               (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                 GROUP BY 1 HAVING COUNT(*) > 1)) AS n_violations
        UNION ALL
        SELECT 'fk_lineitem_orders',
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
                 (SELECT o_orderkey FROM orders))
        UNION ALL
        SELECT 'fk_customer_nation',
               (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
                 (SELECT n_nationkey FROM nation))
        UNION ALL
        SELECT 'range_quantity',
               (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity <= 0 OR l_quantity > 50)
        UNION ALL
        SELECT 'null_customer_name',
               (SELECT COUNT(*) FROM customer WHERE c_name IS NULL)
        ORDER BY check_name""")),

    // ---- SCD2 interval building (change stream -> validity ranges) ------
    // Each user's events become type-2 history rows: valid_from = event
    // ts, valid_to = next event's ts (open for the latest). One keyed
    // window pass; state per key is one row lookahead.
    "q92_scd2" -> QueryDef(
      build = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
            sum(when(col("valid_to").isNotNull,
              graft.functions.Dialect.tsUs(col("valid_to")) - graft.functions.Dialect.tsUs(col("valid_from")))
              .otherwise(0L)).as("total_covered_us"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH v AS (
          SELECT user_id, ts AS valid_from,
                 LEAD(ts, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS valid_to
          FROM events)
        SELECT user_id, COUNT(*) AS n_versions,
               SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_current,
               SUM(CASE WHEN valid_to IS NOT NULL
                   THEN epoch_us(valid_to) - epoch_us(valid_from)
                   ELSE 0 END)::BIGINT AS total_covered_us
        FROM v GROUP BY user_id ORDER BY user_id""")),

    // ---- Stream-stream interval join (batch face) -----------------------
    // The SAME StreamJoin.attribute plan runs under two watermarked
    // MemoryStreams in StreamingSpec; here the batch mode is
    // oracle-checked: clicks attributed to the same user's error within
    // the preceding 10 minutes.
    "q93_stream_attribution" -> QueryDef(
      build = (spark, dir) =>
        graft.streaming.StreamJoin.attribute(t(spark, dir, "events"),
            causeType = "error", effectType = "click", gapSeconds = 600L)
          .select(col("cause_id"), col("effect_id"), col("user_id"))
          .orderBy(col("cause_id"), col("effect_id")),
      oracle = Some("""
        SELECT e.event_id AS cause_id, c.event_id AS effect_id, e.user_id
        FROM events e JOIN events c
          ON c.user_id = e.user_id AND c.event_type = 'click'
          AND c.ts >= e.ts
          AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
        WHERE e.event_type = 'error'
        ORDER BY cause_id, effect_id""")),

    // ---- Salted skew join, oracle-checked -------------------------------
    // Fact side salted by a row hash; the small side replicates
    // saltFactor ways so every (key, salt) bucket equi-joins — the skewed
    // key's rows spread over saltFactor reducers instead of one straggler.
    // The oracle is the PLAIN join: salting must be invisible in results.
    "q94_salted_join" -> QueryDef(
      build = (spark, dir) => {
        val ev = t(spark, dir, "events")
        val userDim = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("user_events"))
        graft.ops.Skew.saltedJoin(
            ev.select(col("event_id"), col("user_id"), col("event_type")),
            userDim, key = "user_id", saltFactor = 8)
          .groupBy(col("event_type"), col("user_events"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("user_events"))
      },
      oracle = Some("""
        WITH dim AS (SELECT user_id, COUNT(*) AS user_events
                     FROM events GROUP BY user_id)
        SELECT e.event_type, dim.user_events, COUNT(*) AS n
        FROM events e JOIN dim USING (user_id)
        GROUP BY 1, 2 ORDER BY event_type, user_events""")),

    // ---- Exact median / quantiles (interpolated, deterministic) ---------
    // percentile() sorts exactly; both engines interpolate continuous
    // quantiles as v[lo] + frac·(v[hi]−v[lo]) at index p·(n−1) over
    // exact 2-dp doubles, so results are bit-identical.
    "q95_exact_median" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            expr("percentile(o_totalprice, 0.5)").as("median_price"),
            expr("percentile(o_totalprice, 0.9)").as("p90_price"))
          .orderBy(col("o_orderstatus")),
      oracle = Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               quantile_cont(o_totalprice, 0.5) AS median_price,
               quantile_cont(o_totalprice, 0.9) AS p90_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- percentile-sketch rank-error bound (q57b pattern for the
    // quantile sketch family): percentile_approx at accuracy 100
    // guarantees the returned value's rank interval overlaps
    // [n/2 − n/100, n/2 + n/100]. Ties are handled by checking the
    // OVERLAP of [count(<apx)+1, count(≤apx)] with the tolerance band —
    // heavy tie mass at the median would otherwise fail a naive
    // count(≤apx) check. The oracle pins n and `true`; a sketch
    // violating its guarantee hash-mismatches.
    "q117_approx_percentile_bound" -> QueryDef(
      build = (spark, dir) => {
        val li = t(spark, dir, "lineitem")
        val apx = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(100))
            .as("apx"))
        li.join(broadcast(apx), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_quantity") < col("apx"), 1L).otherwise(0L))
              .as("rank_lo"),
            sum(when(col("l_quantity") <= col("apx"), 1L).otherwise(0L))
              .as("rank_hi"))
          .select(col("l_returnflag"), col("n"),
            (col("rank_lo").cast("double") < col("n") / 2.0 + col("n") / 100.0
              && col("rank_hi").cast("double") >=
                col("n") / 2.0 - col("n") / 100.0)
              .as("within_rank_error"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag, COUNT(*) AS n, TRUE AS within_rank_error
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Snapshot time travel -------------------------------------------
    // Build a versioned daily-revenue table in two commits (1996, then a
    // keyed merge of 1997); read BOTH versions back. The oracle derives
    // each version's content from the base table — a hash match proves
    // version-0 reads are untouched by the later commit.
    "q96_time_travel" -> QueryDef(
      build = (spark, dir) => {
        val table = java.nio.file.Files
          .createTempDirectory("graft-tt-").toString + "/daily"
        val orders = t(spark, dir, "orders")
        def dailyRev(yr: Int) = orders
          .filter(year(col("o_orderdate")) === yr)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
        graft.silver.Snapshots.commit(dailyRev(1996), table)
        graft.silver.Snapshots.commitMerged(dailyRev(1997), table,
          keys = Seq("day"))
        def summary(v: Long) = graft.silver.Snapshots
          .readVersion(spark, table, v)
          .agg(count(lit(1)).as("n_days"),
            (sum(col("rev_c")).cast(DoubleType) / 100.0).as("revenue"))
          .select(lit(v).as("version"), col("n_days"), col("revenue"))
        summary(0).unionByName(summary(1)).orderBy(col("version"))
      },
      oracle = Some("""
        SELECT 0::BIGINT AS version, COUNT(DISTINCT CAST(o_orderdate AS DATE))
                 AS n_days,
               SUM(CAST(round(o_totalprice*100) AS BIGINT))::DOUBLE / 100.0
                 AS revenue
        FROM orders WHERE year(o_orderdate) = 1996
        UNION ALL
        SELECT 1::BIGINT, COUNT(DISTINCT CAST(o_orderdate AS DATE)),
               SUM(CAST(round(o_totalprice*100) AS BIGINT))::DOUBLE / 100.0
        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        ORDER BY version""")),

    // ---- Change-data feed between snapshot versions ---------------------
    // v0 = daily revenue over even order keys; v1 = keyed merge of the
    // full aggregate. The diff tags each day insert (odd-only day),
    // update (value changed) or unchanged (dropped). The oracle
    // reclassifies from the base table; exact cent values make the
    // update comparison deterministic.
    "q97_change_feed" -> QueryDef(
      build = (spark, dir) => {
        val table = java.nio.file.Files
          .createTempDirectory("graft-cdc-").toString + "/daily"
        val orders = t(spark, dir, "orders")
        def dailyRev(df: DataFrame) = df
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
        graft.silver.Snapshots.commit(
          dailyRev(orders.filter(col("o_orderkey") % 2 === 0)), table)
        graft.silver.Snapshots.commitMerged(dailyRev(orders), table,
          keys = Seq("day"))
        graft.silver.Snapshots.changes(spark, table, 0L, 1L, Seq("day"))
          .groupBy(col("op"))
          .agg(count(lit(1)).as("n_days"),
            (sum(col("after.rev_c")).cast(DoubleType) / 100.0)
              .as("after_revenue"))
          .orderBy(col("op"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_c
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
        f AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_c
          FROM orders GROUP BY 1),
        d AS (
          SELECT COALESCE(e.day, f.day) AS day,
                 CASE WHEN e.day IS NULL THEN 'insert'
                      WHEN f.day IS NULL THEN 'delete'
                      WHEN e.rev_c <> f.rev_c THEN 'update' END AS op,
                 f.rev_c AS after_rev
          FROM e FULL OUTER JOIN f ON e.day = f.day)
        SELECT op, COUNT(*) AS n_days,
               SUM(after_rev)::DOUBLE / 100.0 AS after_revenue
        FROM d WHERE op IS NOT NULL GROUP BY op ORDER BY op""")),

    // ---- pre-flight key-skew diagnosis (pairs with q94 salted join) -----
    "q103_skew_diagnosis" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Diagnostics.skewDiagnosis(
          t(spark, dir, "orders"), col("o_custkey"), topN = 20),
      oracle = Some("""
        WITH c AS (SELECT o_custkey AS key, COUNT(*) AS n_rows
                   FROM orders GROUP BY 1),
        s AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
        SELECT key, n_rows,
          n_rows * 1.0 / total AS share,
          (n_rows * n_keys) * 1.0 / total AS skew,
          CAST(ceil((n_rows * n_keys) * 1.0 / total) AS BIGINT) AS salt
        FROM c, s ORDER BY n_rows DESC, key LIMIT 20""")),

    // ---- robust (median/MAD) outlier detection --------------------------
    // Two exact-percentile passes (q95's bit-identical interpolation
    // discipline) joined back as broadcast per-group constants, then one
    // conditional count. Exact percentile buffers each group's values, so
    // this form is for bounded-cardinality groups (event types here);
    // at 100 TB unbounded-group workloads swap in approx_percentile with
    // the same plan shape.
    "q109_mad_outliers" -> QueryDef(
      build = (spark, dir) => {
        val e = t(spark, dir, "events").select(col("event_type"), col("value"))
        val med = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = e.join(broadcast(med), "event_type")
        val mads = dev.groupBy(col("event_type"))
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        dev.join(broadcast(mads), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("med")).as("med"),
            min(col("mad")).as("mad"),
            sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"),
              1L).otherwise(0L)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH e AS (SELECT event_type, value FROM events),
        m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
              FROM e GROUP BY 1),
        d AS (SELECT e.event_type, e.value, m.med
              FROM e JOIN m USING (event_type)),
        md AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
               FROM d GROUP BY 1)
        SELECT d.event_type, COUNT(*) AS n, MIN(d.med) AS med,
               MIN(md.mad) AS mad,
               CAST(SUM(CASE WHEN abs(d.value - d.med) > 3.0 * md.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d JOIN md USING (event_type)
        GROUP BY d.event_type ORDER BY d.event_type""")),

    // ---- per-user event-transition mining (markov edge counts) ----------
    // lead() within each user's time-ordered stream, then a pair count —
    // one user-keyed shuffle + sort, one combine-backed pair aggregation,
    // distributed top-k for the report. Exact integer counts.
    "q110b_event_transitions" -> QueryDef(
      build = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(spark, dir, "events")
          .select(col("user_id"), col("event_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("event_type"), col("next_type"))
          .limit(20)
      },
      oracle = Some("""
        WITH s AS (SELECT user_id, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS next_type
          FROM events)
        SELECT event_type, next_type, COUNT(*) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
        ORDER BY n DESC, event_type, next_type LIMIT 20""")),

    // ---- rolling z-score anomalies over each user's event stream --------
    // z² = (n·x − S)² / (n·Q − S²) against the PRECEDING-10 window —
    // entirely exact int64 on cent-scaled values (no mean, no sqrt:
    // z > 3 ⟺ (n·x − S)² > 9·(n·Q − S²)), so the flags are
    // bit-deterministic under any shuffle order. One user-keyed shuffle
    // + in-partition sort; int64 envelope: |n·Q| ≤ 9e18 holds to cents
    // ~3e8 per value at window 10.
    "q112_rolling_zscore" -> QueryDef(
      build = (spark, dir) => {
        val c = expr("CAST(round(value * 100) AS BIGINT)")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-10, -1)
        t(spark, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"), c.as("x"),
            count(c).over(w).as("n"),
            sum(c).over(w).as("s"),
            sum(c * c).over(w).as("q"))
          .filter(col("n") >= 5)
          .select(col("event_type"),
            (col("n") * col("q") - col("s") * col("s")).as("den"),
            ((col("n") * col("x") - col("s"))
              * (col("n") * col("x") - col("s"))).as("num"))
          .filter(col("den") > 0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("num") > col("den") * 9L, 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, ts, event_id,
            CAST(round(value * 100) AS BIGINT) AS x FROM events),
        win AS (SELECT event_type, x,
            COUNT(x) OVER w AS n, SUM(x) OVER w AS s,
            SUM(x * x) OVER w AS q
          FROM e WINDOW w AS (PARTITION BY user_id
            ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        d AS (SELECT event_type,
            n * q - s * s AS den,
            (n * x - s) * (n * x - s) AS num
          FROM win WHERE n >= 5)
        SELECT event_type, COUNT(*) AS n_eval,
          CAST(SUM(CASE WHEN num > den * 9 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_outliers
        FROM d WHERE den > 0
        GROUP BY event_type ORDER BY event_type""")),

    // ---- exact quantiles WITHOUT buffering (histogram bisection) --------
    // the scale-correct complement of q95: Spark's exact percentile
    // buffers every group value; this bisects the VALUE DOMAIN with
    // <= 4 histogram passes of <= 2^16 rows each (ops.Quantile) -
    // unconditionally exact at any row count, no sketch, no buffering
    "q180_exact_quantile_bisect" -> QueryDef(
      build = (spark, dir) => {
        import spark.implicits._
        graft.ops.Quantile.exactLongQuantiles(
            t(spark, dir, "orders"), cents(col("o_totalprice")),
            Seq(0.5, 0.9, 0.99))
          .toDF("q", "k", "value")
          .orderBy(col("q"))
      },
      oracle = Some("""
        SELECT CAST(0.5 AS DOUBLE) AS q, CAST(ceil(0.5 * COUNT(*)) AS BIGINT) AS k,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                 AS value FROM orders
        UNION ALL
        SELECT CAST(0.9 AS DOUBLE), CAST(ceil(0.9 * COUNT(*)) AS BIGINT),
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)
          FROM orders
        UNION ALL
        SELECT CAST(0.99 AS DOUBLE), CAST(ceil(0.99 * COUNT(*)) AS BIGINT),
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.99)
          FROM orders
        ORDER BY q""")),

    // ---- per-group exact quantile, simultaneous bisection ---------------
    // all groups bisect at once: round count stays <= 5 TOTAL (not per
    // group), each round one (group, bucket)-keyed aggregation
    "q181_grouped_quantile_bisect" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Quantile.exactGroupedQuantile(
            t(spark, dir, "events"), col("event_type"),
            cents(col("value")), q = 0.5)
          .withColumnRenamed("g", "event_type")
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(ceil(0.5 * COUNT(*)) AS BIGINT) AS k,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
                 AS value
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type ORDER BY event_type""")),

    // ---- top event paths (ordered 3-step journeys) ----------------------
    // path mining: the most frequent ordered event-type trigrams per
    // user timeline - q110b's pairwise transitions, extended to
    // first-class countable journeys
    "q183_event_paths" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Temporal.topPaths(t(spark, dir, "events"),
          len = 3, k = 20),
      oracle = Some("""
        WITH seq AS (SELECT user_id,
            list(event_type ORDER BY ts, event_id) AS ts
          FROM events WHERE event_type IS NOT NULL GROUP BY user_id),
        w AS (SELECT list_extract(ts, CAST(i AS INT)) || '>' ||
                list_extract(ts, CAST(i AS INT) + 1) || '>' ||
                list_extract(ts, CAST(i AS INT) + 2) AS path
              FROM (SELECT ts, unnest(generate_series(1, len(ts) - 2)) AS i
                    FROM seq WHERE len(ts) >= 3))
        SELECT path, COUNT(*) AS n FROM w
        GROUP BY path ORDER BY n DESC, path LIMIT 20"""),
      // the per-user list build + path explode is CPU-bound combine
      // work over a compact shuffled frame — the q168/q185 class that
      // AQE's 64 MB-advisory coalescing starves at sf1
      confs = Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst"
          -> "true")),

    // ---- exponentially time-decayed aggregate (recency weighting) -------
    // feature-store/trending-ranker scoring in closed batch form: each
    // event contributes value·2^(−age/halfLife) against the corpus max
    // timestamp; per-event terms round once to scaled int64 (the q122
    // contract), so the per-user sum is order-free integer math
    "q173_decayed_engagement" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.Temporal.decayedAggregate(t(spark, dir, "events"),
            col("user_id"), col("ts"), col("value"), halfLifeHours = 6.0)
          .select(col("key").as("user_id"), col("n_events"), col("decayed"))
          .orderBy(col("user_id")),
      oracle = Some("""
        WITH m AS (SELECT MAX(epoch_us(ts)) AS tmax_us FROM events)
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(CAST(round(value * pow(2.0,
              -((tmax_us - epoch_us(ts)) / 3600000000.0) / 6.0)
            * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS decayed
        FROM events CROSS JOIN m
        GROUP BY user_id ORDER BY user_id"""))
  )
}
