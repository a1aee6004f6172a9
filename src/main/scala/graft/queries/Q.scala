package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One verifiable query: a Spark build function plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name and hashes values.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench at sf0.1 */
    bench: Boolean = false,
    /** DuckDB SQL used for the BENCH baseline when it should differ from
      * the correctness `oracle` — e.g. q137's oracle is deliberately the
      * brute-force all-pairs join (the strongest equivalence proof), but
      * the fair timed baseline is how a SQL engine would actually compute
      * it at scale (token-keyed equi-join). Defaults to `oracle`. */
    benchOracle: Option[String] = None,
    /** Semantics-free session settings this query wants at execution
      * time (a per-query plan hint, like any engine's query-level
      * config). Applied identically by Bench AND Verify — the
      * correctness gate always runs the exact configuration the bench
      * measures. Restored to the session's previous values afterwards. */
    confs: Map[String, String] = Map.empty,
    /** Disclosure emitted verbatim in the bench JSON (`notes` field)
      * next to this query's timing — input asymmetries vs the DuckDB
      * column, floor exceptions, sf1 evidence — so the bench artifact
      * is self-contained and its consumers need not read COVERAGE.md. */
    benchNote: Option[String] = None,
    /** When true, Bench ALSO times this query with silver-layout
      * resolution suppressed (BucketedTables.withoutLayouts — the
      * inline-fallback path Verify always exercises) and emits it as
      * `nolayout` in the bench JSON, so a layout-assisted headline
      * number carries its no-layout counterpart in the same artifact. */
    benchNoLayout: Boolean = false)

/** Shared helpers for oracle-exact arithmetic.
  *
  * Cross-engine hash-matching rules used throughout:
  *   - money/quantity sums: cast to DECIMAL first (exact, order-free),
  *     cast the final aggregate back to DOUBLE;
  *   - ratios: divide two exactly-computed numbers in DOUBLE (IEEE754
  *     division is deterministic — unlike summing doubles in shuffle order);
  *   - hashes: md5 hex (identical in Spark and DuckDB), 32-bit ints derived
  *     from md5 prefixes so all sketch math stays in exact int64;
  *   - timestamps: truncate/convert to DATE or derive from integer epochs.
  */
object Q {
  /** Fan a few-row-group scan out across all cores before compute-heavy
    * per-row work (decimal aggregation, hashing). Local test files have a
    * single row group, so without this the scan+partial-agg stage runs on
    * one task; on a real cluster multi-row-group files split natively and
    * this becomes a cheap no-op-sized shuffle. */
  def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact decimal view of a double money/quantity column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Scaled-long view of a 2-decimal-place money/quantity column: the
    * exact integer cent count. Sums and products of cents are exact int64
    * arithmetic that whole-stage codegen keeps in registers — measured
    * ~2× faster than DECIMAL aggregation buffers on the hot aggregations,
    * and bit-identical to the DECIMAL path after the final cast to DOUBLE
    * (both engines compute unscaled/10^scale in IEEE754).
    *
    * Overflow bound: a 2-factor product (price·discount-complement) is
    * ≤ ~1e9 at scale 1e4; int64 sums stay exact to ~9e9 rows PER GROUP.
    * Beyond that (or for 3-factor products at ~1e11, safe to ~9e7 rows
    * per group), sum the long product under a DECIMAL(38,0) cast instead:
    * the multiply stays codegen'd long math and only the aggregation
    * buffer widens (measured ~25% over pure long, still well under the
    * full-DECIMAL chain). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  def dec4(c: Column): Column = c.cast(DecimalType(14, 4))

  /** Deterministic 32-bit unsigned hash as long: the first 4 md5 digest
    * bytes, big-endian. DuckDB equivalent:
    * ('0x' || substr(md5(x),1,8))::BIGINT. Implemented as the fused
    * native expression [[graft.functions.Md5Prefix32]] (whole-stage
    * codegen, no intermediate hex string); the composed built-in form is
    * `conv(substring(md5(c),1,8),16,10).cast(long)`. */
  def h32(c: Column): Column = graft.functions.Md5Prefix32(c)

  /** DuckDB SQL fragment for h32. */
  def h32Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 8))::BIGINT)"

  /** Whitespace tokenization, identical in Spark and DuckDB:
    * regexp_split_to_array(trim(x), '\s+') */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  val tokensSql: String = raw"regexp_split_to_array(trim(text), '\s+')"
}
