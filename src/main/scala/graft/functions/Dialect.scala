package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Expression, MillisToTimestamp, SecondsToTimestamp, Size}

/** DuckDB-dialect function shims (SURVEY.md §2.8, §4.3.5).
  *
  * Gold-job SQL written for the reference uses DuckDB names
  * (`transformation_agent/.../analyzer.py:42-72`): `epoch_ms`,
  * `list_contains`, `len`, `to_timestamp`-on-seconds. Spark has the same
  * semantics under different names; we register thin aliases straight onto
  * the native Catalyst expressions so they stay inside whole-stage codegen
  * (no UDF, no extra serialization — identical performance to the
  * built-ins they alias).
  */
object Dialect {
  private val aliases: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // DuckDB epoch_ms(BIGINT) -> TIMESTAMP  == Spark timestamp_millis
    "epoch_ms" -> ((es: Seq[Expression]) => MillisToTimestamp(es.head)),
    // DuckDB to_timestamp(seconds) == Spark timestamp_seconds
    "epoch_s" -> ((es: Seq[Expression]) => SecondsToTimestamp(es.head)),
    // DuckDB list_contains(arr, v) == Spark array_contains
    "list_contains" -> ((es: Seq[Expression]) => ArrayContains(es(0), es(1))),
    // DuckDB len(list) == Spark size (arrays & maps)
    "list_len" -> ((es: Seq[Expression]) => Size(es.head, legacySizeOfNull = false))
  )

  def register(spark: SparkSession): Unit = {
    // Pin the session to UTC at engine startup: tsUs (below) relies on
    // it for TIMESTAMP_NTZ columns, and the engine's timestamp semantics
    // (SURVEY §4.3.5 — naive values are UTC wall clock, like the
    // reference's lake) are only coherent under a UTC session anyway.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    aliases.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // dialect semantics, not just dialect names: DuckDB (and ISO SQL)
    // return the grand-total row for ROLLUP/CUBE over empty input;
    // Spark's Expand-based grouping sets lose it (found by the
    // differential fuzz, see the rule's scaladoc)
    graft.plans.EmptyGroupingSetsRule.install(spark)
  }

  /** Epoch micros of a timestamp column, tolerant of BOTH timestamp
    * flavors the lake's parquet can carry: `TIMESTAMP` (instant) and
    * `TIMESTAMP_NTZ` (naive wall clock, which `unix_micros` rejects).
    * A naive value is taken at face value as UTC — exactly DuckDB's
    * `epoch_us(ts)` on a naive column.
    *
    * REQUIRES a UTC session timezone for NTZ inputs: Catalyst implicitly
    * casts TIMESTAMP_NTZ → TIMESTAMP using the SESSION timezone before
    * `to_utc_timestamp` runs, so under a non-UTC session a naive 06:30
    * would land on the wrong epoch (verified on Spark 4.1.2: +4h under
    * America/New_York). Every engine entry point pins
    * `spark.sql.session.timeZone=UTC` (`Dialect.register` forces it);
    * instant-typed inputs are unaffected either way. Stays codegen'd. */
  def tsUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.to_utc_timestamp(c, "UTC"))
}
