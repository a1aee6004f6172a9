package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-provided TPC-H-ish test data
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * At 100 TB these reads become distributed columnar scans; everything here
  * is a plain `spark.read.parquet` so Catalyst keeps predicate pushdown,
  * column pruning and partition pruning (`.explain` shows `PushedFilters`
  * and a trimmed `ReadSchema`). No collect, no driver materialization.
  * Single-row-group raw files are rewritten once into right-sized
  * multi-file parquet (see [[Compaction]]) so scans parallelize the way
  * they would on any properly-ingested lake table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache, like any long-lived session catalog: repeated
  // loads of the same table reuse the analyzed frame instead of re-listing
  // files and re-reading parquet footers on every reference. Keyed by
  // session (a DataFrame is bound to the session that resolved it) AND the
  // source file's (size, mtime) fingerprint, so a rewritten source file
  // re-resolves instead of serving a stale file listing. Entries of
  // stopped sessions are evicted on the next load.
  private val resolved =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String, String), DataFrame]

  /** Drop cached resolutions for one table (all sessions) — the explicit
    * hook for callers that rewrite data in place without changing the
    * file's size or mtime. */
  def invalidate(dir: String, name: String): Unit =
    resolved.keys.filter(k => k._2 == dir && k._3 == name)
      .foreach(resolved.remove)

  private def sourceFingerprint(file: String): String =
    try Compaction.fingerprint(file)
    catch { case scala.util.control.NonFatal(_) => "" }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    resolved.keys.filter(_._1.sparkContext.isStopped).foreach(resolved.remove)
    val file = s"$dir/$name.parquet"
    val fp = sourceFingerprint(file)
    // drop superseded fingerprints for this (session, table): a table
    // rewritten repeatedly (upsert/snapshot paths) would otherwise pin
    // one stale analyzed frame per rewrite for the session's lifetime
    resolved.keys
      .filter(k => k._1 == spark && k._2 == dir && k._3 == name && k._4 != fp)
      .foreach(resolved.remove)
    resolved.getOrElseUpdate((spark, dir, name, fp), {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects; read nanos as long (session conf nanosAsLong) and
      // convert to a regular microsecond timestamp. The data's actual
      // resolution is microseconds, so `DIV 1000` is exact. The conversion
      // runs BEFORE compaction, so the compacted copy stores silver-grade
      // timestamps and later scans skip the cast entirely.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Compaction.loadOptimized(spark, file, df =>
        if (name == "events" && df.schema("ts").dataType == LongType)
          df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        else df)
    })
  }

  /** Register every table as a temp view named after itself, so `spark.sql`
    * queries and the DuckDB oracle see identical relation names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
