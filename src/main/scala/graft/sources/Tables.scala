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
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache, like any long-lived session catalog: repeated
  // loads of the same table reuse the analyzed frame instead of re-listing
  // files and re-reading parquet footers on every reference. Keyed by
  // session (a DataFrame is bound to the session that resolved it).
  private val resolved =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.getOrElseUpdate((spark, dir, name), {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects; read nanos as long (session conf nanosAsLong) and
      // convert to a regular microsecond timestamp. The data's actual
      // resolution is microseconds, so `DIV 1000` is exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else df
    })

  /** Register every table as a temp view named after itself, so `spark.sql`
    * queries and the DuckDB oracle see identical relation names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
