package graft.silver

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed silver tables: the co-located-join layout for upsert-heavy
  * tables at scale.
  *
  * The merge's probe ("which target rows match a source key?") is a join
  * on the primary key. On an unbucketed table every merge shuffles the
  * ENTIRE target — O(table) network per micro-batch, the dominant cost at
  * 100 TB. Persisting silver bucketed by the PK (`bucketBy(n, pks)` +
  * `sortBy`) makes the target side exchange-free: Spark reads each bucket
  * as a pre-partitioned, pre-sorted input and only the (small) incoming
  * batch shuffles to match. The test suite asserts the plan property
  * (exactly one Exchange — the source side).
  *
  * Bucket count is fixed at table creation; production sizing is
  * ceil(projected table size / target partition size) rounded to a
  * multiple of the cluster's parallelism.
  */
object BucketedTables {

  /** Create-or-merge `source` into the bucketed managed table
    * `db.table`, keyed by `keys`. Same semantics as `Upsert.merge`
    * (source wins on key collision). */
  def writeMerged(spark: SparkSession, db: String, table: String,
      source: DataFrame, keys: Seq[String], numBuckets: Int = 8): Unit = {
    val qualified = s"$db.$table"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!spark.catalog.tableExists(qualified)) {
      bucketWrite(source, qualified, keys, numBuckets)
    } else {
      val merged = Upsert.merge(spark.table(qualified), source, keys)
      val tmp = s"$db.${table}__merge_tmp"
      bucketWrite(merged, tmp, keys, numBuckets)
      // swap via rename (metadata-only); an object-store deployment would
      // use a transactional catalog commit here
      spark.sql(s"DROP TABLE $qualified")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $qualified")
    }
  }

  private def bucketWrite(df: DataFrame, qualified: String,
      keys: Seq[String], numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(qualified)

  /** The merge probe plan against a bucketed target — exposed so callers
    * (and tests) can verify the exchange-free property. */
  def mergePlan(spark: SparkSession, db: String, table: String,
      source: DataFrame, keys: Seq[String]): DataFrame =
    spark.table(s"$db.$table")
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
