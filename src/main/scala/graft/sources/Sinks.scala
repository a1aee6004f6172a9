package graft.sources

import org.apache.spark.sql.DataFrame

/** Export / format-conversion sinks — the engine analog of the reference's
  * XTable Delta→Iceberg metadata sync (S13, lambdas/serverless_xtable/
  * xtable.py:15-50) and the dbt parquet staging post-hook (S12,
  * entrypoint.py:293-297). With one engine there is no metadata sync to
  * perform; conversion is a rewrite into the requested format.
  */
object Sinks {
  private val formats = Set("parquet", "json", "csv", "orc")

  /** Write `df` at `path` in `format` (overwrite). CSV gets a header so
    * round-trips keep column names. */
  def export(df: DataFrame, path: String, format: String): Unit = {
    require(formats(format), s"unsupported export format: $format")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Table maintenance: rewrite a parquet table into `numFiles` similarly
    * sized files. The 100 TB operator this stands in for is compaction —
    * micro-batch upserts accumulate small files, and scan throughput on an
    * object store is gated by file count and row-group layout; production
    * use sizes numFiles as ceil(tableBytes / targetFileSize). */
  def compact(df: DataFrame, path: String, numFiles: Int): Unit = {
    val tmp = path + ".compact-" + System.nanoTime()
    df.repartition(numFiles).write.mode("overwrite").parquet(tmp)
    graft.silver.Upsert.deleteRecursively(java.nio.file.Paths.get(path))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(path))
  }
}
