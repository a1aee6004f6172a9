package graft.silver

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-table snapshots with time travel — the plain-Parquet
  * re-expression of the Iceberg snapshot log the reference's silver
  * layer gets from `table.upsert` (serverless_processing_iceberg/
  * main.py:141-143; every Iceberg commit is a new snapshot).
  *
  * Layout: `table/_v{n}/` immutable data directories plus a `_latest`
  * pointer file written LAST — readers resolve the pointer, never a
  * half-written directory, so commits are atomic on local FS and map
  * directly to a conditional-put commit on an object store. Snapshots
  * share nothing (full copies): at 100 TB the data directories would
  * instead hold manifests referencing unchanged files — the pointer
  * protocol and the read/rollback/vacuum API below are unchanged by
  * that swap.
  */
object Snapshots {

  private def versionDir(table: String, v: Long): Path =
    Paths.get(table, f"_v$v%06d")

  private def pointer(table: String): Path = Paths.get(table, "_latest")

  /** Highest committed version, or -1 for an empty table. */
  def latestVersion(table: String): Long = {
    val p = pointer(table)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** All committed versions, ascending (vacuumed ones excluded). */
  def versions(table: String): Seq[Long] = {
    val dir = Paths.get(table)
    if (!Files.exists(dir)) return Nil
    val latest = latestVersion(table)
    graft.core.Fs.children(dir)
      .map(_.getFileName.toString)
      .filter(_.matches("_v\\d{6}"))
      .map(_.drop(2).toLong)
      .filter(_ <= latest) // a crashed write past the pointer is invisible
      .sorted
  }

  /** Commit `df` as the next version and move the pointer. Returns the
    * committed version number. */
  def commit(df: DataFrame, table: String): Long = {
    val next = latestVersion(table) + 1
    // Stage: the new version may be derived from the current one (an
    // upsert); cut lineage so the write never re-reads files this commit
    // supersedes (durable checkpoint when a checkpoint dir is set —
    // executor-local blocks would make the commit unrecoverable on
    // executor loss between materialize and write)
    graft.core.Stage(df).write.mode("errorifexists")
      .parquet(versionDir(table, next).toString)
    val p = pointer(table)
    val tmp = Paths.get(table, s"_latest.tmp-${System.nanoTime()}")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the latest snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, latestVersion(table))

  /** Time travel: read a specific version. */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    require(v >= 0 && Files.exists(versionDir(table, v)),
      s"version $v of $table does not exist (or was vacuumed)")
    spark.read.parquet(versionDir(table, v).toString)
  }

  /** Merge a batch into the latest snapshot and commit the result as a
    * new version (upsert-with-history). */
  def commitMerged(batch: DataFrame, table: String,
      keys: Seq[String]): Long = {
    val merged =
      if (latestVersion(table) >= 0)
        Upsert.merge(read(batch.sparkSession, table), batch, keys)
      else batch
    commit(merged, table)
  }

  /** Roll back: make `v` the latest by re-committing it on top (history
    * stays linear; nothing is deleted). */
  def rollback(spark: SparkSession, table: String, v: Long): Long =
    commit(readVersion(spark, table, v), table)

  /** Change-data feed between two versions: one row per key whose
    * content changed, tagged insert/update/delete. A single full-outer
    * join on the key — both sides shuffle once on the key (or the
    * smaller version broadcasts); nothing is compared row-by-row on the
    * driver. Non-key columns are compared null-safely via a struct
    * equality. */
  def changes(spark: SparkSession, table: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val before = readVersion(spark, table, fromV)
    val after = readVersion(spark, table, toV)
    val valueCols = after.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+
        struct(valueCols.map(col): _*).as(as): _*)
    packed(before, "_before").join(packed(after, "_after"), keys, "full_outer")
      .withColumn("op",
        when(col("_before").isNull, lit("insert"))
          .when(col("_after").isNull, lit("delete"))
          .when(!(col("_before") <=> col("_after")), lit("update")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) :+ col("op") :+
        col("_before").as("before") :+ col("_after").as("after"): _*)
  }

  /** Drop all but the newest `keep` versions. */
  def vacuum(table: String, keep: Int): Unit = {
    val vs = versions(table)
    vs.dropRight(keep).foreach { v =>
      val dir = versionDir(table, v)
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(Files.delete(_))
    }
  }
}
