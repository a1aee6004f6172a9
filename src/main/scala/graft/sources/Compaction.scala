package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-layout optimization for poorly-laid-out parquet inputs — the
  * lakehouse maintenance pass (Delta `OPTIMIZE` / Iceberg
  * `rewrite_data_files`), applied on first load instead of on a schedule.
  *
  * Parquet parallelism is bounded by ROW GROUPS: a split finer than a row
  * group degenerates to one reader, so a 600k-row table written as a
  * single row group scans on ONE core no matter how many executors exist.
  * Real lake ingestion (the silver writer here, any Firehose-style
  * buffer) produces many right-sized files; raw hand-dropped files often
  * don't. This pass rewrites such a table once into `targetRows`-sized
  * parquet files under the JVM temp dir, keyed by the source's
  * (size, mtime) fingerprint — so a rewritten source re-compacts, and
  * every subsequent scan decodes in parallel exactly as it would on a
  * properly-ingested table. Queries still read and decode the full data
  * on every run; only the LAYOUT changes, never the rows.
  */
object Compaction {

  /** Rows per compacted output file: small enough that a 32-core local
    * run saturates on the bench tables, large enough that file overhead
    * stays negligible. */
  val targetRows = 20000L

  /** Max output files per table — one per core is plenty. */
  val maxSplits = 32

  /** Compact only when it buys real parallelism: the table must be big
    * enough to matter and its row-group count must undershoot half the
    * split count the row count calls for. */
  val minRows = 40000L

  private[sources] def enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_COMPACT").contains("false")

  /** (rowGroups, rows) from the parquet footer — no Spark job. */
  private def footer(spark: SparkSession, file: String): (Int, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val in = HadoopInputFile.fromPath(new HPath(file), conf)
    val r = ParquetFileReader.open(in)
    try (r.getFooter.getBlocks.size, r.getRecordCount)
    finally r.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def splitsFor(rows: Long): Int =
    math.min(maxSplits.toLong, math.max(1L, rows / targetRows)).toInt

  /** Source fingerprint: path + length + mtime. Encoded into the
    * compacted directory name, so a rewritten source file naturally maps
    * to a fresh compaction (and the stale one is just an orphan dir). */
  private[graft] def fingerprint(file: String): String = {
    val p = Paths.get(file)
    val size = Files.size(p)
    val mtime = Files.getLastModifiedTime(p).toMillis
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$file|$size|$mtime") & 0xffffffffL)
  }

  /** Default vacuum retention: mirrors Delta VACUUM's grace-period idea
    * at cache scale — long enough to outlive any realistic in-flight
    * scan on this host. */
  val defaultRetentionMs: Long = 6L * 3600 * 1000

  /** Vacuum the compaction cache: delete cached directories whose source
    * fingerprint no longer matches any `liveFiles` entry — each source
    * rewrite leaves the previous compaction as an orphan dir, and a
    * long-lived host accumulates one per rewrite (same lifecycle problem
    * Delta's VACUUM / Iceberg's `expire_snapshots` solve for data files).
    * In-flight `.tmp-*` staging dirs of live processes are left alone.
    *
    * Retention grace: a directory modified within `retentionMs` is NOT
    * deleted even when orphaned — another JVM on this host may be
    * mid-scan on a compaction for a source outside this caller's
    * `liveFiles`, or for a fingerprint that changed after it loaded;
    * deleting under it would fail that query (Delta VACUUM solves the
    * same race with its retention window). Pass 0 only when no other
    * graft process is active on the host.
    *
    * Returns the number of directories removed. */
  def vacuum(liveFiles: Seq[String],
      retentionMs: Long = defaultRetentionMs): Int = {
    val base = Paths.get(sys.props("java.io.tmpdir"), "graft-compacted")
    if (!Files.isDirectory(base)) return 0
    val live = liveFiles.flatMap { f =>
      try {
        val name = Paths.get(f).getFileName.toString.stripSuffix(".parquet")
        Some(s"$name-${fingerprint(f)}")
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val entries = Files.list(base)
    val victims =
      try entries.filter(p => Files.isDirectory(p)
          && !p.getFileName.toString.startsWith(".")
          && !live.contains(p.getFileName.toString)
          && Files.getLastModifiedTime(p).toMillis <= cutoff)
        .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      finally entries.close()
    victims.foreach(deleteRecursively)
    victims.size
  }

  /** Small-file compaction for a DIRECTORY table (the lakehouse
    * `OPTIMIZE` / `rewrite_data_files` maintenance pass): append-mode
    * sinks accumulate one small file per micro-batch/run, and scan cost
    * at scale is dominated by per-file open/footer overhead once files
    * are much smaller than a split. Rewrites the table into
    * ceil(rows/targetRows) right-sized files (capped at [[maxSplits]])
    * and atomically swaps — readers see the old files or the new, never
    * a mix ([[graft.silver.Upsert.atomicSwap]] discipline; an
    * interrupted swap self-heals via healSwap on the next touch).
    *
    * Returns (filesBefore, filesAfter). At 100 TB this runs per
    * PARTITION of a date-partitioned table (only partitions whose
    * small-file count crossed a threshold), not whole-table.
    *
    * Interaction with the bucket-scoped silver default (r12): a keyed
    * silver table maintained by `Upsert.writeMerged` already holds AT
    * MOST ONE FILE PER KEY-HASH BUCKET (the fold stages one file per
    * touched bucket and carries the rest), so small files never
    * accumulate there and compaction is rarely needed. Compacting one
    * anyway flattens the bucket layout (this rewrite is keys = Nil);
    * the table then reads as legacy and the NEXT keyed merge pays one
    * full-but-bucketed upgrade rewrite — content is correct throughout
    * (PipelineSpec's maintenance-loop e2e covers the sequence). */
  def compactTable(spark: SparkSession, tablePath: String,
      targetRows: Long = Compaction.targetRows): (Int, Int) = {
    def partFiles = graft.core.Fs.children(Paths.get(tablePath))
      .count(_.getFileName.toString.endsWith(".parquet"))
    val before = partFiles
    val df = spark.read.parquet(tablePath)
    val rows = df.count()
    val n = math.max(1L, math.min(maxSplits.toLong,
      (rows + targetRows - 1) / targetRows)).toInt
    graft.silver.Upsert.writeMerged(df.repartition(n), tablePath, keys = Nil)
    (before, partFiles)
  }

  /** Load `file`, compacting through a cached multi-file rewrite when the
    * row-group layout would serialize the scan. `prepare` is applied
    * before the rewrite (type normalization — the compacted copy stores
    * silver-grade types, like any real silver table). Falls back to the
    * prepared raw frame when compaction is off, unhelpful, or fails. */
  def loadOptimized(spark: SparkSession, file: String,
      prepare: DataFrame => DataFrame): DataFrame = {
    val raw = () => prepare(spark.read.parquet(file))
    if (!enabled || !Files.isRegularFile(Paths.get(file))) return raw()
    try {
      val (groups, rows) = footer(spark, file)
      val n = splitsFor(rows)
      // compact only when the layout provides less than half the
      // parallelism the row count calls for
      if (rows < minRows || groups * 2 > n) return raw()
      val base = Paths.get(sys.props("java.io.tmpdir"), "graft-compacted")
      val name = Paths.get(file).getFileName.toString.stripSuffix(".parquet")
      val dst = base.resolve(s"$name-${fingerprint(file)}")
      if (!Files.isDirectory(dst)) {
        Files.createDirectories(base)
        // write to a private tmp dir, then atomically move into place so
        // concurrent JVMs never observe a half-written compaction
        val tmp = base.resolve(s".${dst.getFileName}.tmp-${ProcessHandle.current.pid}")
        raw().repartition(n).write.mode("overwrite").parquet(tmp.toString)
        try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another JVM won the race; use its copy. Linux rename(2) onto
          // an existing non-empty directory surfaces as ENOTEMPTY
          // (DirectoryNotEmptyException), not FileAlreadyExists — catch
          // both, or the loser leaks its tmp copy and skips the winner's
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException |
               _: java.nio.file.AccessDeniedException =>
            deleteRecursively(tmp)
        }
      }
      spark.read.parquet(dst.toString)
    } catch {
      case scala.util.control.NonFatal(_) => raw()
    }
  }
}
