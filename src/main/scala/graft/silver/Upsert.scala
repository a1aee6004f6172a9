package graft.silver

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Key-based merge ("upsert") for plain-Parquet tables — the Spark-native
  * replacement for the reference's Iceberg `table.upsert(arrow, pks)`
  * (serverless_processing_iceberg/main.py:141-143) and the Delta MERGE
  * (serverless_processing/main.py:87-113).
  *
  * Semantics: rows from `source` win on key collision; all other `target`
  * rows are kept (when-matched-update-all / when-not-matched-insert-all).
  *
  * Spark-first design: the "matched" probe is a LEFT ANTI join — a single
  * shuffle (or broadcast, when the source batch is small, which Catalyst/AQE
  * decides from runtime stats) — followed by a by-name union. No row-by-row
  * driver logic; the merge is one distributed plan.
  *
  * 100 TB note: rewriting a whole table per merge is O(table). The scale
  * path is `writeMerged` with a partitioned table layout (e.g. by ingest
  * date): only partitions containing matched keys are rewritten, everything
  * else is untouched. Here (local FS, test scale) we implement the atomic
  * full-table swap via temp-dir + rename, which is the same discipline an
  * object-store commit protocol provides.
  */
object Upsert {

  /** Pure merge of two DataFrames on `keys`; `source` wins on collision.
    * Schema evolution: columns are unioned by name, missing ones null. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = target.join(source.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    // by-name union with allowMissingColumns = schema evolution for free
    source.unionByName(kept, allowMissingColumns = true)
  }

  /** Merge `source` into the Parquet table at `tablePath` and atomically
    * replace it (write to sibling tmp dir, then swap). */
  def writeMerged(source: DataFrame, tablePath: String, keys: Seq[String]): Unit = {
    val spark = source.sparkSession
    val path = Paths.get(tablePath)
    val merged =
      if (keys.nonEmpty && graft.core.Fs.nonEmpty(path)) {
        val target = spark.read.parquet(tablePath)
        merge(target, source, keys)
      } else source // no keys = full replace (overwrite semantics)
    val tmp = tablePath + ".tmp-" + System.nanoTime()
    merged.write.mode("overwrite").parquet(tmp)
    atomicSwap(Paths.get(tmp), path)
  }

  /** Replace `dest` with `src` via rename; best-effort atomic on local FS
    * (object stores would use a commit-marker protocol instead). */
  private[graft] def atomicSwap(src: Path, dest: Path): Unit = {
    val old = Paths.get(dest.toString + ".old-" + System.nanoTime())
    if (Files.exists(dest)) Files.move(dest, old)
    Files.move(src, dest, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
