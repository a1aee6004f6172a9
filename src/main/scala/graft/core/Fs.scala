package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Directory-listing helpers. `Files.list` returns a Stream that holds an
  * open directory file descriptor until closed; call sites that iterate it
  * and walk away leak one fd per call. These materialize eagerly and close
  * the stream in a finally block. */
object Fs {

  /** All direct children of `dir` (empty if it doesn't exist). */
  def children(dir: Path): Vector[Path] = {
    if (!Files.exists(dir)) return Vector.empty
    val s = Files.list(dir)
    try s.iterator().asScala.toVector
    finally s.close()
  }

  /** True if `dir` exists and has at least one entry. */
  def nonEmpty(dir: Path): Boolean = {
    if (!Files.exists(dir)) return false
    val s = Files.list(dir)
    try s.findFirst().isPresent
    finally s.close()
  }

  /** Metadata-only carry-across of an immutable data file: hard link
    * where the filesystem allows it, byte copy where it doesn't (cross-
    * device link, or a filesystem without link support). The bucketed
    * carry-across paths (layout refresh, state fold) use this so an
    * untouched bucket costs an inode, not its bytes. */
  def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch {
      case _: UnsupportedOperationException
          | _: java.nio.file.FileSystemException =>
        Files.copy(src, dst)
    }
}
