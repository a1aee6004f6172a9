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
}
