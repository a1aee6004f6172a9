package graft.core

import java.nio.file.Paths

/** Path → registered-table-name index, fed by [[graft.Lake]]'s catalog
  * registrations and consumed by the path-level writers
  * ([[graft.silver.Upsert.writeMerged]]) to scope post-commit cache
  * invalidation to the ONE table that actually changed (r12 verdict
  * finding 2: a catalog-wide `invalidateAllCachedTables` per merge is a
  * throughput tax at 100× — every cached relation engine-wide re-lists
  * on every micro-batch of any table).
  *
  * JVM-global like [[Fence]]: one driver owns a lake's registrations,
  * and several Lake instances in one JVM may register different names
  * over one path — hence a set per canonical path. Entries are tiny
  * (two interned-size strings) and bounded by the number of registered
  * tables, so no eviction is needed.
  */
object TableIndex {

  private val byPath =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  private def canonical(path: String): String =
    Paths.get(path).toAbsolutePath.normalize.toString

  /** Record that catalog table `qualifiedName` reads from `path`. */
  def register(path: String, qualifiedName: String): Unit = {
    val k = canonical(path)
    byPath.updateWith(k) {
      case Some(s) => Some(s + qualifiedName)
      case None => Some(Set(qualifiedName))
    }
  }

  /** All catalog names registered over `path` (empty = unregistered —
    * callers fall back to coarse invalidation). */
  def namesFor(path: String): Set[String] =
    byPath.getOrElse(canonical(path), Set.empty)
}
