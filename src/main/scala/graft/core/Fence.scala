package graft.core

import java.nio.file.{Files, Path}

/** A concurrent writer lost the optimistic-concurrency race on a swapped
  * store: the state it merged from was replaced by another commit before
  * its own swap. The fold/commit was REJECTED cleanly — no file moved, no
  * state lost; the caller re-reads the new state and retries. */
final class ConcurrentWriteException(msg: String)
  extends RuntimeException(msg)

/** Writer-writer fencing for the swapped stores (r11 verdict task 2).
  *
  * Every swapped store (bucketed state folds, snapshot commits, layout
  * refreshes, plain merge swaps) stages a full next generation and
  * installs it with an atomic swap. That protocol is safe against
  * readers and against crashes (healSwap), but two CONCURRENT writers
  * both staging from generation g would each swap last-wins — the loser's
  * fold silently vanishes from history (lost update).
  *
  * The fence is optimistic concurrency, the same shape a table format's
  * conditional-put commit gives on an object store:
  *
  *  - each fenced directory carries a `_graft_writer_gen` token file
  *    (underscore-prefixed: invisible to Spark's file index, travels
  *    with the directory through every rename/heal);
  *  - a writer captures the token WHEN IT READS the state it merges from;
  *  - the swap runs under a per-path JVM monitor and re-reads the token:
  *    unchanged → bump and install; changed → [[ConcurrentWriteException]]
  *    (clean rejection — never a silent discard).
  *
  * The monitor makes check-and-swap atomic within one JVM — which is the
  * deployment the in-memory catalog already implies (one driver owns a
  * table's writes; Spark itself serializes nothing across drivers). A
  * multi-driver deployment gets the identical semantics from its table
  * format's CAS commit (Iceberg/Delta metadata pointer); the token file
  * IS that pointer expressed on a local filesystem.
  */
object Fence {

  private[graft] val GenFile = "_graft_writer_gen"

  private val monitors =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** The monitor serializing check-and-swap for `key` (canonicalized
    * path or qualified table name). */
  def monitorFor(key: String): Object =
    monitors.getOrElseUpdate(key, new Object)

  def withMonitor[T](key: String)(body: => T): T =
    monitorFor(key).synchronized(body)

  private def canonical(p: Path): String =
    p.toAbsolutePath.normalize.toString

  def withMonitor[T](p: Path)(body: => T): T =
    withMonitor(canonical(p))(body)

  /** The current writer generation of a fenced directory (0 when the
    * directory or token is absent — pre-fence stores start at 0 and get
    * their first token on the next commit). */
  def generation(dir: Path): Long = {
    val f = dir.resolve(GenFile)
    if (Files.exists(f)) Files.readString(f).trim.toLong else 0L
  }

  /** Stamp the STAGED directory with the successor token before it is
    * swapped in (the token travels with the rename). */
  private[graft] def stampNext(staged: Path, expected: Long): Unit =
    Files.writeString(staged.resolve(GenFile), (expected + 1L).toString)

  // Live staging dirs: a concurrent writer's in-flight .tmp- sibling
  // must never be swept by another writer's healSwap (the sweep is for
  // CRASH leftovers, which have no live registration). Without this, a
  // heal could delete a fully-staged tmp while its owner waits on the
  // swap monitor — the owner would then install an empty dir as the
  // table (found building the r12 fencing spec).
  private val liveStages =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  private[graft] def isLiveStage(p: Path): Boolean =
    liveStages.contains(canonical(p))

  /** Run `body` with `p` registered as a live staging dir. */
  private[graft] def withStage[T](p: Path)(body: => T): T = {
    liveStages.put(canonical(p), ())
    try body finally liveStages.remove(canonical(p))
  }

  /** Inside the swap monitor: reject if `dir`'s token moved past
    * `expected` since the writer read its state. */
  private[graft] def check(dir: Path, expected: Long): Unit = {
    val now = generation(dir)
    if (now != expected)
      throw new ConcurrentWriteException(
        s"$dir was committed by another writer (generation $now, " +
          s"this fold read generation $expected) — fold rejected; " +
          "re-read the state and retry")
  }
}
