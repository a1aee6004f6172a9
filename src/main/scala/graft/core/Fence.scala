package graft.core

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** A concurrent writer lost the optimistic-concurrency race on a swapped
  * store: the state it merged from was replaced by another commit before
  * its own swap. The fold/commit was REJECTED cleanly — no file moved, no
  * state lost; the caller re-reads the new state and retries. */
final class ConcurrentWriteException(msg: String)
  extends RuntimeException(msg)

/** The cross-process commit-exclusion seam (r13 verdict task 8): how a
  * writer gets the exclusive lease under which it runs its
  * check-generation-and-swap. The local-FS default is an OS
  * `FileChannel` lock on a `<dir>.lock` sibling; an object-store
  * deployment substitutes the store's own conditional-put/CAS lease
  * (S3 If-Match, GCS generation preconditions) by installing another
  * guard — the fence protocol above it is unchanged. Implementations
  * must BLOCK until the current holder (in any process) releases. */
trait CommitGuard {
  /** Acquire the exclusive lease for `key` (a canonicalized store
    * path); returns the release action. */
  def acquire(key: String): () => Unit
}

/** Default guard: OS-level `FileChannel` lock on `<key>.lock`. The lock
  * file is a SIBLING (the dir itself is renamed away mid-swap) and is
  * never deleted: unlinking a lock file another process holds silently
  * splits the lock on POSIX. */
object FileLockGuard extends CommitGuard {
  def acquire(key: String): () => Unit = {
    val lockPath = Paths.get(key + ".lock")
    Option(lockPath.getParent).foreach(Files.createDirectories(_))
    val ch = FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.lock() // blocks until any other PROCESS releases
      () => try l.release() finally ch.close()
    } catch { case e: Throwable => ch.close(); throw e }
  }
}

/** In-memory guard with CAS-lease semantics, for specs that prove the
  * seam: the same serialize-or-reject behavior the FileChannel guard
  * gives, minus the filesystem — what an object-store conditional-put
  * backend looks like to the fence. Driven by the FencingSpec races. */
object InMemoryCasGuard extends CommitGuard {
  private val leases = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantLock]
  def acquire(key: String): () => Unit = {
    val l = leases.getOrElseUpdate(key,
      new java.util.concurrent.locks.ReentrantLock())
    l.lock()
    () => l.unlock()
  }
}

/** Writer-writer fencing for the swapped stores (r11 verdict task 2;
  * cross-process since r13).
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
  *  - the swap runs under a per-path JVM monitor AND an OS-level
  *    `FileChannel` lock on a `<dir>.lock` sibling, and re-reads the
  *    token: unchanged → bump and install; changed →
  *    [[ConcurrentWriteException]] (clean rejection — never a silent
  *    discard).
  *
  * The monitor makes check-and-swap atomic within one JVM; the file lock
  * extends the SAME serialize-or-reject contract across processes
  * sharing a filesystem (the token file is the pointer a table format's
  * CAS commit would guard; `FileChannel.lock` is the local-FS
  * conditional-put). On an object store the file lock is replaced by the
  * store's own conditional-put — the caller-visible semantics are
  * unchanged.
  */
object Fence {

  private[graft] val GenFile = "_graft_writer_gen"

  /** The monitor serializing check-and-swap for `key` (canonicalized
    * path or qualified table name) within this JVM.
    *
    * Interned strings ARE the monitors: `String.intern` returns one
    * canonical heap object per value, collected by the GC once nothing
    * references it (JDK 7+ keeps the pool on the heap) — so unlike a
    * grow-only map there is no per-path leak in a long-lived driver
    * churning ephemeral table paths (r12 advisor), and a thread inside
    * `synchronized` holds a strong reference, so the canonical mapping
    * cannot be swapped out mid-critical-section. The namespace prefix
    * keeps foreign code from plausibly locking the same literal. */
  def monitorFor(key: String): Object = ("graft.fence.monitor:" + key).intern()

  def withMonitor[T](key: String)(body: => T): T =
    monitorFor(key).synchronized(body)

  private def canonical(p: Path): String =
    p.toAbsolutePath.normalize.toString

  def withMonitor[T](p: Path)(body: => T): T =
    withMonitor(canonical(p))(body)

  // ------------------------------------------------------------------
  // Cross-process lock (r12 verdict task 5). Callers MUST already hold
  // withMonitor(dir) — the monitor guarantees at most one thread per
  // JVM is here, so JVM-level reentrancy is a simple per-path count
  // (FileChannel.lock throws OverlappingFileLockException on a second
  // same-JVM acquisition; the count makes nested fenced sections —
  // fold's carry wrapping atomicSwap — reuse the held lock).
  // ------------------------------------------------------------------

  /** The installed [[CommitGuard]] — [[FileLockGuard]] by default;
    * specs (and object-store deployments) install their own. */
  @volatile private[graft] var commitGuard: CommitGuard = FileLockGuard

  private val heldLocks = scala.collection.concurrent.TrieMap
    .empty[String, (() => Unit, Thread, Int)]

  /** The lease key for `dir`: the real-pathed PARENT plus the literal
    * leaf name — NEVER the real-pathed leaf. The leaf is renamed away
    * mid-swap as a matter of protocol, so an existence-dependent key
    * (realpath the leaf when present, parent+leaf when not) would hand
    * two processes DIFFERENT `<key>.lock` files for the same store
    * depending on when each looked — splitting the cross-process lease
    * exactly when it matters, and flipping the `heldLocks` reentrancy
    * key between nested calls (r14 advisor). Keying on the parent makes
    * the key stable across every existence state of the leaf; symlink
    * aliases of the PARENT directory still converge on one lock (r13
    * advisor). A store whose LEAF is itself a symlink is unsupported —
    * aliasing the final path component cannot be detected without
    * resolving it, which is what breaks mid-swap. */
  private[graft] def lockKey(dir: Path): String = {
    val abs = dir.toAbsolutePath.normalize
    try {
      val parent = abs.getParent
      if (parent != null && Files.exists(parent))
        parent.toRealPath().resolve(abs.getFileName).toString
      else abs.toString
    } catch { case _: java.io.IOException => abs.toString }
  }

  /** Run `body` holding the exclusive cross-process lease for `dir`
    * (the installed [[CommitGuard]]; OS file lock by default).
    * Reentrant for the OWNING thread only: callers MUST already hold
    * `withMonitor(dir)`, and a second thread reaching the held lease
    * (i.e. a caller that skipped the monitor) fails loud instead of
    * silently sharing the critical section (r13 advisor). */
  def withFileLock[T](dir: Path)(body: => T): T = {
    val key = lockKey(dir)
    heldLocks.get(key) match {
      case Some((release, owner, n)) =>
        if (owner ne Thread.currentThread())
          throw new IllegalStateException(
            s"withFileLock($dir) entered by thread " +
              s"'${Thread.currentThread().getName}' while '${owner.getName}' " +
              "holds the lease — the caller skipped withMonitor(dir), " +
              "which makes the reentrant branch a no-exclusion hole")
        heldLocks.put(key, (release, owner, n + 1))
        try body
        finally heldLocks.put(key, (release, owner, n))
      case None =>
        val release = commitGuard.acquire(key)
        heldLocks.put(key, (release, Thread.currentThread(), 1))
        try body
        finally { heldLocks.remove(key); release() }
    }
  }

  /** The current writer generation of a fenced directory (0 when the
    * directory or token is absent — pre-fence stores start at 0 and get
    * their first token on the next commit). A token that vanishes
    * MID-READ was retired by a concurrent commit; retry the read (the
    * new generation's token is already in place after the atomic
    * rename), then fail with the retryable fence rejection. */
  def generation(dir: Path): Long = {
    var attempts = 3
    while (true) {
      val f = dir.resolve(GenFile)
      try return if (Files.exists(f)) Files.readString(f).trim.toLong else 0L
      catch {
        case e: java.nio.file.NoSuchFileException =>
          attempts -= 1
          if (attempts == 0) throw new ConcurrentWriteException(
            s"$dir is being committed by another writer (token vanished " +
              "mid-read) — re-read the state and retry: " + e)
      }
    }
    0L // unreachable
  }

  /** Stamp the STAGED directory with the successor token before it is
    * swapped in (the token travels with the rename). */
  private[graft] def stampNext(staged: Path, expected: Long): Unit =
    Files.writeString(staged.resolve(GenFile), (expected + 1L).toString)

  // ------------------------------------------------------------------
  // Live staging dirs: a concurrent writer's in-flight .tmp- sibling
  // must never be swept by another writer's healSwap (the sweep is for
  // CRASH leftovers, which have no live registration). Without this, a
  // heal could delete a fully-staged tmp while its owner waits on the
  // swap monitor — the owner would then install an empty dir as the
  // table (found building the r12 fencing spec). Registration is
  // two-level: a JVM-local map (exact, same-process) plus an on-disk
  // `.live-` sibling marker with a staleness grace window, so ANOTHER
  // process's heal also skips an in-flight stage (r12 advisor: the
  // JVM-local-only registry made a cross-process misconfiguration
  // worse than the pre-fence lost update — a dangling sweep of a live
  // writer's staging dir). A crashed process leaves its marker behind;
  // after the grace window the stage sweeps like any other leftover.
  // ------------------------------------------------------------------

  private val liveStages =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Grace before an on-disk stage marker is considered a crash
    * leftover (overridable for tests). In-process crashes clear their
    * marker in `withStage`'s finally, so only a hard process kill pays
    * the wait. */
  private[graft] def staleStageMs: Long =
    sys.props.get("graft.fence.staleStageMs").map(_.toLong)
      .getOrElse(15L * 60 * 1000)

  /** On-disk liveness marker for staged dir `p`: `X.tmp-N` → sibling
    * `X.live-N` (never inside `p` — the dir may not exist yet when the
    * stage registers, and its content must stay byte-identical to a
    * full rebuild). */
  private[graft] def stageMarker(p: Path): Path = {
    val n = p.getFileName.toString
    val m = if (n.contains(".tmp-")) n.replaceFirst("""\.tmp-""", ".live-")
      else n + ".live"
    p.toAbsolutePath.normalize.resolveSibling(m)
  }

  private def markerFresh(m: Path): Boolean =
    try System.currentTimeMillis -
      Files.getLastModifiedTime(m).toMillis < staleStageMs
    catch { case _: java.nio.file.NoSuchFileException => false }

  private[graft] def isLiveStage(p: Path): Boolean =
    liveStages.contains(canonical(p)) || {
      val m = stageMarker(p)
      Files.exists(m) && markerFresh(m)
    }

  /** The staging dir a `.live-` marker belongs to (inverse of
    * [[stageMarker]]). A marker whose stage is GONE is an orphan —
    * that, not mere age, is what healSwap sweeps on: a long-running
    * stage's marker is kept fresh by [[withHeartbeat]], and its stage
    * sweep (which clears the marker with it) is the aging path. */
  private[graft] def stageFor(m: Path): Path = {
    val n = m.getFileName.toString
    val s = if (n.contains(".live-")) n.replaceFirst("""\.live-""", ".tmp-")
      else n.stripSuffix(".live")
    m.resolveSibling(s)
  }

  private[graft] def clearStageMarker(p: Path): Unit =
    Files.deleteIfExists(stageMarker(p))

  /** A `.live-` marker healSwap may sweep as a crash leftover: its
    * stage dir is gone AND it has aged past the grace window. Both are
    * required — `withStage` writes the marker BEFORE the staging dir
    * exists (Spark's write job creates the dir at setup), so a fresh
    * orphan may be a live writer still in that window; sweeping it
    * would let a later heal delete the stage mid-write and the owner's
    * swap would be spuriously rejected by [[assertStageIntact]] (r14
    * advisor). The heartbeat keeps a live owner's marker fresh, so age
    * + orphanhood together identify a real crash. */
  private[graft] def isOrphanMarker(m: Path): Boolean =
    !Files.exists(stageFor(m)) && !markerFresh(m)

  // single shared daemon thread: touching a file every few minutes per
  // in-flight stage is not worth a pool
  private lazy val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-fence-heartbeat")
      t.setDaemon(true); t
    })

  /** Keep `file`'s mtime fresh (every staleStageMs/3) while `body`
    * runs, so a stage or snapshot claim that legitimately outlives the
    * grace window — a multi-minute commit on a big store — is never
    * mistaken for a crash leftover by another process's heal (r13
    * advisor: markers were written once at stage start). Skipped when
    * the window is test-tiny: a sub-second grace means the test WANTS
    * immediate sweeps. A vanished file is NOT resurrected by the
    * heartbeat — the owner's own swap-time check decides. */
  private[graft] def withHeartbeat[T](file: Path)(body: => T): T = {
    val period = staleStageMs / 3
    if (period < 300) body
    else {
      val task = heartbeats.scheduleAtFixedRate(() => {
        try {
          if (Files.exists(file))
            Files.setLastModifiedTime(file, java.nio.file.attribute
              .FileTime.fromMillis(System.currentTimeMillis))
        } catch { case _: java.io.IOException => () }
      }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
      try body finally task.cancel(false)
    }
  }

  /** The owner-side complement of the heartbeat: called under the swap
    * lock before installing a staged dir. If OUR stage's on-disk marker
    * is gone, another process's heal judged the stage dead and may have
    * deleted (then partially recreated, via late tasks) the staging dir
    * — installing it would be silent data loss, the exact failure the
    * markers guard against. Reject instead; the batch replays. */
  private[graft] def assertStageIntact(p: Path): Unit =
    if (liveStages.contains(canonical(p)) && !Files.exists(stageMarker(p)))
      throw new ConcurrentWriteException(
        s"staged dir $p lost its liveness marker — another process's " +
          "heal swept this stage mid-write, so its content cannot be " +
          "trusted; swap rejected, re-stage and retry")

  /** Run `body` with `p` registered as a live staging dir (in-memory +
    * on-disk marker, heartbeat-refreshed; all cleared on ANY in-process
    * exit, so injected crashes still sweep immediately). */
  private[graft] def withStage[T](p: Path)(body: => T): T = {
    val key = canonical(p)
    liveStages.put(key, ())
    val marker = stageMarker(p)
    try {
      Option(marker.getParent).foreach(Files.createDirectories(_))
      Files.writeString(marker, java.lang.Long.toString(System.currentTimeMillis))
      withHeartbeat(marker)(body)
    } finally {
      liveStages.remove(key)
      Files.deleteIfExists(marker)
    }
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
