package graft.core

/** Named fault-injection points inside the commit protocols (r11 verdict
  * task 3). Production cost is one volatile read of an empty map; a spec
  * arms a point with an action (throw, typically) to simulate a crash at
  * EXACTLY that step, then asserts readers see old-or-new state and that
  * heal/retention repairs the store for the next writer.
  *
  * Points (names are load-bearing for CrashMatrixSpec):
  *  - `swap.staged`          — staged dir fully written, swap not begun
  *  - `swap.between-renames` — dest moved to .old, staged not yet at dest
  *  - `swap.before-retire`   — staged at dest, .old not yet deleted
  *  - `snapshot.staged`      — version dir written, pointer not moved
  *  - `snapshot.pointer-tmp` — pointer tmp written, not yet ATOMIC_MOVEd
  *  - `buckets.staged`       — staged catalog table written, swap not begun
  *  - `buckets.dropped`      — live table DROPped, staged not yet renamed
  *  - `buckets.renamed`      — staged renamed in, old gen not yet retired
  *  - `state.touched-rename` — touched-bucket files staged, rank→bucket
  *                             renames not yet run
  *  - `state.manifest`       — staged manifest written, swap not begun
  */
object CrashPoints {

  /** Thrown by the default armed action — lets specs catch precisely the
    * injected crash and nothing else. */
  final class InjectedCrash(point: String)
    extends RuntimeException(s"injected crash at $point")

  @volatile private var armed: Map[String, () => Unit] = Map.empty

  /** Production hook: no-op unless a spec armed this point. */
  def hit(point: String): Unit =
    if (armed.nonEmpty) armed.get(point).foreach(_.apply())

  /** Arm `point` to throw [[InjectedCrash]] once (self-disarming, so the
    * heal/retry path that follows runs the protocol to completion). */
  def armOnce(point: String): Unit = synchronized {
    armed = armed.updated(point, { () =>
      synchronized { armed = armed - point }
      throw new InjectedCrash(point)
    })
  }

  def disarmAll(): Unit = synchronized { armed = Map.empty }
}
