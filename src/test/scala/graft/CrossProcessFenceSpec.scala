package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Fence
import graft.tools.FenceRace

/** Cross-PROCESS writer-writer fencing (r12 verdict task 5): the
  * `FileChannel` lock on the `<dir>.lock` sibling must extend the
  * serialize-or-reject contract FencingSpec proves across threads to
  * writers in different JVMs sharing a filesystem. A second JVM is
  * actually forked (same classpath as this forked test JVM) and races
  * [[graft.tools.FenceRace]]'s fenced counter increments against an
  * in-process racer on one table dir: every commit reads the counter
  * under a captured fence token and lands counter+1 only if the token
  * is unmoved, so the final counter equals total commits EXACTLY unless
  * an update was lost.
  *
  * No Spark involved — the protocol under test is pure NIO
  * (token/lock/rename), which is also why the child JVM starts fast.
  */
class CrossProcessFenceSpec extends AnyFunSuite {

  test("two JVMs racing fenced swaps on one table: no lost update, " +
      "rejections surface cleanly") {
    val dir = Files.createTempDirectory("xproc-fence-")
    val dest = dir.resolve("table")
    val commits = 120

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    // this test JVM is forked by sbt, so java.class.path is the real
    // test classpath (graft classes + scala-library + spark jars)
    val cp = sys.props("java.class.path")
    val child = new ProcessBuilder(
      javaBin, "-cp", cp, "graft.tools.FenceRace",
      dest.toString, commits.toString)
      .redirectErrorStream(true).start()

    // wait for the child's first commit so the two racers genuinely
    // overlap (a JVM takes ~1 s to start; racing before it exists would
    // prove nothing about cross-process interleaving)
    val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
    while (!Files.exists(dest.resolve("counter")) &&
        System.nanoTime < deadline) Thread.sleep(10)
    assert(Files.exists(dest.resolve("counter")),
      "child JVM never landed a commit within 60 s")

    // race in-process against the child
    val parentRejected = FenceRace.race(dest, commits,
      maxAttempts = commits * 1000)

    val out = new String(child.getInputStream.readAllBytes())
    assert(child.waitFor() == 0, s"child JVM failed:\n$out")
    assert(out.contains(s"FENCE_RACE landed=$commits"),
      s"child did not land its commits:\n$out")

    val finalCounter =
      Files.readString(dest.resolve("counter")).trim.toLong
    assert(finalCounter == 2L * commits,
      s"lost update across processes: counter $finalCounter after " +
        s"${2 * commits} fenced commits")
    // the fence token moved once per commit — the generation IS the
    // commit count, so a silent last-wins (same generation reused)
    // would also show here
    assert(Fence.generation(dest) == 2L * commits)

    val childRejected =
      "rejected=(\\d+)".r.findFirstMatchIn(out).get.group(1).toInt
    info(s"contention: parent rejected $parentRejected, " +
      s"child rejected $childRejected")
    graft.silver.Upsert.deleteRecursively(dir)
  }

  test("lock holder killed -9 mid-run: the OS releases the lock, the " +
      "survivor heals and keeps committing, state stays consistent") {
    val dir = Files.createTempDirectory("xproc-kill-")
    val dest = dir.resolve("table")
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    // a child that would run for a long time — we kill it mid-commit
    val child = new ProcessBuilder(
      javaBin, "-cp", cp, "graft.tools.FenceRace",
      dest.toString, "1000000")
      .redirectErrorStream(true).start()
    // let it land a few commits so the kill hits a busy protocol
    val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
    def counter: Long =
      try Files.readString(dest.resolve("counter")).trim.toLong
      catch { case _: Exception => -1L }
    while (counter < 5 && System.nanoTime < deadline) Thread.sleep(5)
    assert(counter >= 5, "child never got going")
    child.destroyForcibly()
    child.waitFor()

    // the survivor must be able to take the file lock (a stuck OS lock
    // would block here forever → suite timeout), heal whatever the kill
    // left (missing dest between renames, orphan .old/.tmp/.live), and
    // commit. The invariant gen == counter (each fenced commit bumps
    // both atomically) proves the killed writer tore nothing.
    val rejected = FenceRace.race(dest, commits = 25,
      maxAttempts = 25 * 1000)
    val finalCounter = counter
    assert(Fence.generation(dest) == finalCounter,
      s"generation ${Fence.generation(dest)} != counter $finalCounter " +
        "after kill -9 recovery — a commit tore")
    assert(finalCounter >= 25 + 5)
    info(s"survivor committed 25 (rejected $rejected attempts), " +
      s"final counter $finalCounter")
    // a stage marker orphaned by the kill ages out: with grace 0 the
    // next heal sweeps any leftover .live-/.tmp- siblings
    sys.props.put("graft.fence.staleStageMs", "0")
    try graft.silver.Upsert.healSwap(dest)
    finally sys.props.remove("graft.fence.staleStageMs")
    val strays = graft.core.Fs.children(dir)
      .map(_.getFileName.toString)
      .filter(n => n.contains(".tmp-") || n.contains(".live-") ||
        n.contains(".old-"))
    assert(strays.isEmpty, s"kill leftovers survived the stale heal: $strays")
    graft.silver.Upsert.deleteRecursively(dir)
  }

  test("chaos: kill -9 a concurrent writer WHILE the survivor races — " +
      "a waiter blocked on the dead holder's lock must unblock") {
    val dir = Files.createTempDirectory("xproc-chaos-")
    val dest = dir.resolve("table")
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    FenceRace.race(dest, commits = 3, maxAttempts = 3000) // seed
    def counter: Long =
      Files.readString(dest.resolve("counter")).trim.toLong
    (1 to 3).foreach { round =>
      val child = new ProcessBuilder(
        javaBin, "-cp", cp, "graft.tools.FenceRace",
        dest.toString, "1000000")
        .redirectErrorStream(true).start()
      // kill at a different phase each round, while the parent below is
      // mid-race: if the child dies holding the OS lock, the parent is
      // the blocked waiter that must unblock
      val killer = new Thread(() => {
        Thread.sleep(150L + round * 211L)
        child.destroyForcibly(): Unit
      })
      killer.start()
      val before = counter
      FenceRace.race(dest, commits = 30, maxAttempts = 300000)
      killer.join(); child.waitFor()
      graft.silver.Upsert.healSwap(dest)
      val after = counter
      assert(Fence.generation(dest) == after,
        s"round $round: generation != counter after mid-race kill")
      assert(after >= before + 30,
        s"round $round: survivor's commits went missing")
    }
    graft.silver.Upsert.deleteRecursively(dir)
  }

  test("file lock is reentrant within the owning section and the stage " +
      "marker protects a foreign live stage from heals") {
    val dir = Files.createTempDirectory("xproc-marker-")
    val dest = dir.resolve("t")
    // nested acquisition (fold's carry wrapping atomicSwap's) must not
    // throw OverlappingFileLockException
    Fence.withMonitor(dest) {
      Fence.withFileLock(dest) {
        Fence.withFileLock(dest) {
          Files.createDirectories(dest)
        }
      }
    }
    // a FOREIGN process's fresh stage = on-disk marker only (no in-JVM
    // registration): healSwap must leave the staged dir alone
    val tmp = Paths.get(dest.toString + ".tmp-42")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("data"), "staged-by-other-process")
    val marker = Paths.get(dest.toString + ".live-42")
    Files.writeString(marker,
      java.lang.Long.toString(System.currentTimeMillis))
    graft.silver.Upsert.healSwap(dest)
    assert(Files.exists(tmp),
      "heal swept another process's live staging dir")
    // once the marker ages past the grace window the same stage is a
    // crash leftover and sweeps (marker included)
    sys.props.put("graft.fence.staleStageMs", "0")
    try graft.silver.Upsert.healSwap(dest)
    finally sys.props.remove("graft.fence.staleStageMs")
    assert(!Files.exists(tmp), "stale foreign stage survived the heal")
    assert(!Files.exists(marker), "stale stage marker survived the heal")
    graft.silver.Upsert.deleteRecursively(dir)
  }

  test("heartbeat across processes: a stage held open PAST the grace " +
      "window survives a foreign JVM's aggressive heals and its swap " +
      "lands (r13 advisor, medium)") {
    val prev = sys.props.get("graft.fence.staleStageMs")
    // grace 4s, heartbeat ~1.33s: a 3× tick margin, so a JIT-slow or
    // loaded child JVM delaying a tick by a second still never ages out
    // (1.5s grace flaked once in a full-suite run)
    sys.props.put("graft.fence.staleStageMs", "4000")
    try {
      val dir = Files.createTempDirectory("xproc-hb-")
      val dest = dir.resolve("t")
      FenceRace.race(dest, commits = 1, maxAttempts = 100) // seed
      val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
      val cp = sys.props("java.class.path")
      // the child holds a live stage for 9s — 2.25× the grace window
      val child = new ProcessBuilder(
        javaBin, "-Dgraft.fence.staleStageMs=4000", "-cp", cp,
        "graft.tools.FenceRace", dest.toString, "slowstage", "9000")
        .redirectErrorStream(true).start()
      // heal aggressively from THIS process the whole time: without the
      // heartbeat the child's marker ages out at 1.5s and these heals
      // sweep its staging dir mid-write
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (child.isAlive && System.nanoTime < deadline) {
        graft.silver.Upsert.healSwap(dest)
        Thread.sleep(200)
      }
      val out = new String(child.getInputStream.readAllBytes())
      assert(child.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
        && child.exitValue == 0, s"slow-stage child failed:\n$out")
      assert(out.contains("SLOW_STAGE_OK"), out)
      assert(Files.readString(dest.resolve("counter")).trim == "777",
        "the heartbeated slow stage's swap did not land")
      graft.silver.Upsert.deleteRecursively(dir)
    } finally prev match {
      case Some(v) => sys.props.put("graft.fence.staleStageMs", v)
      case None => sys.props.remove("graft.fence.staleStageMs")
    }
  }
}
