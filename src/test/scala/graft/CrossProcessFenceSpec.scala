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
}
