package graft.tools

import java.nio.file.{Files, Path, Paths}

/** Cross-process writer-fence racer (r12 verdict task 5).
  *
  * Drives the REAL fenced-swap protocol ([[graft.silver.Upsert.atomicSwap]]
  * + [[graft.core.Fence]]'s token/monitor/`FileChannel` lock) from plain
  * JVM code — no Spark — so a test can fork a SECOND JVM running this
  * main against the same table directory and prove the
  * serialize-or-reject contract holds ACROSS PROCESSES, not just across
  * threads (FencingSpec's in-JVM races).
  *
  * Protocol per committed increment: read the fence token, read the
  * table's `counter` file, stage a sibling dir holding `counter + 1`,
  * fenced-swap it in with the captured token. A concurrent commit (other
  * thread OR other process) moves the token and this writer's swap
  * REJECTS with ConcurrentWriteException — it re-reads and retries. Each
  * successful swap therefore increments the counter by exactly one from
  * the value it verifiably read: if every writer retries until it has
  * landed N commits, the final counter is exactly (writers × N) — any
  * lost update shows as a shortfall.
  */
object FenceRace {

  private def readCounter(dest: Path): Long = {
    val f = dest.resolve("counter")
    if (Files.exists(f)) Files.readString(f).trim.toLong else 0L
  }

  /** Land exactly `commits` fenced increments on `dest`, retrying on
    * fence rejections (and on the torn reads a mid-swap racer can see —
    * both surface the same way a real engine retry loop sees them).
    * Returns the number of REJECTED attempts (contention evidence). */
  def race(dest: Path, commits: Int, maxAttempts: Int): Int = {
    var landed = 0
    var rejected = 0
    var attempts = 0
    while (landed < commits) {
      attempts += 1
      require(attempts <= maxAttempts,
        s"fence racer starved: $landed/$commits after $maxAttempts attempts")
      try {
        graft.silver.Upsert.healSwap(dest)
        val gen = graft.core.Fence.generation(dest)
        val cur = readCounter(dest)
        val tmp = Paths.get(dest.toString + ".tmp-" + System.nanoTime())
        graft.core.Fence.withStage(tmp) {
          Files.createDirectories(tmp)
          Files.writeString(tmp.resolve("counter"), (cur + 1L).toString)
          graft.silver.Upsert.atomicSwap(tmp, dest, Some(gen))
        }
        landed += 1
      } catch {
        case _: graft.core.ConcurrentWriteException => rejected += 1
        case _: java.nio.file.NoSuchFileException => rejected += 1
      }
    }
    rejected
  }

  /** args: <tableDir> <commits>, or <tableDir> slowstage <holdMs> —
    * the slow-stage mode holds a LIVE stage open past the staleness
    * grace window (the heartbeat must keep its marker fresh against a
    * foreign process's heals, r13 advisor) before swapping it in.
    * Prints one parseable result line. */
  def main(args: Array[String]): Unit = {
    val dest = Paths.get(args(0))
    if (args.length > 2 && args(1) == "slowstage") {
      val holdMs = args(2).toLong
      val gen = graft.core.Fence.generation(dest)
      val tmp = Paths.get(dest.toString + ".tmp-" + System.nanoTime())
      graft.core.Fence.withStage(tmp) {
        Files.createDirectories(tmp)
        Files.writeString(tmp.resolve("counter"), "777")
        Thread.sleep(holdMs) // outlive the grace window mid-stage
        graft.silver.Upsert.atomicSwap(tmp, dest, Some(gen))
      }
      println("SLOW_STAGE_OK")
    } else {
      val commits = args(1).toInt
      val rejected = race(dest, commits, maxAttempts = commits * 1000)
      println(s"FENCE_RACE landed=$commits rejected=$rejected")
    }
  }
}
