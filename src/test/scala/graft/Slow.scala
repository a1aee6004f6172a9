package graft

/** Test-level form of the [[SlowTest]] class annotation (same tag name,
  * so the build.sbt `-l graft.SlowTest` exclusion covers both): for the
  * few multi-ten-second seeded sweeps living inside otherwise-fast
  * correctness suites. Run them with SPARK_GRAFT_SLOW_TESTS=on. */
object Slow extends org.scalatest.Tag("graft.SlowTest")
