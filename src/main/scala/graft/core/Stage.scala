package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative and self-derived plans, durable when
  * the deployment asks for it.
  *
  * Iterative operators (connected-components label propagation, Lloyd
  * refinement) and self-derived snapshot writes must cut lineage each
  * round — otherwise the plan grows with the iteration count and a
  * recompute would cascade through every previous round. The primitive
  * matters at cluster scale:
  *
  *  - `localCheckpoint()` materializes to EXECUTOR-LOCAL blocks: fast
  *    (no DFS round-trip) but lost with the executor — a single executor
  *    failure mid-iteration kills the job unrecoverably, because the
  *    truncated lineage cannot recompute the lost blocks.
  *  - `checkpoint()` materializes to the `sparkContext.setCheckpointDir`
  *    filesystem (HDFS/S3 on a real cluster): survives executor loss;
  *    costs one DFS write+read per truncation.
  *
  * This helper picks reliable `checkpoint()` whenever a checkpoint dir is
  * configured and falls back to `localCheckpoint()` otherwise (single-JVM
  * dev/bench, where executor loss means JVM loss and durability buys
  * nothing). Cluster deployments opt in with one line:
  * `spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")`.
  *
  * Both forms are eager — the frame is materialized before `stage`
  * returns, so callers can unpersist/overwrite inputs the staged frame
  * was derived from (the snapshot-rewrite pattern in silver.Snapshots).
  *
  * Lifetime: localCheckpoint blocks free when the RDD is
  * garbage-collected (ContextCleaner); reliable checkpoint FILES are
  * only removed automatically when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — set it in
  * long-lived cluster deployments that stage per-call frames
  * (sortedNeighborhood, packSequences), or stale checkpoint dirs
  * accumulate on DFS.
  */
object Stage {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
