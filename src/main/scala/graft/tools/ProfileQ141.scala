package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Temporal
import graft.sources.Tables

/** Dev-only: A/B variants of q141_overlap_join at sf0.1 in ONE process
  * (isolated processes are JIT-cold and not comparable; within-process
  * best-of-N is). Variants: original (recompute sess twice, shuffle
  * attach), persist sess, persist+broadcast attach, AQE off for each. */
object ProfileQ141 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val us = graft.functions.Dialect.tsUs _

    def build(persistSess: Boolean, bcast: Boolean): DataFrame = {
      val ev = Tables.load(spark, sfDir, "events")
      val sess0 = Temporal.sessionize(
          ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(us(min(col("ts"))).as("s_start"), us(max(col("ts"))).as("s_end"))
      val sess = if (persistSess) sess0.persist(StorageLevel.MEMORY_AND_DISK)
                 else sess0
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), us(col("ts")).as("e_start"),
          (us(col("ts")) + 600000000L).as("e_end"))
      val counts0 = Temporal.overlapJoin(sess, errors, Seq("user_id"),
          "s_start", "s_end", "e_start", "e_end", bucketUs = 600000000L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_err"))
      val counts = if (bcast) broadcast(counts0) else counts0
      sess.join(counts, Seq("user_id", "session_idx"), "left")
        .select(col("user_id"), col("session_idx"), col("s_start"),
          col("s_end"), coalesce(col("n_err"), lit(0L)).as("n_err"))
        .orderBy(col("user_id"), col("session_idx"))
    }

    def bench(label: String, aqe: Boolean, f: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      // warmups
      (1 to 2).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        f.write.format("noop").mode("overwrite").save()
      }
      var best = Double.MaxValue
      (1 to 7).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[profile] $label: $best%.3f s")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // one-pass variant: LEFT OUTER bucketed join with overlap+canonical
    // predicates in the JOIN CONDITION, then a single group-count — no
    // second sess branch, no attach join
    def buildOuter(bucketed: Boolean = false): DataFrame = {
      val b = 600000000L
      val ev =
        if (bucketed) graft.silver.BucketedTables.tableOr(
          spark, sfDir, "events", Seq("user_id"))(
          Tables.load(spark, sfDir, "events"))
        else Tables.load(spark, sfDir, "events")
      val sess = Temporal.sessionize(
          ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(us(min(col("ts"))).as("s_start"), us(max(col("ts"))).as("s_end"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), us(col("ts")).as("e_start"),
          (us(col("ts")) + b).as("e_end"))
      val l = sess.withColumn("_lb", explode(sequence(
        floor(col("s_start") / b).cast("long"),
        floor(col("s_end") / b).cast("long"))))
      val r = errors.withColumn("_rb", explode(sequence(
        floor(col("e_start") / b).cast("long"),
        floor(col("e_end") / b).cast("long"))))
      val joined = l.join(r,
        col("user_id") === col("e_user") && col("_lb") === col("_rb") &&
          col("s_start") <= col("e_end") && col("e_start") <= col("s_end") &&
          col("_lb") === greatest(
            floor(col("s_start") / b).cast("long"),
            floor(col("e_start") / b).cast("long")),
        "left_outer")
      joined.groupBy(col("user_id"), col("session_idx"), col("s_start"),
          col("s_end"))
        .agg(count(col("e_start")).as("n_err"))
        .select(col("user_id"), col("session_idx"), col("s_start"),
          col("s_end"), col("n_err"))
        .orderBy(col("user_id"), col("session_idx"))
    }

    graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "events", Seq("user_id"),
      sortCols = Seq("user_id", "ts", "event_id"))
    bench("outer raw-parquet   r1", aqe = true, buildOuter(false))
    bench("outer bucketed-ev   r1", aqe = true, buildOuter(true))
    bench("outer raw-parquet   r2", aqe = true, buildOuter(false))
    bench("outer bucketed-ev   r2", aqe = true, buildOuter(true))

    // ---- floor decomposition --------------------------------------------
    import spark.implicits._
    val noop = (1L to 32L).toDF("x").repartition(32)
    bench("floor: noop 32-part job    ", aqe = true, {
      noop.toDF()
    })
    val ev = Tables.load(spark, sfDir, "events")
    bench("floor: clicks scan+filter  ", aqe = true, {
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
    })
    bench("floor: sessionize+agg      ", aqe = true, {
      Temporal.sessionize(ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(us(min(col("ts"))).as("s_start"), us(max(col("ts"))).as("s_end"))
    })
    spark.stop()
  }
}
