package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q141 via the click_sessions derived layout — plan + timing
  * decomposition under the exact Bench session config. */
object ProfileQ141C {
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
      .config("spark.sql.warehouse.dir",
        s"target/bench-warehouse-q141c-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "events", Seq("user_id"),
      sortCols = Seq("user_id", "ts", "event_id"))
    graft.silver.BucketedTables.ensureDerivedLayout(
      spark, sfDir, "click_sessions", Seq("user_id"),
      sortCols = Seq("user_id", "session_idx")) {
      graft.queries.Advanced.clickSessions(spark, sfDir)
    }
    def q(): DataFrame =
      graft.SparkEntry.allDefs("q141_overlap_join").build(spark, sfDir)
    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach(_ => f.write.format("noop").mode("overwrite").save())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q141c] $label: best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    println(q().queryExecution.executedPlan.toString.take(6000))
    time("full q141 (layout)")(q())
    // pieces
    val sess = graft.silver.BucketedTables
      .layout(spark, sfDir, "click_sessions", Seq("user_id")).get
    time("sessions scan only")(sess)
    val us = graft.functions.Dialect.tsUs _
    val ev = graft.silver.BucketedTables
      .layout(spark, sfDir, "events", Seq("user_id")).get
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), us(col("ts")).as("e_start"),
        (us(col("ts")) + 600000000L).as("e_end"))
    time("errors scan only")(errors)
    val ov = graft.ops.Temporal.overlapCountKeyed(sess, errors,
      Seq("user_id"), "s_start", "s_end", "e_start", "e_end")
    time("overlap join+agg (no sort)")(ov)
    time("with sort")(ov.orderBy(col("user_id"), col("session_idx")))
    time("sort via repartition(1)")(
      ov.repartition(1).sortWithinPartitions(col("user_id"),
        col("session_idx")))
    def timed1(label: String)(f: => DataFrame): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      try time(label)(f)
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    timed1("orderBy under shuffle.partitions=1")(
      ov.orderBy(col("user_id"), col("session_idx")))
    timed1("full q141 under shuffle.partitions=1")(q())
    def timedC(label: String, confs: Map[String, String])(f: => DataFrame): Unit = {
      val prior = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try time(label)(f)
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    timedC("full q141, partitions=1 + AQE off", Map(
      "spark.sql.shuffle.partitions" -> "1",
      "spark.sql.adaptive.enabled" -> "false"))(q())
    timedC("full q141, AQE off only", Map(
      "spark.sql.adaptive.enabled" -> "false"))(q())
    timedC("full q141, p1 + AQE off + SMJ", Map(
      "spark.sql.shuffle.partitions" -> "1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))(q())
    timedC("full q141, p1 + SMJ (AQE on)", Map(
      "spark.sql.shuffle.partitions" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))(q())
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(q().queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
