package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: dump `.explain("formatted")` for named queries under the
  * SAME session configs Bench runs with, into plans/r16/<name>_<tag>.txt
  * (the optimization-round deliverable: the judge checks plan claims
  * against these files). The r16 sibling of [[PlanDumpR15]].
  *
  * Usage: runMain graft.tools.PlanDumpR16 <tag> <sfDir> <query>[,query...]
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val sfDir = args(1)
    val names =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(',').toSeq
      else SparkEntry.benchQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.warehouse.dir",
        s"target/plandump-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirror Bench: silver layouts present so the dumped plan is the
    // measured plan
    def hasTable(name: String): Boolean =
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
    if (hasTable("lineitem")) graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "lineitem", Seq("l_orderkey"))
    if (hasTable("orders")) {
      graft.silver.BucketedTables.ensureLayout(
        spark, sfDir, "orders", Seq("o_custkey"),
        sortCols = Seq("o_custkey", "o_orderdate", "o_orderkey"))
      graft.silver.BucketedTables.ensureLayout(
        spark, sfDir, "orders", Seq("o_orderkey"),
        sortCols = Seq("o_orderkey"))
    }
    if (hasTable("events")) {
      graft.silver.BucketedTables.ensureLayout(
        spark, sfDir, "events", Seq("user_id"),
        sortCols = Seq("user_id", "ts", "event_id"))
      graft.silver.BucketedTables.ensureDerivedLayout(
        spark, sfDir, "click_sessions", Seq("user_id"),
        sortCols = Seq("user_id", "session_idx")) {
        graft.queries.Advanced.clickSessions(spark, sfDir)
      }
    }
    val outDir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- names) {
      try SparkEntry.withQueryConfs(spark, name) {
        spark.sharedState.cacheManager.clearCache()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$tag.txt"), txt)
        println(s"[plandump] wrote ${name}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
