package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q.cents
import graft.sources.Tables

/** Dev-only: isolate q03's stage structure and steady-state time. */
object ProfileQ03 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 9)(f: () => DataFrame): Unit = {
      noop(f()); noop(f()) // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f()); (System.nanoTime() - t0) / 1e9
      }
      println(f"[q03] $label: best=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }

    def li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), (cents(col("l_extendedprice"))
        * (lit(100L) - cents(col("l_discount")))).as("rev_c"))
    def o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    def c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    def n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    def r = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
    def names = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))

    // decomposition
    time("scan_li_2col")(() => li)
    time("scan_o_filtered")(() => o)
    time("li_join_o_bcast")(() => li.join(o, col("l_orderkey") === col("o_orderkey")))
    time("li_join_o_join_c")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey")))
    time("plus_agg1")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c")))

    // current full shape
    time("CURRENT")(() =>
      graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir))

    // variant: single agg with count_distinct
    time("VAR_count_distinct")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count_distinct(col("l_orderkey")).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders")))

    // variant: pre-aggregate lineitem per order BEFORE the joins
    time("VAR_preagg_li")(() =>
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders")))

    // variant: current two-level agg but fused dim names
    time("VAR_fused_names")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders")))

    // micro: isolate the agg cost
    time("li_global_sum")(() => li.agg(sum(col("rev_c"))))
    time("li_groupby_orderkey")(() =>
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c")))
    time("li_raw_global_sum")(() => Tables.load(spark, sfDir, "lineitem")
      .agg(sum(col("l_extendedprice"))))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("plus_agg1_8part")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c")))
    time("CURRENT_8part")(() =>
      graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir))
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    // variant: no AQE
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("CURRENT_noaqe")(() =>
      graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // variant: AQE coalesce honors advisory size (docs-recommended)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    time("CURRENT_sizefirst")(() =>
      graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir))
    time("agg1_sizefirst")(() =>
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c")))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")

    spark.stop()
  }
}
