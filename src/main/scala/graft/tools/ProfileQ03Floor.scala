package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q.cents
import graft.sources.Tables

/** Dev-only: decompose q03's bench-path time into job floor, bucketed
  * scan, per-order aggregate, joins, and rollup — the same session
  * config and silver layout graft.Bench runs, so the numbers add up to
  * the headline row. Written for the COVERAGE.md floor decomposition.
  */
object ProfileQ03Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nBuckets = if (args.length > 1) args(1).toInt else 32
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
      .config("spark.sql.warehouse.dir",
        s"target/bench-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "lineitem", Seq("l_orderkey"), numBuckets = nBuckets)
    println(s"[q03floor] nBuckets=$nBuckets")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 9)(f: () => DataFrame): Unit = {
      noop(f()); noop(f())
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f()); (System.nanoTime() - t0) / 1e9
      }
      println(f"[q03floor] $label%-24s best=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }

    def li = graft.silver.BucketedTables.tableOr(
        spark, sfDir, "lineitem", Seq("l_orderkey"))(
        Tables.load(spark, sfDir, "lineitem"))
      .select(col("l_orderkey"), (cents(col("l_extendedprice"))
        * (lit(100L) - cents(col("l_discount")))).as("rev_c"))
    def perOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(col("rev_c")).as("rev_c"))
    def o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    def c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))

    // 0. pure job floor: one no-op 32-partition job through the scheduler
    time("job_floor_32part")(() =>
      spark.range(0, 32, 1, 32).select(col("id")))
    // 1. the bucketed 2-col scan alone
    time("scan_li_bucketed")(() => li)
    // 2. scan + exchange-free per-order aggregate
    time("plus_per_order_agg")(() => perOrder)
    // 3. + orders broadcast join
    time("plus_orders_join")(() =>
      perOrder.join(o, col("l_orderkey") === col("o_orderkey")))
    // 4. + customer join + 25-row rollup (full minus the names attach)
    time("plus_rollup")(() =>
      perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders")))
    // 5. the full headline query under its declared confs
    time("FULL_q03")(() =>
      graft.SparkEntry.withQueryConfs(spark, "q03_join_revenue_by_nation") {
        graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir)
      })
    spark.stop()
  }
}
