package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q.cents
import graft.sources.Tables

/** Dev-only: q03 orders-side A/B — broadcast (current) vs co-bucketed
  * sort-merge on orders bucketed by o_orderkey, in one process under the
  * bench session settings (AQE off, 1 shuffle partition per q03 confs). */
object ProfileQ03Bucket {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.warehouse.dir",
        s"target/bench-warehouse-profile-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val liTable = graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "lineitem", Seq("l_orderkey"))
    val oTable = graft.silver.BucketedTables.ensureLayout(
      spark, sfDir, "orders", Seq("o_orderkey"),
      sortCols = Seq("o_orderkey"))

    def q03(ordersBucketed: Boolean): DataFrame = {
      val li = spark.table(liTable)
      val oBase = if (ordersBucketed) spark.table(oTable)
                  else Tables.load(spark, sfDir, "orders")
      val o = oBase
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val oSide = if (ordersBucketed) o.hint("merge") else o
      val c = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val r = Tables.load(spark, sfDir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val names = n.join(broadcast(r),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      li.select(col("l_orderkey"), (cents(col("l_extendedprice"))
          * (lit(100L) - cents(col("l_discount")))).as("rev_c"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c"))
        .join(oSide, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    }

    def bench(label: String, f: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      (1 to 2).foreach { _ =>
        f.write.format("noop").mode("overwrite").save()
      }
      var best = Double.MaxValue
      (1 to 9).foreach { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[profile] $label: $best%.3f s")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }

    bench("orders broadcast  r1", q03(false))
    bench("orders co-bucket  r1", q03(true))
    bench("orders broadcast  r2", q03(false))
    bench("orders co-bucket  r2", q03(true))
    println("---- co-bucket plan ----")
    println(q03(true).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
