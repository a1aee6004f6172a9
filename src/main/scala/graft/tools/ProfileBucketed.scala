package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.silver.BucketedTables

/** Dev-only: verify the bucketed silver layouts give q03/q06/q20 their
  * exchange-free plans, and measure the steady-state gain vs raw parquet.
  * Replicates the Bench session config exactly (see memory: profilers
  * without the bench config mislead).
  */
object ProfileBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
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
        s"target/profile-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 9)(f: () => DataFrame): Unit = {
      noop(f()); noop(f())
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f()); (System.nanoTime() - t0) / 1e9
      }
      println(f"[bkt] $label: best=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }
    def q(name: String): DataFrame = graft.SparkEntry.queries(name)(spark, sfDir)

    // raw-parquet baselines first (layouts not yet registered)
    time("q03_raw")(() => q("q03_join_revenue_by_nation"))
    time("q06_raw")(() => q("q06_window_latest_order"))
    time("q20_raw")(() => q("q20_window_running_sum"))

    val t0 = System.nanoTime()
    BucketedTables.ensureLayout(spark, sfDir, "lineitem", Seq("l_orderkey"))
    BucketedTables.ensureLayout(spark, sfDir, "orders", Seq("o_custkey"),
      sortCols = Seq("o_custkey", "o_orderdate", "o_orderkey"))
    println(f"[bkt] layout build: ${(System.nanoTime() - t0) / 1e9}%.3f s")

    Seq("q03_join_revenue_by_nation", "q06_window_latest_order",
        "q20_window_running_sum").foreach { name =>
      val p = q(name).queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length +
        "Exchange SinglePartition".r.findAllIn(p).length +
        "Exchange rangepartitioning".r.findAllIn(p).length
      val sorts = "\\bSort \\[".r.findAllIn(p).length
      println(s"[bkt] $name bucketed plan: shuffleExchanges=$shuffles sorts=$sorts")
      if (sys.env.contains("SPARK_GRAFT_SHOW_PLAN")) println(p)
    }

    time("q03_bucketed")(() => q("q03_join_revenue_by_nation"))
    time("q06_bucketed")(() => q("q06_window_latest_order"))
    time("q20_bucketed")(() => q("q20_window_running_sum"))

    // ---- q03 variants on the bucketed layout -------------------------
    import org.apache.spark.sql.functions._
    import graft.queries.Q.cents
    import graft.sources.Tables
    def li = spark.table("graft_bench.lineitem_by_l_orderkey")
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

    def varPreagg() =
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    println("[bkt] VAR_preagg plan: " + {
      val p = varPreagg().queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(p).length + " shuffles"
    })
    time("q03_VAR_preagg")(() => varPreagg())

    BucketedTables.ensureLayout(spark, sfDir, "orders", Seq("o_orderkey"))
    def ob = spark.table("graft_bench.orders_by_o_orderkey")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    def varSmj() =
      li.join(ob.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    println("[bkt] VAR_smj plan: " + {
      val p = varSmj().queryExecution.executedPlan.toString
      ("Exchange hashpartitioning".r.findAllIn(p).length + " shuffles, " +
        "\\bSort \\[".r.findAllIn(p).length + " sorts")
    })
    time("q03_VAR_smj")(() => varSmj())

    def varPreaggSmj() =
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(ob.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    time("q03_VAR_preagg_smj")(() => varPreaggSmj())

    // decomposition of the preagg variant
    time("d_li_scan")(() => li)
    time("d_li_preagg")(() =>
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c")))
    time("d_preagg_join_o")(() =>
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey")))
    time("d_preagg_join_oc")(() =>
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey")))
    time("d_o_broadcast_alone")(() =>
      o.join(broadcast(c), col("o_custkey") === col("c_custkey")))

    // AQE off for the whole preagg shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q03_preagg_NOAQE")(() => varPreagg())
    time("q03_entry_NOAQE")(() => q("q03_join_revenue_by_nation"))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("q03_entry_NOAQE_8part")(() => q("q03_join_revenue_by_nation"))
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    time("q03_entry_NOAQE_1part")(() => q("q03_join_revenue_by_nation"))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // enrichment variant: orderkey→nationkey map broadcast once
    def varEnriched() = {
      val omap = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      li.groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
        .join(broadcast(omap), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    }
    time("q03_VAR_enriched")(() => varEnriched())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q03_VAR_enriched_NOAQE")(() => varEnriched())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.stop()
  }
}
