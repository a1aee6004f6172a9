package graft.tools

import org.apache.spark.sql.SparkSession

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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val q = () => graft.SparkEntry.queries("q03_join_revenue_by_nation")(spark, sfDir)
    noop(q())
    val ts = (1 to 9).map { _ =>
      val t0 = System.nanoTime(); noop(q()); (System.nanoTime() - t0) / 1e9
    }
    println(f"[q03] best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")

    // variant B: aggregate on integer keys only; attach names post-agg
    import org.apache.spark.sql.functions._
    import graft.queries.Q.cents
    import graft.sources.Tables
    def qB() = {
      val li = Tables.load(spark, sfDir, "lineitem")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val r = Tables.load(spark, sfDir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val joined = li
        .select(col("l_orderkey"), (cents(col("l_extendedprice"))
          * (lit(100L) - cents(col("l_discount")))).as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
      joined
        .groupBy(col("c_nationkey"), col("l_orderkey"))
        .agg(sum(col("rev_c")).as("rev_c"))
        .groupBy(col("c_nationkey"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
    }
    noop(qB())
    val tsB = (1 to 9).map { _ =>
      val t0 = System.nanoTime(); noop(qB()); (System.nanoTime() - t0) / 1e9
    }
    println(f"[q03B] best=${tsB.min}%.3f all=${tsB.map(t => f"$t%.3f").mkString(",")}")
    val a = q().orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq
    val b = qB().orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq
    println(s"[q03] B==current: ${a == b}")
    spark.stop()
  }
}
