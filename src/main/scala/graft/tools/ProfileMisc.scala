package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Dev-only: headline-query shape experiments at sf0.1 — final-sort cost
  * and window-vs-aggregate top-1-per-group. */
object ProfileMisc {
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
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

    val o = Tables.load(spark, sfDir, "orders")

    // ---- q06: window+filter vs max_by aggregate, with/without final sort
    def q06Window(sort: Boolean): DataFrame = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val base = o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"))
      if (sort) base.orderBy(col("o_custkey")) else base
    }
    def q06MaxBy(sort: Boolean): DataFrame = {
      val base = o.groupBy(col("o_custkey"))
        .agg(max_by(
          struct(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
            col("o_totalprice")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("top"))
        .select(col("o_custkey"), col("top.o_orderkey"),
          col("top.order_date"), col("top.o_totalprice"))
      if (sort) base.orderBy(col("o_custkey")) else base
    }
    time("q06_window_sort")(noop(q06Window(true)))
    time("q06_window_nosort")(noop(q06Window(false)))
    time("q06_maxby_sort")(noop(q06MaxBy(true)))
    time("q06_maxby_nosort")(noop(q06MaxBy(false)))
    val a = q06Window(true).collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    val b = q06MaxBy(true).collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    println(s"[profile] q06 maxby==window: ${a == b}")

    // ---- per-query: current def vs def-without-final-sort (rebuilt frames)
    time("q01_current")(noop(q("q01_pricing_summary")))
    time("q03_current")(noop(q("q03_join_revenue_by_nation")))
    time("q12_current")(noop(q("q12_unnest_tokens")))
    time("q20_current")(noop(q("q20_window_running_sum")))
    time("q23_current")(noop(q("q23_minhash_signature")))
    time("q27_current")(noop(q("q27_cosine_topk")))
    spark.stop()
  }
}
