package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: decompose the per-query floor (job submit, scan, shuffle,
  * noop write) that dominates sub-second headline queries at sf0.1. */
object ProfileFloor {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, reps: Int = 7)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $label: best=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.load(spark, sfDir, "lineitem")

    // pure job machinery
    time("empty_job_1part")(spark.sparkContext.parallelize(Seq(1), 1).count())
    time("empty_job_32part")(spark.sparkContext.parallelize(1 to 32, 32).count())
    time("range10_count")(spark.range(10).count())
    time("range10_noop")(noop(spark.range(10).toDF("id")))
    time("range10M_noop")(noop(spark.range(10000000).toDF("id")))

    // scan costs
    time("li_count")(li.count())
    time("li_scan_1col_noop")(noop(li.select(col("l_quantity"))))
    time("li_scan_6col_noop")(noop(li.select(col("l_returnflag"),
      col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"))))

    // q01 shape variants: same agg, different endings
    def q01(df: DataFrame): DataFrame = {
      val q = graft.queries.Q.cents(col("l_quantity"))
      val p = graft.queries.Q.cents(col("l_extendedprice"))
      val omd = lit(100L) - graft.queries.Q.cents(col("l_discount"))
      val opt = lit(100L) + graft.queries.Q.cents(col("l_tax"))
      df.filter(col("l_shipdate") <= lit("1998-09-02"))
        .select(col("l_returnflag"), col("l_linestatus"),
          q.as("q"), p.as("p"), omd.as("omd"), opt.as("opt"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("q")) / 100.0).as("sum_qty"),
          (sum(col("p")) / 100.0).as("sum_base_price"),
          (sum(col("p") * col("omd")) / 1e4).as("sum_disc_price"),
          (sum(col("p") * col("omd") * col("opt")) / 1e6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
    }
    time("q01_noop")(noop(q01(li)))
    time("q01_collect")(q01(li).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q01_noop_noaqe")(noop(q01(li)))
    time("q01_collect_noaqe")(q01(li).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.stop()
  }
}
