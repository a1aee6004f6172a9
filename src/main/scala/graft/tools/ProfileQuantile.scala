package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose exactLongQuantiles cost at a given SF. */
object ProfileQuantile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sfscaled/sf1")
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
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val cents = (round(col("o_totalprice") * 100)).cast("long")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => { spark.sharedState.cacheManager.clearCache(); f })
      val ts = (1 to 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq] $label: best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("head pass only") {
      orders.select(cents.as("v")).where(col("v").isNotNull)
        .agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    }
    time("one histogram pass (no cache)") {
      orders.select(cents.as("v")).where(col("v").isNotNull)
        .groupBy(expr("v div 1024").as("b")).agg(count(lit(1)).as("c"))
        .collect()
    }
    time("full exactLongQuantiles x3q") {
      graft.ops.Quantile.exactLongQuantiles(orders, cents,
        Seq(0.5, 0.9, 0.99))
    }
    time("full exactGroupedQuantile(events)") {
      val ev = graft.sources.Tables.load(spark, sfDir, "events")
      graft.ops.Quantile.exactGroupedQuantile(ev, col("event_type"),
        (round(col("value") * 100)).cast("long"), 0.5).collect()
    }
    spark.stop()
  }
}
