package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B the two NTILE faces (r14): Catalyst's global window (one task —
  * Spark warns "No Partition Defined for Window") vs
  * `Quantile.bucketize`'s shared-bisection + broadcast-range-lookup
  * path, and the grouped variants. Usage:
  *   ProfileNtile <sfDir> [k=8] [rounds=3]
  * Prints one JSON line per measurement. Run ISOLATED like every anchor.
  */
object ProfileNtile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).cache()
    val n = orders.count() // materialize the cache before timing
    def timed(tag: String)(body: => Long): Unit = {
      val walls = (1 to rounds).map { _ =>
        val t0 = System.nanoTime()
        val cnt = body
        val w = (System.nanoTime() - t0) / 1e9
        require(cnt == n, s"$tag returned $cnt rows for $n input")
        w
      }
      println(s"""{"op":"$tag","rows":$n,"k":$k,""" +
        s""""wall_s":${walls.map(w => math.rint(w * 1000) / 1000)
          .mkString("[", ",", "]")}}""")
    }
    timed("window_ntile") {
      orders.withColumn("b",
        ntile(k).over(Window.orderBy(col("o_orderkey"))))
        .filter(col("b") >= 1).count()
    }
    timed("bucketize") {
      graft.ops.Quantile.bucketize(orders, col("o_orderkey"), k)
        .filter(col("bucket") >= 1).count()
    }
    // grouped: o_custkey % 4 = four corpus-sized groups (the worst
    // case for a partitioned window: parallelism 4)
    val grouped = orders.withColumn("g", pmod(col("o_custkey"), lit(4)))
      .cache()
    grouped.count()
    timed("window_ntile_grouped4") {
      grouped.withColumn("b", ntile(k).over(
        Window.partitionBy(col("g")).orderBy(col("o_orderkey"))))
        .filter(col("b") >= 1).count()
    }
    timed("bucketizeGrouped4") {
      graft.ops.Quantile.bucketizeGrouped(grouped, col("g"),
        col("o_orderkey"), k)
        .filter(col("bucket") >= 1).count()
    }
    spark.stop()
  }
}
