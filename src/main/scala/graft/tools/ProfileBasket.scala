package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: q168 form A/B at a given SF — basket collect_set + map-side
  * pair explode vs broadcast-disabled shuffle self-join (exchange reuse). */
object ProfileBasket {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[basket] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val li = Tables.load(spark, sfDir, "lineitem")
    time("A: basket collect_set + explode") {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                         y -> struct(x AS part_a, y AS part_b))))""")).as("p"))
        .select(col("p.part_a"), col("p.part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("B: shuffle self-join (no broadcast)") {
      val lp = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      lp.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(lp.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    // decompose A
    time("A1: baskets only") {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .write.format("noop").mode("overwrite").save()
    }
    time("B1: distinct only") {
      li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
