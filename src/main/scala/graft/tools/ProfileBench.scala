package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DecimalType}

import graft.queries.Q
import graft.sources.Tables

/** Dev-only: timing variants of the headline bench queries to locate the
  * local-mode bottlenecks (single-row-group scans, decimal math, shuffle).
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val liRaw = Tables.load(spark, sfDir, "lineitem")

    // floor: how much is pure per-query overhead?
    val tiny = spark.range(10).toDF("id")
    time("floor_range10")(noop(tiny))
    time("scan_only_1task")(noop(liRaw.select(col("l_quantity"))))
    time("scan_count")(assert(liRaw.count() == 600000))

    val filtered = liRaw
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
    val one = lit(new java.math.BigDecimal("1.00"))

    def aggDecimal(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
            * (one + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    def aggLong(df: DataFrame): DataFrame = {
      // exact decimal arithmetic on scaled longs: qty/price/discount/tax are
      // 2dp; products have 4dp and 6dp — all fit in int64 at this scale
      val q = round(col("l_quantity") * 100).cast("long")
      val p = round(col("l_extendedprice") * 100).cast("long")
      val d = round(col("l_discount") * 100).cast("long")
      val tx = round(col("l_tax") * 100).cast("long")
      df.select(col("l_returnflag"), col("l_linestatus"),
          q.as("q"), p.as("p"), (lit(100L) - d).as("omd"), (lit(100L) + tx).as("opt"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("q")) / 100.0).as("sum_qty"),
          (sum(col("p")) / 100.0).as("sum_base_price"),
          (sum(col("p") * col("omd")) / 1e4).as("sum_disc_price"),
          (sum(col("p") * col("omd") * col("opt")) / 1e6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }

    def aggLongDecSum(df: DataFrame): DataFrame = {
      // scaled-long products (codegen-friendly), DECIMAL(38) sums (no
      // overflow at any row count) — the 100 TB-safe variant
      val q = round(col("l_quantity") * 100).cast("long")
      val p = round(col("l_extendedprice") * 100).cast("long")
      val d = round(col("l_discount") * 100).cast("long")
      val tx = round(col("l_tax") * 100).cast("long")
      val wide = DecimalType(38, 0)
      df.select(col("l_returnflag"), col("l_linestatus"),
          q.as("q"), p.as("p"), (lit(100L) - d).as("omd"), (lit(100L) + tx).as("opt"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("q").cast(wide)) / 100.0).cast(DoubleType).as("sum_qty"),
          (sum(col("p").cast(wide)) / 100.0).cast(DoubleType).as("sum_base_price"),
          (sum((col("p") * col("omd")).cast(wide)) / 1e4).cast(DoubleType).as("sum_disc_price"),
          (sum((col("p") * col("omd") * col("opt")).cast(wide)) / 1e6).cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }

    time("q01_fan_decimal")(noop(aggDecimal(Q.fan(filtered))))
    time("q01_nofan_decimal")(noop(aggDecimal(filtered)))
    time("q01_fan_long")(noop(aggLong(Q.fan(filtered))))
    time("q01_nofan_long")(noop(aggLong(filtered)))
    time("q01_nofan_longdecsum")(noop(aggLongDecSum(filtered)))
    val c = aggLongDecSum(filtered).collect().map(_.toSeq).toSeq

    // sanity: long-math matches decimal-math bit-for-bit after the double cast
    val a = aggDecimal(filtered).collect().map(_.toSeq).toSeq
    val b = aggLong(filtered).collect().map(_.toSeq).toSeq
    println(s"[profile] long==decimal: ${a == b}")
    println(s"[profile] longdecsum==decimal: ${a == c}")
    if (a != b) {
      a.zip(b).foreach { case (x, y) => if (x != y) println(s"  dec=$x\n  lng=$y") }
    }

    // ---- q03 variants ----------------------------------------------------
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
    val cst = Tables.load(spark, sfDir, "customer")
    val nat = Tables.load(spark, sfDir, "nation")
    val reg = Tables.load(spark, sfDir, "region")
    val one2 = lit(new java.math.BigDecimal("1.00"))

    def q03Current(): DataFrame = {
      val revPerOrder = liRaw.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (one2 - dec(col("l_discount"))))
          .as("rev"))
      revPerOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cst), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }

    def q03JoinFirst(): DataFrame = {
      val p = round(col("l_extendedprice") * 100).cast("long")
      val d = round(col("l_discount") * 100).cast("long")
      liRaw.select(col("l_orderkey"), (p * (lit(100L) - d)).as("rev_c"))
        .join(broadcast(o.select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cst.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg.select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }

    def q03PreAggLong(): DataFrame = {
      val p = round(col("l_extendedprice") * 100).cast("long")
      val d = round(col("l_discount") * 100).cast("long")
      val revPerOrder = liRaw
        .select(col("l_orderkey"), (p * (lit(100L) - d)).as("rev_c"))
        .groupBy(col("l_orderkey")).agg(sum(col("rev_c")).as("rev_c"))
      revPerOrder.join(broadcast(o.select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cst.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg.select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((sum(col("rev_c")) / 1e4).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }

    time("q03_current")(noop(q03Current()))
    time("q03_joinfirst_long")(noop(q03JoinFirst()))
    time("q03_preagg_long")(noop(q03PreAggLong()))
    val g1 = q03Current().collect().map(_.toSeq).toSeq
    val g2 = q03JoinFirst().collect().map(_.toSeq).toSeq
    val g3 = q03PreAggLong().collect().map(_.toSeq).toSeq
    println(s"[profile] q03 joinfirst==current: ${g1 == g2}")
    println(s"[profile] q03 preagg==current: ${g1 == g3}")
    spark.stop()
  }
}
