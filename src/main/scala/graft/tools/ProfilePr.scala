package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: A/B PageRank round shapes on q185's co-purchase graph.
  * Variants: shipped (Stage per round, planner-chosen join), and a
  * co-partitioned form staging ew hash-partitioned by src so each
  * round's rank join is exchange-free (the agg exchange on dst — the
  * graph's actual message traffic — is the only shuffle left). */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def edges(): DataFrame = {
      val lp = graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pairs = lp
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                         y -> struct(x AS pa, y AS pb))))""")).as("p"))
        .select(col("p.pa"), col("p.pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      pairs
        .select(col("pa").as("src"), col("pb").as("dst"), col("w"))
        .unionAll(pairs
          .select(col("pb").as("src"), col("pa").as("dst"), col("w")))
    }

    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 1).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        f.write.format("noop").mode("overwrite").save()
      }
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pr] $label: best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("edges only")(edges())
    time("shipped pageRank x10")(
      graft.ops.Graph.pageRank(edges(), iters = 10).orderBy(col("id")))

    def prCopart(edgesDf: DataFrame, iters: Int,
        damping: Double = 0.85): DataFrame = {
      val e = edgesDf.select(col("src"), col("dst"), col("w").cast("long"))
      val ow = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      val ew = graft.core.Stage(
        e.join(ow, "src").repartition(col("src")))
      val nodes = graft.core.Stage(
        e.select(col("src").as("id")).distinct())
      val n = nodes.count()
      def rhu(x: Double): Long = new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      val r0 = rhu(1000000000.0 / n)
      val base = rhu((1 - damping) * 1000000000.0 / n)
      var r = nodes.select(col("id"), lit(r0).as("r"))
      (1 to iters).foreach { _ =>
        val contrib = ew.join(r, ew("src") === r("id"))
          .select(col("dst"),
            round(lit(damping) * col("r") * col("w") / col("ow"))
              .cast("long").as("t"))
          .groupBy(col("dst"))
          .agg((sum(col("t")) + base).as("r"))
          .select(col("dst").as("id"), col("r"))
        r = graft.core.Stage(contrib)
      }
      r.select(col("id"), (col("r").cast("double") / 1e9).as("rank"))
    }
    time("co-partitioned pageRank x10")(
      prCopart(edges(), iters = 10).orderBy(col("id")))

    def prStaged(edgesDf: DataFrame, iters: Int, stageEvery: Int,
        damping: Double = 0.85): DataFrame = {
      val e = edgesDf.select(col("src"), col("dst"), col("w").cast("long"))
      val ow = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      val ew = graft.core.Stage(
        e.join(ow, "src").repartition(col("src")))
      val nodes = graft.core.Stage(
        e.select(col("src").as("id")).distinct())
      val n = nodes.count()
      def rhu(x: Double): Long = new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      val r0 = rhu(1000000000.0 / n)
      val base = rhu((1 - damping) * 1000000000.0 / n)
      var r = nodes.select(col("id"), lit(r0).as("r"))
      (1 to iters).foreach { i =>
        val contrib = ew.join(r, ew("src") === r("id"))
          .select(col("dst"),
            round(lit(damping) * col("r") * col("w") / col("ow"))
              .cast("long").as("t"))
          .groupBy(col("dst"))
          .agg((sum(col("t")) + base).as("r"))
          .select(col("dst").as("id"), col("r"))
        r = if (i % stageEvery == 0 || i == iters)
          graft.core.Stage(contrib) else contrib
      }
      r.select(col("id"), (col("r").cast("double") / 1e9).as("rank"))
    }
    time("copart + stage every 5")(
      prStaged(edges(), iters = 10, stageEvery = 5).orderBy(col("id")))
    time("copart + stage every 10")(
      prStaged(edges(), iters = 10, stageEvery = 10).orderBy(col("id")))
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("edges only, parallelismFirst")(edges())
    time("copart+stage5, parallelismFirst")(
      prStaged(edges(), iters = 10, stageEvery = 5).orderBy(col("id")))
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    val c = prStaged(edges(), iters = 10, stageEvery = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val a0 = graft.ops.Graph.pageRank(edges(), iters = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    println(s"[pr] staged-equal=${a0 == c}")

    // equality check (trajectory must be identical)
    val a = graft.ops.Graph.pageRank(edges(), iters = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = prCopart(edges(), iters = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    println(s"[pr] equal=${a == b} rows=${a.size}")
    spark.stop()
  }
}
