package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: A/B of ksPairwise persist strategies at a given SF. */
object ProfileKs {
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
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        f.write.format("noop").mode("overwrite").save()
      }
      val ts = (1 to 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ks] $label: best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // variant: no persist at all (round-7 form)
    def ksNoPersist(df: DataFrame, group: Column, value: Column): DataFrame = {
      val h = df.select(group.cast("string").as("g"),
          value.cast("long").as("x"))
        .where(col("g").isNotNull && col("x").isNotNull)
        .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
      val grid = h.select(col("x")).distinct()
      val groups = h.select(col("g")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("x"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val cum = groups.crossJoin(broadcast(grid))
        .join(h, Seq("g", "x"), "left")
        .select(col("g"), col("x"), coalesce(col("c"), lit(0L)).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
      val sizes = h.groupBy(col("g")).agg(sum(col("c")).as("n"))
      val a = cum.join(sizes, "g")
        .select(col("g").as("group_a"), col("x"),
          col("cum").as("ca"), col("n").as("na"))
      val b = cum.join(sizes, "g")
        .select(col("g").as("group_b"), col("x"),
          col("cum").as("cb"), col("n").as("nb"))
      a.join(b, Seq("x"))
        .where(col("group_a") < col("group_b"))
        .groupBy(col("group_a"), col("group_b"))
        .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
          max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num"))
        .select(col("group_a"), col("group_b"), col("na"), col("nb"),
          (col("num").cast("double") / (col("na") * col("nb"))).as("ks"))
    }

    time("ks no-persist")(
      ksNoPersist(docs, col("source"), col("n_chars"))
        .orderBy(col("group_a"), col("group_b")))
    time("ks shipped (persist h+cum)")(
      graft.ops.Diagnostics.ksPairwise(docs, col("source"), col("n_chars"))
        .orderBy(col("group_a"), col("group_b")))
    spark.stop()
  }
}
