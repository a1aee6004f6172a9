package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only: time the round-7 additions (q164-q170) at a given SF with
  * bench-session settings — decides which join the headline set. */
object ProfileNewOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q164_normalized_dedup", "q165_winnow_pairs",
      "q166_sorted_neighborhood", "q167_grouped_topk",
      "q168_copurchase_pairs", "q169_source_divergence",
      "q170_group_weighted_sample")
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
    names.foreach { name =>
      // warmup x2 then best of 5
      (1 to 2).foreach { _ =>
        try SparkEntry.withQueryConfs(spark, name) {
          spark.sharedState.cacheManager.clearCache()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          System.err.println(s"[newops] $name warmup failed: ${e.getMessage}")
        }
      }
      val ts = (1 to 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.withQueryConfs(spark, name) {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[newops] $name: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
