package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: decompose q108_dedup_survivorship's time at sf0.1. */
object ProfileQ108 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.load(spark, sfDir, "documents")
    noop(DedupOps.survivorship(docs))
    noop(DedupOps.survivorship(docs))

    time("neardup_pairs")(noop(
      DedupOps.nearDuplicates(docs, 8, 0.2, 12, 3)))
    time("clusters_full")(noop(DedupOps.duplicateClusters(docs)))
    time("survivorship_full")(noop(DedupOps.survivorship(docs)))
    val pairs = DedupOps.nearDuplicates(docs, 8, 0.2, 12, 3)
      .select(col("a"), col("b")).localCheckpoint()
    println(s"[profile] n_pairs=${pairs.count()}")
    time("cc_only")(noop(DedupOps.connectedComponents(
      docs.select(col("doc_id").as("id")), pairs)))
    spark.stop()
  }
}
