package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of q25_jaccard_neardups at sf0.1. */
object ProfileQ25 {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val sets = DedupOps.setsWithSignatures(docs, 8, 12)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[profile] sets=${sets.count()}")
    val pairs = DedupOps.pairsFromBands(sets, 12, 3)
    println(s"[profile] pairs=${pairs.count()}")
    println(s"[profile] participants=${pairs.select(col("a")).union(pairs.select(col("b"))).distinct().count()}")
    val shingleStats = sets.agg(sum(col("n_sh")), avg(col("n_sh"))).collect()(0)
    println(s"[profile] total_shingles=${shingleStats.get(0)} avg=${shingleStats.get(1)}")
    spark.sharedState.cacheManager.clearCache()
    (1 to 6).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full nearDuplicates run$i") {
        DedupOps.nearDuplicates(docs, threshold = 0.2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
