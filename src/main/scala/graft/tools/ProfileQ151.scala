package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: cumulative decomposition of q151_minhash_calibration —
  * signatures → banded candidates → est join → exact verification.
  * Replays the bench session settings. */
object ProfileQ151 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val docs = Tables.load(spark, sfDir, "documents")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def bench(label: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { _ =>
        spark.sharedState.cacheManager.clearCache(); noop(f)
      }
      var best = Double.MaxValue
      (1 to 5).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        noop(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[profile] $label: $best%.3f s")
    }

    bench("1 empty job")(spark.range(32).toDF("i").repartition(32))
    bench("2 signaturesOnly")(DedupOps.minhashSignatures(docs, 12))
    bench("2b raw band pairs (no distinct, no est)")(
      DedupOps.rawPairsFromBands(DedupOps.minhashSignatures(docs, 12), 12, 3))
    bench("2c distinct band pairs (no est)")(
      DedupOps.pairsFromBands(DedupOps.minhashSignatures(docs, 12), 12, 3))
    bench("3 lshCandidates (sig + bands + est join)")(
      DedupOps.lshCandidates(docs, 12, 3))
    bench("4 FULL q151")(
      DedupOps.minhashCalibration(docs).orderBy(col("bucket")))
  }
}
