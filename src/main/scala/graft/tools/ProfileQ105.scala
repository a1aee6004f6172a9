package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: within-process A/B of q105_shingle_novelty's ownership
  * pass — string shingles vs int64-fingerprinted shingles. */
object ProfileQ105 {
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

    // string-shingle variant (pre-round-7 shape), inlined
    def stringVariant(): DataFrame = {
      val base = DedupOps.shingleSets(
          docs.repartition(spark.sparkContext.defaultParallelism), 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val novel = base.select(col("doc_id"), explode(col("shset")).as("s"))
        .groupBy(col("s")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
      base.select(col("doc_id"), col("n_sh").cast("long").as("n_sh"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          (coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_sh"))
            .as("novelty"))
        .orderBy(col("doc_id"))
    }
    def hashedVariant(): DataFrame =
      DedupOps.shingleNovelty(docs).orderBy(col("doc_id"))

    def bench(label: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        f.write.format("noop").mode("overwrite").save()
      }
      var best = Double.MaxValue
      (1 to 7).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[profile] $label: $best%.3f s")
    }

    bench("string shingles  r1")(stringVariant())
    bench("hashed shingles  r1")(hashedVariant())
    bench("string shingles  r2")(stringVariant())
    bench("hashed shingles  r2")(hashedVariant())

    // ---- decomposition of the hashed variant ---------------------------
    (1 to 2).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      println(s"---- breakdown $i ----")
      def t[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
      }
      val base = DedupOps.shingleSetsHashed(
          docs.repartition(spark.sparkContext.defaultParallelism), 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("base materialize (map pass + persist)") { base.count() }
      val exploded = base.select(col("doc_id"), explode(col("shset")).as("s"))
      t("explode count (from cache)") { exploded.count() }
      val owners = exploded.groupBy(col("s")).agg(min(col("doc_id")).as("doc_id"))
      t("ownership min-agg") { owners.count() }
      val novel = owners.groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
      t("novel count-agg") { novel.count() }
      base.unpersist()
    }
    spark.stop()
  }
}
