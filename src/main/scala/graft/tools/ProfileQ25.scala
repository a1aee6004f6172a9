package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of q25_jaccard_neardups at sf0.1,
  * mirroring the CURRENT nearDuplicates structure (signatures-only
  * pass → raw band pairs persist → candidate-only shingle sets persist
  * → verification join → distinct). */
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
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    // warmup full path twice (matches the bench discipline)
    (1 to 2).foreach { _ =>
      spark.sharedState.cacheManager.clearCache()
      DedupOps.nearDuplicates(docs, threshold = 0.2)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 5).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full nearDuplicates run$i") {
        DedupOps.nearDuplicates(docs, threshold = 0.2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // ---- stage breakdown mirroring nearDuplicates exactly ---------------
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val sig = DedupOps.signaturesOnly(docs, 8, 12)
      val pairs = DedupOps.rawPairsFromBands(sig, 12, 3)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"stage1 sig+rawpairs+persist run$i")(pairs.count())
      val candIds = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b").as("doc_id")))
      val sets = DedupOps.shingleSetsHashed(
        DedupOps.spread(docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")), 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"stage2 candsets+persist run$i")(sets.count())
      val sa = sets.select(col("doc_id").as("a"), col("shset").as("seta"),
        col("n_sh").as("na"))
      val sb = sets.select(col("doc_id").as("b"), col("shset").as("setb"),
        col("n_sh").as("nb"))
      val out = pairs.join(sa, "a").join(sb, "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("seta"), col("setb"))).as("i"),
          col("na"), col("nb"))
        .select(col("a"), col("b"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
        .distinct()
      time(s"stage3 verify+distinct run$i")(
        out.write.format("noop").mode("overwrite").save())
      pairs.unpersist(); sets.unpersist()
    }
    spark.stop()
  }
}
