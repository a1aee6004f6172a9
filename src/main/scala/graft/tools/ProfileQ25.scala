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
    // warmup full path once
    DedupOps.nearDuplicates(docs, threshold = 0.2)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full nearDuplicates run$i") {
        DedupOps.nearDuplicates(docs, threshold = 0.2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // ---- NEW-path stage breakdown (fresh cache per phase) ----------------
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val sig = DedupOps.signaturesOnly(docs, 8, 12)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"stage sig+persist run$i")(sig.count())
      val p2 = DedupOps.pairsFromBands(sig, 12, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"stage pairs+persist run$i")(p2.count())
      val candIds = p2.select(col("a").as("doc_id"))
        .union(p2.select(col("b").as("doc_id"))).distinct()
      val cand = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      val sets = DedupOps.shingleSets(cand, 8)
      time(s"stage candsets run$i")(sets.write.format("noop").mode("overwrite").save())
      val sa = sets.select(col("doc_id").as("a"), col("shset").as("seta"),
        col("n_sh").as("na"))
      val sb = sets.select(col("doc_id").as("b"), col("shset").as("setb"),
        col("n_sh").as("nb"))
      val joined = p2.join(sa, "a").join(sb, "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("seta"), col("setb"))).as("i"),
          col("na"), col("nb"))
        .select(col("a"), col("b"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
      time(s"stage verify-join run$i")(joined.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
