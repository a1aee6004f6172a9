package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: decompose q115_bloom_contamination's time at sf0.1. */
object ProfileQ115 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")

    noop(graft.ops.Curation.bloomContamination(corpus, bench))
    noop(graft.ops.Curation.bloomContamination(corpus, bench))

    val benchSh = DedupOps.charShingles(bench).select(col("s")).distinct()
    time("bench_shingles_distinct")(noop(benchSh))
    time("build_filter") {
      graft.functions.Bloom.buildFilter(benchSh, col("s"),
        1L << 18, 1L << 22)
    }
    val filter = graft.functions.Bloom.buildFilter(benchSh, col("s"),
      1L << 18, 1L << 22)
    val raw = DedupOps.charShinglesRaw(corpus)
    time("corpus_raw_shingles")(noop(raw))
    val probed = raw.filter(graft.functions.Bloom.mightContain(filter, col("s")))
    time("probe_filter")(noop(probed))
    time("probe_distinct")(noop(probed.distinct()))
    time("exact_q65_form") {
      noop(graft.ops.Curation.contamination(corpus, bench))
    }
    time("full") {
      spark.sharedState.cacheManager.clearCache()
      noop(graft.ops.Curation.bloomContamination(corpus, bench))
    }
    spark.stop()
  }
}
