package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.sources.Tables

/** Dev-only: growth measurement for the corpus quality scorers
  * (unigram cross-entropy, DSIR weights) across scale points — feeds the
  * SCALING.md table. Usage: runMain graft.tools.ProfileScoring <sfDir>... */
object ProfileScoring {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/sfscaled/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f " +
        f"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    dirs.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      time(s"q122_unigram_xent @$dir")(
        noop(TextOps.unigramCrossEntropy(docs)))
      time(s"q123_dsir_weights @$dir")(
        noop(TextOps.dsirLogWeights(docs, col("lang") === "en")))
    }
    spark.stop()
  }
}
