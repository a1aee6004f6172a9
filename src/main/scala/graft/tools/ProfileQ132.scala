package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.VectorOps
import graft.sources.Tables

/** Dev-only: measure q132 (SemDeDup) growth with the cell count held at
  * the oracle's fixed 16 vs scaled with the corpus (√N discipline, the
  * operator's documented scale path). Args: sfDir [nCells...].
  */
object ProfileQ132 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cells = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(16, 50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = Tables.load(spark, sfDir, "embeddings")
    for (n <- cells) {
      def run() = VectorOps.semanticDedup(emb, threshold = 0.35, nCells = n)
      noop(run()) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(run()); (System.nanoTime() - t0) / 1e9
      }
      val kept = run().filter("is_kept").count()
      println(f"[q132] nCells=$n%3d best=${ts.min}%.3f kept=$kept")
    }
    spark.stop()
  }
}
