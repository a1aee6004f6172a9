package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: MEASURE cosineNearDups' documented nPlanes scale law
  * (VectorOps.scala — 2^p buckets bound the within-bucket quadratic at
  * ~N²/2^p; p should grow ~log₂N). Times the operator at the default
  * p=6 and at the law-scaled p for each fixture, so SCALING.md can
  * carry measured evidence for the knob instead of an asserted law.
  * Usage: ProfileQ48Scale <sfDir> <planesCsv>   e.g. ". 6,9" */
object ProfileQ48Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val planes = args(1).split(',').map(_.trim.toInt)
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    println(s"[profile] corpus $sfDir: $n vectors")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    planes.foreach { p =>
      // one warmup, three timed
      noop(graft.ops.VectorOps.cosineNearDups(emb, 0.95, p))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(graft.ops.VectorOps.cosineNearDups(emb, 0.95, p))
        (System.nanoTime() - t0) / 1e9
      }
      val pairs = graft.ops.VectorOps.cosineNearDups(emb, 0.95, p).count()
      println(f"[profile] p=$p buckets=${1 << p}: " +
        f"min=${times.min}%.2f med=${times.sorted.apply(1)}%.2f " +
        f"max=${times.max}%.2f s, $pairs pairs >= 0.95")
    }
  }
}
