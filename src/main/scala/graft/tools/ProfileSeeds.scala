package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: inspect the physical plan of the IVF seed selection. */
object ProfileSeeds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    graft.ops.VectorOps.ivfAssign(v, 16).explain("formatted")
    spark.stop()
  }
}
