package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      println(s"######## $name")
      SparkEntry.withQueryConfs(spark, name) {
        println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
