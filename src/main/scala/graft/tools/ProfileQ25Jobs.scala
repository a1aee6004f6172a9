package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-job / per-stage wall time of one nearDuplicates run. */
object ProfileQ25Jobs {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def run(): Unit = graft.ops.DedupOps.nearDuplicates(docs, threshold = 0.2)
      .write.format("noop").mode("overwrite").save()
    run(); spark.sharedState.cacheManager.clearCache()
    run(); spark.sharedState.cacheManager.clearCache()

    val jobStarts = scala.collection.mutable.Map[Int, Long]()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStarts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        lines += f"[job] ${j.jobId}%3d ${(j.time - jobStarts.getOrElse(j.jobId, j.time)) / 1e3}%7.3fs"
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dt = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        lines += f"[stage] ${si.stageId}%3d tasks=${si.numTasks}%3d $dt%7.3fs  ${si.name.take(80)}"
      }
    })
    val t0 = System.nanoTime()
    run()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.foreach(println)
    println(f"[total] $total%.3f s")

    // AQE off: one job per action instead of one per exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sharedState.cacheManager.clearCache()
    run() // warm plans under the new conf
    val noaqe = (1 to 3).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
    }
    println(f"[total-noaqe] best=${noaqe.min}%.3f all=${noaqe.map(t => f"$t%.3f").mkString(",")}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val aqe = (1 to 3).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
    }
    println(f"[total-aqe] best=${aqe.min}%.3f all=${aqe.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
