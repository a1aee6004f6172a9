package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.sources.Tables

/** Dev-only: stage decomposition of winnowPairs (q165) — which step of
  * fingerprints → df filter → postings self-join costs what. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[winnow] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("fingerprints count") {
      TextOps.winnowFingerprints(docs).write.format("noop").mode("overwrite").save()
    }
    val fps = TextOps.winnowFingerprints(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count()
    time("df-agg from cache") {
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 64)
        .write.format("noop").mode("overwrite").save()
    }
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 64).select(col("fp"))
    val posts = fps.join(keep, "fp")
    time("pair join from cache") {
      posts.select(col("fp"), col("doc_id").as("a"))
        .join(posts.select(col("fp"), col("doc_id").as("b")), Seq("fp"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    time("full winnowPairs (no cache)") {
      spark.sharedState.cacheManager.clearCache()
      TextOps.winnowPairs(docs).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
