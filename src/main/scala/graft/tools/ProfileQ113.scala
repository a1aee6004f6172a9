package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: q113_chunk_overlap A/B — declarative explode+slice+concat
  * vs an imperative flatMap kernel. Replays bench session settings. */
object ProfileQ113 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def bench(label: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { _ =>
        spark.sharedState.cacheManager.clearCache(); noop(f)
      }
      var best = Double.MaxValue
      (1 to 5).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        noop(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[profile] $label: $best%.3f s")
    }

    bench("1 current chunkDocuments")(
      graft.ops.Curation.chunkDocuments(docs, 16, 8)
        .orderBy(col("doc_id"), col("chunk_id")))

    def kernel: DataFrame = {
      import spark.implicits._
      val size = 16; val stride = 8
      docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { rows =>
          val ws = java.util.regex.Pattern.compile("\\s+")
          rows.flatMap { case (id, text) =>
            val tk = ws.split(text.trim, -1)
            val n = tk.length
            val nChunks = (math.max(n, 1) + stride - 1) / stride
            Iterator.tabulate(nChunks) { c =>
              val start = c * stride + 1
              val end = math.min(start + size - 1, n)
              val sb = new java.lang.StringBuilder
              var i = start - 1
              while (i < end) {
                if (i > start - 1) sb.append(' ')
                sb.append(tk(i)); i += 1
              }
              (id, (c + 1).toLong, start.toLong, (end - start + 1).toLong,
                sb.toString)
            }
          }
        }
        .toDF("doc_id", "chunk_id", "start", "chunk_len", "chunk_text")
        .orderBy(col("doc_id"), col("chunk_id"))
    }
    bench("2 imperative flatMap kernel")(kernel)
  }
}
