package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: q142 trigram+hash set pass A/B — declarative zip_with
  * lambdas vs an imperative mapPartitions kernel (noop-forced so
  * nothing prunes the transform). */
object ProfileQ142Sets {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

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

    val docs = graft.queries.Q.fan(docs0)
    def setsDecl: DataFrame = docs
      .select(col("doc_id"), graft.queries.Q.tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(expr(
        """transform(
             zip_with(
               zip_with(slice(w, 1, size(w)-2), slice(w, 2, size(w)-2),
                        (a, b) -> concat(a, ' ', b)),
               slice(w, 3, size(w)-2),
               (ab, c) -> concat(ab, ' ', c)),
             s -> xxhash64(s))"""
      )).as("tk"))
    bench("1 declarative trigram+hash sets")(setsDecl)

    def setsKernel: DataFrame = {
      import spark.implicits._
      docs.as[(Long, String)]
        .mapPartitions { rows =>
          val ws = java.util.regex.Pattern.compile("\\s+")
          rows.map { case (id, text) =>
            val w = ws.split(text.trim, -1)
            val n = math.max(w.length - 2, 0)
            val hs = new Array[Long](n)
            var i = 0
            while (i < n) {
              val s = w(i) + " " + w(i + 1) + " " + w(i + 2)
              val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(b,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                  b.length, 42L)
              i += 1
            }
            java.util.Arrays.sort(hs)
            var out = 0
            var j = 1
            while (j < n) {
              if (hs(j) != hs(out)) { out += 1; hs(out) = hs(j) }
              j += 1
            }
            (id, if (n == 0) Array.empty[Long]
                 else java.util.Arrays.copyOf(hs, out + 1))
          }
        }
        .toDF("doc_id", "tk")
    }
    bench("2 imperative trigram+hash kernel")(setsKernel)

    // equivalence probe (sets compared as SETS per doc; declarative
    // array_distinct keeps first-occurrence order, kernel sorts — both
    // feed an explode+groupBy so order is irrelevant)
    val a = setsDecl.select(col("doc_id"), explode(col("tk")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = setsKernel.select(col("doc_id"), explode(col("tk")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[profile] equivalence: ${a == b} (${a.size} vs ${b.size})")
    spark.stop()
  }
}
