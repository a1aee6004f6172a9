package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.queries.Q.{h32, tokens}
import graft.sources.Tables

/** Dev-only: cumulative decomposition of q127_span_strip — which stage
  * of detect(+persist) → anti-join → rebuild owns the time, vs the
  * corresponding duckdb stages. Replays the bench session settings. */
object ProfileQ127 {
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
      .select(col("doc_id"), col("text"))
    val k = 5

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

    def gramFrame: DataFrame = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1),
          greatest(size(col("tk")) - (k - 1), lit(1)))).as("p"))
      .filter(col("p") + (k - 1) <= size(col("tk")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        h32(concat_ws(" ", slice(col("tk"), col("p"), lit(k)))).as("kg"))

    def toksFrame: DataFrame = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos0", "tok")))

    // cumulative stages
    bench("1 noop empty job")(spark.range(32).toDF("i")
      .repartition(32))
    bench("2 gram fingerprint pass alone")(gramFrame)
    bench("3 + dup-kg aggregation")(
      gramFrame.groupBy(col("kg")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2))
    bench("4 full span detect (q125)")(
      graft.ops.DedupOps.duplicateSpans(docs, 5, 10))
    bench("5 token posexplode alone")(toksFrame)
    bench("6 FULL q127 strip")(
      graft.ops.DedupOps.stripDuplicateSpans(docs, 5, 10)
        .orderBy(col("doc_id")))

    // variant: shuffle-free rebuild — collect spans per doc (tiny),
    // broadcast-join onto docs, filter tokens map-side with array
    // lambdas (no posexplode, no anti-join, no doc-keyed rebuild agg)
    def stripVariant: DataFrame = {
      val spans = graft.ops.DedupOps.duplicateSpans(docs, 5, 10)
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sp"))
      docs.repartition(spark.sparkContext.defaultParallelism)
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), tokens(col("text")).as("tk"), col("sp"))
        .select(col("doc_id"), col("tk"),
          coalesce(col("sp"), expr("array()")).as("sp"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tok"),
          expr("""filter(transform(sequence(1, size(tk)),
                    i -> struct(i AS pos, tk[i - 1] AS tok)),
                  x -> NOT exists(sp, s -> x.pos >= s.start_tok
                    AND x.pos <= s.end_tok))""").as("kept"))
        .select(col("doc_id"), col("n_tok"),
          (col("n_tok") - size(col("kept"))).cast("long").as("n_removed"),
          concat_ws(" ", expr("transform(kept, x -> x.tok)"))
            .as("clean_text"))
        .orderBy(col("doc_id"))
    }
    bench("7 strip variant: broadcast spans, map-side rebuild")(stripVariant)
  }
}
