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

    // r15 variants -----------------------------------------------------
    // 8: dup detection via ONE kg-keyed window count (normalizedDedup
    // shape) instead of agg + shuffle_hash join-back — one exchange of
    // the full gram stream vs two (unique-kg agg + full join-back)
    val w = org.apache.spark.sql.expressions.Window
    def dupPosWindow: DataFrame = gramFrame
      .withColumn("c", count(lit(1)).over(w.partitionBy(col("kg"))))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("p"))
    bench("8 dupPos via window-count (one exchange)")(dupPosWindow)
    def dupPosJoin: DataFrame = {
      val dup = gramFrame.groupBy(col("kg"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select(col("kg"))
      gramFrame.join(dup.hint("shuffle_hash"), "kg")
        .select(col("doc_id"), col("p"))
    }
    bench("9 dupPos via agg + shuffle_hash join-back (current)")(dupPosJoin)

    // 10: full q125 with window-count dup detection
    def spansFromDupPos(dupPos: DataFrame): DataFrame = {
      val byDoc = w.partitionBy(col("doc_id")).orderBy(col("p"))
      dupPos
        .withColumn("prev_reach", max(col("p") + (k - 1))
          .over(byDoc.rowsBetween(w.unboundedPreceding, -1)))
        .withColumn("fresh",
          when(col("prev_reach").isNull || col("p") > col("prev_reach"), 1L)
            .otherwise(0L))
        .withColumn("span_id", sum(col("fresh")).over(byDoc))
        .groupBy(col("doc_id"), col("span_id"))
        .agg(min(col("p")).as("start_tok"),
          (max(col("p")) + (k - 1)).as("end_tok"))
        .select(col("doc_id"), col("span_id"), col("start_tok"),
          col("end_tok"),
          (col("end_tok") - col("start_tok") + 1).as("n_toks"))
        .filter(col("n_toks") >= 10)
    }
    bench("10 full q125 via window-count dup")(spansFromDupPos(dupPosWindow))

    // 11: imperative rebuild kernel — strip spans per doc in one typed
    // pass instead of interpreted sequence/filter/exists lambdas
    def stripKernel: DataFrame = {
      import spark.implicits._
      val spans = spansFromDupPos(dupPosWindow)
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sp"))
      val joined = docs.select(col("doc_id"), col("text"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("sp"), expr("array()")).as("sp"))
        .as[(Long, String, Seq[(Long, Long)])]
      joined.mapPartitions { rows =>
        rows.map { case (id, text, sp) =>
          // exactly tokens(): split(trim(x), "\s+") — limit -1 like
          // Spark's split (keeps the single empty token of "")
          val tk = text.trim.split("\\s+", -1)
          val n = tk.length.toLong
          val sb = new java.lang.StringBuilder
          var kept = 0L
          var pos = 1L
          var i = 0
          while (i < tk.length) {
            var covered = false
            val it = sp.iterator
            while (!covered && it.hasNext) {
              val s = it.next()
              if (pos >= s._1 && pos <= s._2) covered = true
            }
            if (!covered) {
              if (kept > 0L) sb.append(' ')
              sb.append(tk(i)); kept += 1L
            }
            pos += 1L; i += 1
          }
          (id, n, n - kept, sb.toString)
        }
      }.toDF("doc_id", "n_tok", "n_removed", "clean_text")
        .orderBy(col("doc_id"))
    }
    bench("11 FULL q127: window dup + imperative rebuild")(stripKernel)

    // 12: current join-back dup detection + imperative rebuild kernel
    def stripKernelJoinDup: DataFrame = {
      import spark.implicits._
      val spans = graft.ops.DedupOps.duplicateSpans(docs, 5, 10)
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sp"))
      val joined = docs.select(col("doc_id"), col("text"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("sp"), expr("array()")).as("sp"))
        .as[(Long, String, Seq[(Long, Long)])]
      joined.mapPartitions { rows =>
        rows.map { case (id, text, sp) =>
          val tk = text.trim.split("\\s+", -1)
          val n = tk.length.toLong
          val sb = new java.lang.StringBuilder
          var kept = 0L
          var pos = 1L
          var i = 0
          while (i < tk.length) {
            var covered = false
            val it = sp.iterator
            while (!covered && it.hasNext) {
              val s = it.next()
              if (pos >= s._1 && pos <= s._2) covered = true
            }
            if (!covered) {
              if (kept > 0L) sb.append(' ')
              sb.append(tk(i)); kept += 1L
            }
            pos += 1L; i += 1
          }
          (id, n, n - kept, sb.toString)
        }
      }.toDF("doc_id", "n_tok", "n_removed", "clean_text")
        .orderBy(col("doc_id"))
    }
    bench("12 FULL q127: join dup + imperative rebuild")(stripKernelJoinDup)
  }
}
