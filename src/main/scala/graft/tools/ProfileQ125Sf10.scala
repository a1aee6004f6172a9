package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: why is q125_dup_spans BIMODAL at the sf10 anchor (10.9 s
  * best vs 34–68 s across same-knob runs)? Times each stage of the
  * span detect repeatedly in ONE JVM and prints the executed join
  * strategy per round — if AQE flips the dup-fingerprint join between
  * broadcast and sort-merge near the 64 MB threshold, the flip shows
  * up here as a per-round strategy change; if the variance is GC/IO
  * weather, strategies stay fixed while times move. */
object ProfileQ125Sf10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaled-doc-sf10")
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def round(label: String)(f: => DataFrame): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val df = f
      val t0 = System.nanoTime()
      noop(df)
      val s = (System.nanoTime() - t0) / 1e9
      // NOTE: noop() runs its OWN QueryExecution (DataFrameWriter), so
      // this stringifies the STATIC pre-AQE strategy — a runtime AQE
      // flip would not appear here. The hint A/B below is therefore
      // the decisive instrument; this label only rules out a flip in
      // the STATIC choice across rounds.
      val plan = df.queryExecution.executedPlan.toString
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin").map(j =>
        s"$j=${j.r.findAllIn(plan).length}").mkString(" ")
      println(f"[profile] $label: $s%.2f s  static-plan: $joins")
    }

    (1 to 5).foreach { i =>
      round(s"q125 round $i")(
        graft.ops.DedupOps.duplicateSpans(docs, 5, 10))
    }
    // stage decomposition, one pass each
    import graft.queries.Q.{h32, tokens}
    def gramFrame: DataFrame = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1),
          greatest(size(col("tk")) - 4, lit(1)))).as("p"))
      .filter(col("p") + 4 <= size(col("tk")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        h32(concat_ws(" ", slice(col("tk"), col("p"), lit(5)))).as("kg"))
    (1 to 3).foreach { i =>
      round(s"grams alone $i")(gramFrame)
      round(s"grams+dupcount $i")(gramFrame.groupBy(col("kg"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2))
    }
    def dup: DataFrame = gramFrame.groupBy(col("kg"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("kg"))
    (1 to 3).foreach { i =>
      round(s"dupPos broadcast-join $i")(
        gramFrame.join(dup, "kg").select(col("doc_id"), col("p")))
    }
    (1 to 3).foreach { i =>
      round(s"dupPos SHUFFLE-join $i")(
        gramFrame.join(dup.hint("shuffle_hash"), "kg")
          .select(col("doc_id"), col("p")))
    }
    (1 to 3).foreach { i =>
      round(s"dupPos MERGE-join $i")(
        gramFrame.join(dup.hint("merge"), "kg")
          .select(col("doc_id"), col("p")))
    }
  }
}
