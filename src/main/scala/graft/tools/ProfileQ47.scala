package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: where do q47_simhash_pairs' seconds go (5.0 s at sf0.1 for
  * 5k docs — never profiled, not a headline row)? Times simhash alone
  * vs the banded pair join, and prints whether the self-join reuses the
  * aggregate's exchange or recomputes the whole simhash subtree twice. */
object ProfileQ47 {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def bench(label: String)(f: => DataFrame): Unit = {
      noop(f)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: min=${times.min}%.2f med=${times.sorted.apply(1)}%.2f max=${times.max}%.2f")
    }

    import graft.queries.Q.{h32, tokens}
    def toks: DataFrame = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("doc_id"), h32(col("tok")).as("h"))
    bench("1 distinct tokens + h32")(toks)
    bench("2 simhash (32-col agg)")(graft.ops.DedupOps.simhash(docs))
    bench("3 FULL simhashPairs")(graft.ops.DedupOps.simhashPairs(docs))
    val plan = graft.ops.DedupOps.simhashPairs(docs)
      .queryExecution.executedPlan.toString
    println("[profile] ReusedExchange in pair plan: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println("[profile] HashAggregate count: " +
      "HashAggregate".r.findAllIn(plan).length)
  }
}
