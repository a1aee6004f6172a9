package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: stage-by-stage timing of q186_copurchase_triangles at sf0.1
  * (VERDICT r15 item 3 — profile-decompose the edge pipeline the graph
  * family shares). Mirrors the q186 build: lp distinct → per-order part
  * list → pair expansion → support filter → triangleCounts. */
object ProfileQ186 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // q186 declares parallelismFirst=true in its QueryDef confs
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def build() = {
      val lp = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pairs = lp
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                         y -> struct(x AS a, y AS b))))""")).as("p"))
        .select(col("p.a"), col("p.b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(col("a"), col("b"))
      (lp, pairs)
    }
    (1 to 2).foreach { _ =>
      spark.sharedState.cacheManager.clearCache()
      noop(graft.ops.Graph.triangleCounts(build()._2))
    }
    (1 to 5).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full q186 run$i") {
        noop(graft.ops.Graph.triangleCounts(build()._2))
      }
    }
    // ---- stage decomposition ---------------------------------------------
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val (lp, pairs) = build()
      time(s"stage1 lp distinct run$i")(noop(lp))
      val lists = lp.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      time(s"stage2 order part-lists run$i")(noop(lists))
      val expanded = lists
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                         y -> struct(x AS a, y AS b))))""")).as("p"))
        .select(col("p.a"), col("p.b"))
      time(s"stage3 pair expansion run$i")(noop(expanded))
      time(s"stage4 pair support agg (>=2) run$i")(noop(
        expanded.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select(col("a"), col("b"))))
      time(s"stage5 triangleCounts over cached pairs run$i") {
        noop(graft.ops.Graph.triangleCounts(pairs))
      }
    }
    spark.stop()
  }
}
