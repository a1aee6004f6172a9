package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of q166_sorted_neighborhood at sf0.1
  * (VERDICT r15 item 6 — no decomposition of its internals existed).
  * Mirrors sortedNeighborhood's structure: keyed Stage → subtotal
  * collect → ranked window → bucketed neighbor join → verify. */
object ProfileQ166 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
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
    val docs = Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { _ =>
      spark.sharedState.cacheManager.clearCache()
      DedupOps.sortedNeighborhood(docs, w = 4, tauNum = 1L, tauDen = 2L)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 5).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full sortedNeighborhood run$i") {
        DedupOps.sortedNeighborhood(docs, w = 4, tauNum = 1L, tauDen = 2L)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // ---- stage decomposition mirroring sortedNeighborhood ---------------
    val w = 4
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val keyed = time(s"stage1 keyed Stage (checkpoint) run$i") {
        graft.core.Stage(
          DedupOps.spread(docs.where(col("text").isNotNull))
            .select(col("doc_id"),
              substring(regexp_replace(lower(col("text")), "\\s+", ""), 1,
                16).as("bkey"),
              array_distinct(graft.queries.Q.tokens(col("text"))).as("tk"))
            .repartitionByRange(col("bkey"), col("doc_id"))
            .withColumn("pid", spark_partition_id()))
      }
      val subtotals = time(s"stage2 subtotal collect run$i") {
        keyed.groupBy(col("pid"))
          .agg(count(lit(1)).as("c")).collect()
          .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      }
      val offsets = subtotals.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
        (pid, acc + c)
      }.tail.zip(subtotals).map { case ((pid, cumIncl), (_, c)) =>
        (pid, cumIncl - c)
      }
      import spark.implicits._
      val offsetDf = offsets.toSeq.toDF("pid", "offset")
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(col("bkey"), col("doc_id"))
      val ranked = keyed.join(broadcast(offsetDf), "pid")
        .withColumn("r", row_number().over(win) + col("offset") - 1)
        .select(col("doc_id"), col("tk"), col("r"))
      time(s"stage3 ranked window (one pass, noop) run$i") {
        ranked.write.format("noop").mode("overwrite").save()
      }
      val left = ranked.select(col("doc_id").as("a"), col("tk").as("tka"),
        col("r").as("ra"),
        explode(array(floor(col("r") / w),
          floor(col("r") / w) + 1)).as("bk"))
      val right = ranked.select(col("doc_id").as("b"), col("tk").as("tkb"),
        col("r").as("rb"), floor(col("r") / w).as("bk"))
      val out = left.join(right,
          left("bk") === right("bk") && col("rb") > col("ra")
            && col("rb") - col("ra") <= w)
        .withColumn("inter",
          size(array_intersect(col("tka"), col("tkb"))).cast("long"))
        .withColumn("uni",
          size(col("tka")).cast("long") + size(col("tkb")) - col("inter"))
        .filter(lit(2L) * col("inter") >= lit(1L) * col("uni"))
        .select(col("a"), col("b"), (col("rb") - col("ra")).as("rank_gap"),
          round(col("inter").cast("double") / col("uni"), 6).as("jac"))
      time(s"stage4 join+verify (ranked recomputed per side) run$i") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
