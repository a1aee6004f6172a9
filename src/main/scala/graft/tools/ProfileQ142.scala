package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Dev-only: stage-by-stage timing of q142_setsim_shingles at sf0.1,
  * mirroring the CURRENT setSimJoinSets structure (spread → posts →
  * df counts → canonical lists persist → prefix explode → candidate
  * join → distinct → verification join). */
object ProfileQ142 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val countsOnly = args.length > 1 && args(1) == "counts"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.files.maxPartitionBytes", s"${4L * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def sets0 = graft.queries.Q.fan(Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), graft.queries.Q.tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(expr(
        """zip_with(
             zip_with(slice(w, 1, size(w)-2), slice(w, 2, size(w)-2),
                      (a, b) -> concat(a, ' ', b)),
             slice(w, 3, size(w)-2),
             (ab, c) -> xxhash64(concat(ab, ' ', c)))"""
      )).as("tk"))

    if (countsOnly) {
      // volume diagnosis for the sf100 growth study: where does the
      // candidate count go super-linear? (tauNum/tauDen = 4/5, the
      // query's values)
      val sets = graft.queries.Q.fan(sets0)
      val posts = sets.select(col("doc_id"), explode(col("tk")).as("tok"))
      val dfc = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[counts] docs=${sets.count()} postings=${posts.count()} " +
        s"vocab=${dfc.count()}")
      // df distribution head: the shared-across-replicas tokens show up
      // as df >> docs/replicas
      dfc.orderBy(col("df").desc).limit(10).collect()
        .foreach(r => println(s"[counts] top-df tok=${r.get(0)} df=${r.get(1)}"))
      val lists = posts.join(dfc, "tok")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
        .select(col("doc_id"),
          expr("transform(st, x -> x.tok)").as("tk"),
          size(col("st")).cast("long").as("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ceilTauN = floor((lit(4L) * col("n") + lit(4L)) / lit(5L))
      val prefLen = least(col("n"), col("n") - ceilTauN + 2).cast("int")
      val pref = lists.select(col("doc_id").as("p_id"), col("n").as("p_n"),
        explode(slice(col("tk"), lit(1), prefLen)).as("tok"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[counts] prefix_postings=${pref.count()}")
      // candidate volume BEFORE dedup: sum over tokens of prefix-pair
      // counts (the join's real work) — computed from per-token counts,
      // not the join itself
      val perTok = pref.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val pairVolume = perTok.select(
        sum((col("c") * (col("c") - lit(1L)) / lit(2L)).cast("long"))
          .as("v")).head().getLong(0)
      println(s"[counts] prefix_pair_volume=$pairVolume")
      val prefB = pref.select(col("p_id").as("f_id"), col("p_n").as("f_n"),
        col("tok").as("f_tok"))
      val cand = pref.join(prefB,
          col("tok") === col("f_tok") && col("p_id") < col("f_id")
            && lit(4L) * greatest(col("p_n"), col("f_n"))
               <= lit(5L) * least(col("p_n"), col("f_n")))
        .select(col("p_id").as("a"), col("f_id").as("b"))
      println(s"[counts] candidates_distinct=${cand.distinct().count()}")
      spark.stop()
      return
    }

    // warmup full path twice
    (1 to 2).foreach { _ =>
      spark.sharedState.cacheManager.clearCache()
      graft.ops.DedupOps.setSimJoinSets(sets0)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full setSimJoinSets run$i") {
        graft.ops.DedupOps.setSimJoinSets(sets0)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- stage breakdown mirroring setSimJoinSets exactly ---------------
    (1 to 2).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      println(s"---- breakdown $i ----")
      val sets = sets0.repartition(32)
      time("sets0 count (pre-exchange path)") { sets0.count() }
      time("sets count") { sets.count() }
      val posts = sets.select(col("doc_id"), explode(col("tk")).as("tok"))
      time("posts count") { posts.count() }
      val dfc = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      time("dfc count") { dfc.count() }
      time("posts join dfc count") { posts.join(dfc, "tok").count() }
      val lists = posts.join(dfc, "tok")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
        .select(col("doc_id"),
          expr("transform(st, x -> x.tok)").as("tk"),
          size(col("st")).cast("long").as("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("lists materialize") { lists.count() }
      val ceilTauN = floor((lit(4L) * col("n") + lit(4L)) / lit(5L))
      val pref = lists.select(col("doc_id").as("p_id"), col("n").as("p_n"),
        explode(slice(col("tk"), lit(1),
          (col("n") - ceilTauN + 1).cast("int"))).as("tok"))
      val full = lists.select(col("doc_id").as("f_id"), col("n").as("f_n"),
        explode(col("tk")).as("f_tok"))
      val cand = pref.join(full,
          col("tok") === col("f_tok") && col("p_id") =!= col("f_id")
            && lit(4L) * greatest(col("p_n"), col("f_n"))
               <= lit(5L) * least(col("p_n"), col("f_n")))
        .select(least(col("p_id"), col("f_id")).as("a"),
          greatest(col("p_id"), col("f_id")).as("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("candidates") { println("  cand=" + cand.count()) }
      val ver = cand
        .join(lists.select(col("doc_id").as("a"), col("tk").as("tka"),
          col("n").as("na")), Seq("a"))
        .join(lists.select(col("doc_id").as("b"), col("tk").as("tkb"),
          col("n").as("nb")), Seq("b"))
        .withColumn("inter",
          size(array_intersect(col("tka"), col("tkb"))).cast("long"))
        .withColumn("uni", col("na") + col("nb") - col("inter"))
        .filter(lit(5L) * col("inter") >= lit(4L) * col("uni"))
      time("verification") { ver.write.format("noop").mode("overwrite").save() }
      lists.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
