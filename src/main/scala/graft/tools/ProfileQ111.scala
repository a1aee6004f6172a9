package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Dev-only: decompose q111_cluster_quality's time at sf0.1. */
object ProfileQ111 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val vectors = Tables.load(spark, sfDir, "embeddings")
    val wide = DecimalType(38, 0)
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * lit(100000)).cast("long"))

    val xv = vectors
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(quant(col("embedding"))).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("g"), col("x"))

    // warmup everything once
    noop(graft.ops.VectorOps.clusterQuality(vectors))
    noop(graft.ops.VectorOps.clusterQuality(vectors))

    time("scan_only")(noop(vectors))
    time("xv_explode")(noop(xv))
    val cent = xv.groupBy(col("label"), col("g"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("nl"))
    time("cent_agg")(noop(cent))
    val term = col("nl").cast(wide) * col("x") - col("s")
    val intra = xv.join(broadcast(cent), Seq("label", "g"))
      .groupBy(col("label"))
      .agg(max(col("nl")).as("nl"), sum(term * term).as("intra_num"))
    time("intra")(noop(intra))
    // long-math variant of intra (term fits int64? term ~ 4e8, term² ~
    // 1.6e17, sum over 12.8k terms per label ~ 2e21 — overflows; decimal
    // needed. Try decimal(38) sum of long product to see codegen cost)
    val intraL = xv.join(broadcast(cent), Seq("label", "g"))
      .groupBy(col("label"))
      .agg(max(col("nl")).as("nl"),
        sum(((col("nl") * col("x") - col("s"))
          * (col("nl") * col("x") - col("s"))).cast(wide)).as("intra_num"))
    time("intra_longmul_decsum")(noop(intraL))
    val ci = cent.select(col("label").as("li"), col("g"),
      col("s").as("si"), col("nl").as("ni"))
    val cj = cent.select(col("label").as("lj"), col("g"),
      col("s").as("sj"), col("nl").as("nj"))
    val cross = col("si").cast(wide) * col("nj") - col("sj").cast(wide) * col("ni")
    val pairD2 = ci.join(cj, ci("g") === cj("g") && col("li") =!= col("lj"))
      .groupBy(col("li"), col("lj"))
      .agg(sum(cross * cross).as("num"),
        max(col("ni")).as("ni"), max(col("nj")).as("nj"))
    time("pairs")(noop(pairD2))
    time("full")(noop(graft.ops.VectorOps.clusterQuality(vectors)))

    // per-stage decomposition of one full run
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId, i.name.take(60),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks))
      }
    }
    println(graft.ops.VectorOps.clusterQuality(vectors)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    noop(graft.ops.VectorOps.clusterQuality(vectors))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stages] wall=$wall%.3f")
    stages.sortBy(_._1).foreach { case (id, name, ms, nt) =>
      println(f"[stages] #$id%3d ${ms}%5d ms  $nt%3d tasks  $name")
    }
    spark.stop()
  }
}
