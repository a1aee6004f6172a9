package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only: decompose q168/q169 costs at sf0.1. */
object ProfileDiv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[div] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val li = Tables.load(spark, sfDir, "lineitem")

    // --- q169 pieces
    val tk = graft.ops.TextOps.tokenized(docs, idCol = "source")
      .select(col("source").cast("string").as("source"), col("tok"))
    time("tk count") { tk.write.format("noop").mode("overwrite").save() }
    val counts = tk.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    time("counts") { counts.write.format("noop").mode("overwrite").save() }
    time("counts rows") { println("  counts=" + counts.count()) }
    val sources = counts.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    println("  nsources=" + sources.size)
    val mat = counts.groupBy(col("tok")).pivot("source", sources).sum("c")
    time("pivot mat") { mat.write.format("noop").mode("overwrite").save() }
    time("mat rows") { println("  mat=" + mat.count()) }
    // one pair's worth of terms over mat
    val a = sources.head
    val b = sources(1)
    val ca = coalesce(col(s"`$a`"), lit(0L)).cast("double")
    val cb = coalesce(col(s"`$b`"), lit(0L)).cast("double")
    val term = round((ca + 0.5) / 1000.0 * (log((ca + 0.5) / 1000.0) - log((cb + 0.5) / 2000.0)) * 1e6).cast("long")
    time("one-pair term sum") {
      mat.agg(sum(term)).head()
    }

    // --- q168 pieces
    val baskets = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    time("baskets") { baskets.write.format("noop").mode("overwrite").save() }
    val pairs = baskets.select(explode(expr(
      """flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps)),
                     y -> struct(x AS part_a, y AS part_b))))""")).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
    time("pair explode") { pairs.write.format("noop").mode("overwrite").save() }
    time("pair agg") {
      pairs.groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
/** Dev-only: preserves the measurement behind TextOps.sourceDivergence's
  * scaladoc — the first-cut WIDE form (one 760-aggregate projection over
  * the pivot frame) cost 6.6 s on 31 cached rows purely in expression
  * machinery; the shipped row-fan-out form is ~20× faster. This replica
  * keeps the wide form runnable for comparison. */
object ProfileDiv2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[div2] $label: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("full sourceDivergence") {
      graft.ops.TextOps.sourceDivergence(docs)
        .write.format("noop").mode("overwrite").save()
    }
    // phases inside, replicated
    val tk = graft.ops.TextOps.tokenized(docs, idCol = "source")
      .select(col("source").cast("string").as("source"), col("tok"))
    val counts = tk.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .persist()
    counts.count()
    val sources = counts.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabV = counts.select(col("tok")).distinct().count()
    val addK = 0.5
    def lp(c: org.apache.spark.sql.Column, s: String) =
      log((c.cast("double") + addK) / (totals(s) + addK * vocabV))
    def lpMix(ca: org.apache.spark.sql.Column, cb: org.apache.spark.sql.Column, a: String, b: String) =
      log(((ca.cast("double") + addK) / (totals(a) + addK * vocabV)
        + (cb.cast("double") + addK) / (totals(b) + addK * vocabV)) / 2.0)
    def pOf(c: org.apache.spark.sql.Column, s: String) =
      (c.cast("double") + addK) / (totals(s) + addK * vocabV)
    val mat = counts.groupBy(col("tok")).pivot("source", sources).sum("c")
    val pairs = for { a <- sources; b <- sources if a != b } yield (a, b)
    val contrib = mat.select(pairs.map { case (a, b) =>
      val ca = coalesce(col(s"`$a`"), lit(0L))
      val cb = coalesce(col(s"`$b`"), lit(0L))
      val klT = round(pOf(ca, a) * (lp(ca, a) - lp(cb, b)) * 1e6).cast("long")
      val jsT = round((pOf(ca, a) * (lp(ca, a) - lpMix(ca, cb, a, b))
        + pOf(cb, b) * (lp(cb, b) - lpMix(ca, cb, a, b))) / 2.0 * 1e6).cast("long")
      struct(klT.as("kl"), jsT.as("js")).as(s"$a|$b")
    }: _*)
    time("contrib plan only") { contrib.queryExecution.executedPlan }
    def sumPair(p: (String, String)) = {
      val (a, b) = p
      struct(sum(col(s"`${p._1}|${p._2}`.kl")).as("kl"),
        sum(col(s"`${p._1}|${p._2}`.js")).as("js")).as(s"$a|$b")
    }
    time("contrib agg head") {
      contrib.agg(sumPair(pairs.head), pairs.tail.map(sumPair): _*).head()
    }
    spark.stop()
  }
}
