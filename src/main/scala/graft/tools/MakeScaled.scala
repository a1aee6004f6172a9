package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: derive a larger scale factor from the driver-provided test
  * data (TESTDATA.md caps at sf0.1; the scaling curve in SCALING.md needs
  * an sf1). The driver testdata is read-only, so the 10× copy is built
  * locally by unioning `factor` key-shifted replicas of each table:
  *
  *   - fact/entity keys shift by `i * (max_key + 1)` per replica `i`, so
  *     join cardinalities scale exactly linearly (every order still has
  *     one customer, every lineitem one order) and no cross-replica joins
  *     appear;
  *   - document text is letter-rotated per replica (a Caesar shift over
  *     [a-zA-Z], whitespace/digits/punctuation fixed). Replicas share no
  *     shingles or tokens with each other, so dedup/LSH candidate counts
  *     scale linearly like a real 10× corpus would — 10 verbatim copies
  *     would instead make every document a 10-clique of near-duplicates
  *     and blow candidate pairs up superlinearly, testing a pathology
  *     rather than scale. Lengths are preserved, so n_chars stays valid;
  *   - embeddings rotate element-wise by replica index (norm-preserving,
  *     direction-changing), so LSH bucket occupancy grows like a real
  *     corpus instead of stacking identical vectors;
  *   - pure dimensions (region, nation, supplier, part) copy as-is, as in
  *     TPC-H, where nation/region are fixed at any scale factor.
  *
  * Output: `<outDir>/<table>.parquet` single files, loadable by
  * [[graft.sources.Tables.load]] exactly like the driver's dirs.
  *
  * Usage: MakeScaled <srcSfDir> <outDir> [factor=10]
  */
object MakeScaled {
  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  /** Caesar-shift letters by i (identity for i == 0). */
  private def caesar(c: org.apache.spark.sql.Column, i: Int) = {
    val from = lower + upper
    val to = lower.drop(i % 26) + lower.take(i % 26) +
      upper.drop(i % 26) + upper.take(i % 26)
    if (i % 26 == 0) c else translate(c, from, to)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame =
      graft.sources.Tables.load(spark, srcDir, name)

    // key shifts: max+1 per keyed entity, computed once from the source
    def shiftOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val ordShift = shiftOf(t("orders"), "o_orderkey")
    val custShift = shiftOf(t("customer"), "c_custkey")
    val docShift = shiftOf(t("documents"), "doc_id")
    val vecShift = shiftOf(t("embeddings"), "vec_id")
    val evShift = shiftOf(t("events"), "event_id")
    val userShift = shiftOf(t("events"), "user_id")

    /** Union `factor` replicas of `df`, transformed per replica index. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$outDir/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$outDir/$name.parquet")
      dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[make-scaled] $name -> $dest")
    }

    new java.io.File(outDir).mkdirs()

    Seq("region", "nation", "supplier", "part")
      .foreach(n => write(n, t(n)))

    write("customer", replicate(t("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custShift))
    })
    write("orders", replicate(t("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordShift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custShift))
    })
    write("lineitem", replicate(t("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordShift))
    })
    write("events", replicate(t("events")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evShift))
        .withColumn("user_id", col("user_id") + lit(i * userShift))
    })
    write("documents", replicate(t("documents")) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docShift))
        .withColumn("text", caesar(col("text"), i))
    })
    write("embeddings", replicate(t("embeddings")) { (df, i) =>
      val dim = size(col("embedding"))
      val rot = if (i == 0) col("embedding")
        else concat(
          slice(col("embedding"), i + 1, 4096),
          slice(col("embedding"), 1, i))
      df.withColumn("vec_id", col("vec_id") + lit(i * vecShift))
        .withColumn("embedding",
          when(dim > i, rot).otherwise(col("embedding")))
    })

    spark.stop()
  }
}
