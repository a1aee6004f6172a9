package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: is the fused literal-center assignment still codegen'd at
  * √N center counts (448 at sf10)? Times ivfAssign in isolation and
  * prints whether the plan holds a WholeStageCodegen span over the
  * assignment project (a silent Janino fallback would make the argmin
  * interpreted — per-row allocation of 448 structs). */
object ProfileAssign {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scaled/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE's plan wrapper hides WholeStageCodegen markers in toString;
      // the assignment is a single map stage, so AQE changes nothing
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    for (c <- Seq(16, 142, 448)) {
      val asg = graft.ops.VectorOps.ivfAssign(emb, nCells = c)
      // toString marks codegen spans as "*(n)" (the word
      // WholeStageCodegen only appears in explain("formatted"))
      val plan = asg.queryExecution.executedPlan.toString
      val hasWsc = plan.contains("*(")
      (1 to 2).foreach { _ =>
        asg.write.format("noop").mode("overwrite").save()
      }
      val t0 = System.nanoTime()
      asg.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[assign] c=$c%4d codegen=$hasWsc time=$sec%.2f s")
    }
    spark.stop()
  }
}
