package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.silver.BucketedTables

/** Bucketed-table upsert: correctness + the exchange-free plan property
  * that makes merges O(batch) instead of O(table) network at scale. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh-").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  // unique db per run: the shared session may keep the default warehouse
  // dir, where a previous run's managed-table location would collide
  private val db = s"bdb${System.nanoTime()}"

  test("bucketed merge: correctness and no target-side exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // align shuffle partitions with the bucket count so the source batch
    // shuffles ONCE straight into the bucket layout (the production
    // sizing rule: buckets = a multiple of cluster parallelism)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
      BucketedTables.writeMerged(spark, db, "items", base, Seq("id"))

      // merge a batch: updates 1..100, inserts 1001..1100
      val batch = ((1 to 100) ++ (1001 to 1100))
        .map(i => (i.toLong, s"new$i")).toDF("id", "payload")

      // plan property: the bucketed target side needs NO Exchange — only
      // the incoming batch is shuffled to the bucket layout
      val plan = BucketedTables
        .mergePlan(spark, db, "items", batch, Seq("id"))
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(plan.contains("Bucketed: true"), plan)
      assert(exchanges == 1, s"expected 1 exchange (source side only):\n$plan")

      BucketedTables.writeMerged(spark, db, "items", batch, Seq("id"))
      val after = spark.table(s"$db.items")
      assert(after.count() == 1100)
      assert(after.filter($"id" === 50).head().getString(1) == "new50")
      assert(after.filter($"id" === 500).head().getString(1) == "v500")
      assert(after.filter($"id" === 1050).head().getString(1) == "new1050")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
