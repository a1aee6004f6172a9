package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.silver.Snapshots

class SnapshotsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp() = Files.createTempDirectory("snap-").toString + "/t"

  test("commit/readVersion: every version stays readable (time travel)") {
    import spark.implicits._
    val table = tmp()
    val v0 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    val v1 = Snapshots.commitMerged(Seq((2L, "B"), (3L, "c")).toDF("id", "s"),
      table, keys = Seq("id"))
    assert(v0 == 0 && v1 == 1)
    val at0 = Snapshots.readVersion(spark, table, 0).as[(Long, String)]
      .collect().toSet
    val at1 = Snapshots.readVersion(spark, table, 1).as[(Long, String)]
      .collect().toSet
    assert(at0 == Set((1L, "a"), (2L, "b")))
    assert(at1 == Set((1L, "a"), (2L, "B"), (3L, "c"))) // source wins on key
    assert(Snapshots.read(spark, table).count() == 3)
  }

  test("rollback re-commits an old version; vacuum keeps the newest N") {
    import spark.implicits._
    val table = tmp()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), table)
    Snapshots.commit(Seq((1L, "WRONG")).toDF("id", "s"), table)
    val v2 = Snapshots.rollback(spark, table, 0)
    assert(v2 == 2)
    assert(Snapshots.read(spark, table).as[(Long, String)].collect()
      .toSet == Set((1L, "a")))
    assert(Snapshots.versions(table) == Seq(0L, 1L, 2L))
    Snapshots.vacuum(table, keep = 1)
    assert(Snapshots.versions(table) == Seq(2L))
    assert(Snapshots.read(spark, table).count() == 1)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, table, 0)
    }
  }

  test("changes() tags inserts, updates, deletes; unchanged rows absent") {
    import spark.implicits._
    val table = tmp()
    Snapshots.commit(
      Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "s"), table)
    Snapshots.commit(
      Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "s"), table)
    val ch = Snapshots.changes(spark, table, 0L, 1L, Seq("id"))
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(ch == Set((2L, "update"), (3L, "delete"), (4L, "insert")))
  }
}
