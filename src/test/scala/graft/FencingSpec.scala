package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ConcurrentWriteException
import graft.silver.{BucketedState, Snapshots, Upsert}

/** Writer-writer fencing on the swapped stores (r11 verdict task 2):
  * two concurrent folds/commits must SERIALIZE or be REJECTED loudly
  * ([[ConcurrentWriteException]]) — never last-writer-wins silently
  * discarding the other's fold. Proven two ways per store: a
  * deterministic stale-generation rejection, and a multi-writer race
  * with a retry loop whose final state must equal the merge of EVERY
  * batch (a single lost update breaks the count/checksum).
  */
class FencingSpec extends AnyFunSuite {

  // local[4]/4 like every suite: the shared getOrCreate session's
  // parallelism shapes file counts other suites' bytes budgets assume
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(pairs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id", "v")
  }

  /** True when any exception in the cause chain is the staged read
    * racing a retired generation (surfaces as FAILED_READ_FILE with
    * several sub-codes) — the same clean-retry contract as an explicit
    * [[ConcurrentWriteException]]. */
  private def isRetiredGenRace(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(t => Option(t.getMessage)
        .exists(_.contains("FAILED_READ_FILE")))

  private def retrying[T](maxTries: Int = 40)(body: => T): T = {
    var tries = 0
    while (true) {
      try return body
      catch {
        case _: ConcurrentWriteException if tries < maxTries => tries += 1
        case e: Exception
            if tries < maxTries && isRetiredGenRace(e) => tries += 1
      }
    }
    sys.error("unreachable")
  }

  private def race(writers: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(writers.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(
        writers.map(w => scala.concurrent.Future(w()))),
      scala.concurrent.duration.Duration(300, "s"))
    finally pool.shutdown()
  }

  test("stale-generation fold is rejected, state unchanged " +
      "(deterministic)") {
    val path = Files.createTempDirectory("fence-det-")
      .resolve("t").toString
    Upsert.writeMerged(df((1L to 50L).map(i => i -> s"a-$i")), path,
      Seq("id"))
    val before = BucketedState.bucketFiles(path)
      .map { case (b, ps) => b -> ps.map(_.getFileName.toString).toSet }
    // a fold claiming it read a generation that never existed must be
    // rejected at the swap, not installed
    intercept[ConcurrentWriteException] {
      BucketedState.fold(spark, path, df(Seq(1L -> "stale")), Seq("id"),
        expectedGen = Some(999L)) { (slice, delta) =>
        slice.map(s => Upsert.merge(s, delta, Seq("id"))).getOrElse(delta)
      }
    }
    val after = BucketedState.bucketFiles(path)
      .map { case (b, ps) => b -> ps.map(_.getFileName.toString).toSet }
    assert(after == before, "a REJECTED fold changed the store")
    assert(spark.read.parquet(path).filter(col("v") === "stale").count()
      == 0)
  }

  test("racing keyed writeMerged writers: serialize or reject, final " +
      "table is the merge of EVERY batch") {
    val path = Files.createTempDirectory("fence-race-")
      .resolve("t").toString
    Upsert.writeMerged(df(Seq(0L -> "seed")), path, Seq("id"))
    val nWriters = 4
    val perWriter = 4
    val batchSize = 25
    race((0 until nWriters).map { w => () =>
      (0 until perWriter).foreach { r =>
        val base = (w * perWriter + r) * 1000 + 1
        val batch = df((base until base + batchSize)
          .map(i => i.toLong -> s"w$w-r$r"))
        retrying() { Upsert.writeMerged(batch, path, Seq("id")) }
      }
    })
    val rows = spark.read.parquet(path)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 1 + nWriters * perWriter * batchSize,
      s"lost update: ${rows.size} rows; a rejected-but-unretried or " +
        "silently-discarded fold dropped a batch")
    for (w <- 0 until nWriters; r <- 0 until perWriter) {
      val base = (w * perWriter + r) * 1000 + 1
      (base until base + batchSize).foreach(i =>
        assert(rows(i.toLong) == s"w$w-r$r"))
    }
  }

  test("racing snapshot commitMerged writers: every version linear, " +
      "no lost update") {
    val table = Files.createTempDirectory("fence-snap-")
      .resolve("t").toString
    Snapshots.commitMerged(df(Seq(0L -> "seed")), table, Seq("id"))
    val nWriters = 4
    val perWriter = 3
    race((0 until nWriters).map { w => () =>
      (0 until perWriter).foreach { r =>
        val base = (w * perWriter + r) * 100 + 1
        val batch = df((base until base + 10).map(i => i.toLong -> s"w$w"))
        retrying() { Snapshots.commitMerged(batch, table, Seq("id")) }
      }
    })
    // linear history: one version per successful commit, no gaps
    val vs = Snapshots.versions(table)
    assert(vs == (0L to (nWriters * perWriter).toLong),
      s"history not linear: $vs")
    val rows = Snapshots.read(spark, table).collect()
    assert(rows.length == 1 + nWriters * perWriter * 10,
      "lost update in the snapshot history")
    // every version is a strict superset of its predecessor (each
    // commit only adds keys here)
    val sizes = vs.map(v =>
      Snapshots.readVersion(spark, table, v).count())
    assert(sizes == sizes.sorted && sizes.distinct == sizes,
      s"non-monotonic version sizes: $sizes")
  }

  test("racing partition-scoped merges: writers serialize under the " +
      "table monitor, final table is the merge of EVERY batch") {
    import graft.silver.PartitionedUpsert
    import org.apache.spark.sql.functions.lit
    val path = Files.createTempDirectory("fence-part-")
      .resolve("t").toString
    PartitionedUpsert.writeMerged(
      df(Seq(0L -> "seed")).withColumn("day", lit("d0")),
      path, Seq("id"), "day")
    val nWriters = 4
    val perWriter = 3
    race((0 until nWriters).map { w => () =>
      (0 until perWriter).foreach { r =>
        val base = (w * perWriter + r) * 100 + 1
        // every batch lands in the SAME partition — the maximally
        // contended shape (all writers rewrite one partition)
        val batch = df((base until base + 10).map(i => i.toLong -> s"w$w"))
          .withColumn("day", lit("d0"))
        retrying() {
          PartitionedUpsert.writeMerged(batch, path, Seq("id"), "day")
        }
      }
    })
    val rows = spark.read.parquet(path).select(col("id")).collect()
    assert(rows.length == 1 + nWriters * perWriter * 10,
      "lost update in the partition-scoped merge")
  }

  test("racing bucket-scoped catalog merges: serialize or reject, " +
      "final table is the merge of EVERY batch") {
    import graft.silver.BucketedTables
    val db = "fence_db"
    val tbl = "race_t"
    spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
    BucketedTables.writeMerged(spark, db, tbl, df(Seq(0L -> "seed")),
      Seq("id"))
    val nWriters = 4
    val perWriter = 3
    race((0 until nWriters).map { w => () =>
      (0 until perWriter).foreach { r =>
        val base = (w * perWriter + r) * 100 + 1
        val batch = df((base until base + 10).map(i => i.toLong -> s"w$w"))
        retrying() {
          BucketedTables.writeMerged(spark, db, tbl, batch, Seq("id"))
        }
      }
    })
    val rows = spark.table(s"$db.$tbl").collect()
    assert(rows.length == 1 + nWriters * perWriter * 10,
      "lost update in the catalog-table merge")
    spark.sql(s"DROP TABLE $db.$tbl")
  }
}
