package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted join: identical result to the plain join on heavily skewed
  * keys, with the hot key spread across salt partitions. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1 to 20000)
      .map(i => (if (i % 10 == 0) i.toLong % 50 else 1L, i))
      .toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    // spot-check aggregate equality per key
    val pa = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sa = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pa == sa)

    // the hot key's rows really spread over multiple salt values
    val spread = big.withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 1L)
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(spread > 4)
  }
}
