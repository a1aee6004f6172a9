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

  test("mass-duplicated corpus: the fused band buckets complete and emit " +
      "exactly the m-choose-2 pairs at est_sim 1.0 (r16 hot-bucket " +
      "disclosure)") {
    import spark.implicits._
    // 400 byte-identical docs: every band key collides corpus-wide, so
    // each of the 4 band buckets holds the WHOLE corpus — the
    // degenerate hot bucket candidatesFromSignatures' state bound
    // documents. 13 longs per member ⇒ ~42 KB of buffer per bucket
    // here; the pair expansion streams 4 × m·(m−1)/2 rows pre-distinct.
    val m = 400
    val boiler = "the same boilerplate text repeated across the corpus " +
      "with enough length to shingle"
    val docs = (1L to m.toLong).map(id => (id, boiler)).toDF("doc_id", "text")
    val cand = graft.ops.DedupOps.lshCandidates(docs)
    val rows = cand.collect()
    assert(rows.length == m * (m - 1) / 2)
    assert(rows.forall(_.getDouble(2) == 1.0))
    // the id-only path (nearDuplicates' generator) survives it too and
    // verification confirms jaccard 1.0 on every pair
    val nd = graft.ops.DedupOps.nearDuplicates(docs, threshold = 0.5)
    assert(nd.count() == m * (m - 1) / 2)
  }
}
