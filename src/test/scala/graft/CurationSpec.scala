package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation
import graft.sources.Tables

/** Curation ops: the distributed implementations checked against local
  * sequential references, plus the scale properties the oracle hash can't
  * see (partition-count independence, no single-partition windows). */
class CurationSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("packSequences matches a sequential concat-and-chunk reference") {
    val docs = Tables.load(spark, dir, "documents")
    val got = Curation.packSequences(docs, budget = 512)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // sequential reference: one pass over doc_id-ordered token counts
    val toks = docs
      .select(col("doc_id"), size(graft.queries.Q.tokens(col("text"))).as("n"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    var cum = 0L
    val expect = toks.map { case (id, n) =>
      val pack = cum / 512
      cum += n
      (id, n, pack)
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("packSequences is partition-count independent") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Curation.packSequences(docs.repartition(1), budget = 777)
      .orderBy(col("doc_id")).collect().toSeq
    val b = Curation.packSequences(docs.repartition(7), budget = 777)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("packSequences plans no single-partition global window") {
    val docs = Tables.load(spark, dir, "documents")
    val plan = Curation.packSequences(docs, budget = 2048)
      .queryExecution.executedPlan.toString
    // a bare Window.orderBy would surface as SinglePartition exchange
    assert(!plan.contains("SinglePartition"),
      s"global-window single-partition exchange in plan:\n$plan")
  }

  test("sampleBucket is deterministic and approximately honors the rate") {
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count()
    val s1 = docs.filter(Curation.sampleBucket(col("doc_id"), 20))
    val s2 = docs.filter(Curation.sampleBucket(col("doc_id"), 20))
    val c = s1.count()
    assert(c == s2.count()) // same rows every evaluation
    assert(math.abs(c.toDouble / n - 0.2) < 0.1)
    // nested property: a 10% bucket is a subset of the 20% bucket
    val c10 = docs.filter(Curation.sampleBucket(col("doc_id"), 10))
      .filter(!Curation.sampleBucket(col("doc_id"), 20)).count()
    assert(c10 == 0)
  }

  test("maskIds masks every digit run of the minimum length") {
    import spark.implicits._
    val df = Seq(
      ("acct 123456789 and 555", "acct [ID] and 555"),
      ("id=000001 code=12345", "id=[ID] code=12345"),
      ("no digits", "no digits")
    ).toDF("raw", "want")
    val bad = df.select(Curation.maskIds(col("raw")).as("got"), col("want"))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("contamination broadcasts the benchmark side (corpus never shuffles to the join)") {
    val docs = Tables.load(spark, dir, "documents")
    val df = Curation.contamination(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("repetitionStats flags degenerate text") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a a a a a"), // one token repeated
      (2L, "w x y z q r s t") // all distinct
    ).toDF("doc_id", "text")
    val m = Curation.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L)._1 > 0.8 && m(1L)._2 == 1.0)
    assert(m(2L)._1 == 0.0 && m(2L)._2 == 0.125)
  }

  test("splitAssign: total, disjoint, and stable under corpus growth") {
    val docs = Tables.load(spark, dir, "documents")
    val assigned = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id")).as("split"))
    // total: every doc gets exactly one of the three labels
    val n = docs.count()
    assert(assigned.filter(col("split").isin("train", "val", "test"))
      .count() == n)
    // stable: the assignment of a doc does not depend on which other rows
    // are present (hash of the key only) — recompute on a half-corpus
    val half = docs.filter(col("doc_id") % 2 === 0)
    val again = half.select(col("doc_id"),
      Curation.splitAssign(col("doc_id")).as("split2"))
    val moved = assigned.join(again, "doc_id")
      .filter(col("split") =!= col("split2")).count()
    assert(moved == 0)
    // rough proportions at default 70/20/10
    val frac = assigned.filter(col("split") === "train").count().toDouble / n
    assert(frac > 0.6 && frac < 0.8, s"train fraction $frac")
  }

  test("tfIdfTopK: rare term outranks common term at equal tf") {
    import spark.implicits._
    // 'rare' appears in 1 doc; every other token appears in all 4 docs
    val df = Seq(
      (1L, "rare common extra"),
      (2L, "common extra pad"),
      (3L, "common extra pad"),
      (4L, "common extra pad")
    ).toDF("doc_id", "text")
    val top = graft.ops.TextOps.tfIdfTopK(df, k = 1)
      .filter(col("doc_id") === 1L).collect()
    assert(top.length == 1 && top(0).getAs[String]("tok") == "rare")
  }
}
