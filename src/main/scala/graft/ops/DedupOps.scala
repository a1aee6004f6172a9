package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.queries.Q.{h32, tokens}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard (the embedding-cosine near-dup
  * path lives in VectorOps).
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash aggregation on a 128-bit fingerprint — one
  *    shuffle keyed by fingerprint, map-side partial aggregation on;
  *  - MinHash: shingling and signature computation are embarrassingly
  *    parallel per document; only BAND KEYS shuffle (k·n small rows),
  *    never shingle sets — the candidate join is an equi-join on band
  *    keys, so AQE can split skewed buckets;
  *  - SimHash reduces each doc to one int64; near-dup search is a
  *    bucketed self-join on bit-prefixes, not an O(n²) cross join;
  *  - all hashes are md5-derived and engine-agnostic (no JVM hashCode):
  *    signatures computed here match the DuckDB oracle bit-for-bit.
  */
object DedupOps {

  /** Exact dedup: group by md5 of normalized text, keep the minimum id.
    * Returns (fingerprint, keep_id, n_copies). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(lower(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct character n-gram shingles per document: (doc_id, s). */
  def charShingles(docs: DataFrame, n: Int = 8): DataFrame =
    docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))))
        .as("pos"))
      .select(col("doc_id"), expr(s"substring(text, pos, $n)").as("s"))
      .distinct()

  /** MinHash signature: k independent permutations approximated by
    * min(md5(i ':' shingle)) — the lexicographic min of a salted md5 is an
    * engine-portable uniform hash min. Returns one row per doc with
    * columns s0..s{k-1}. */
  def minhashSignatures(docs: DataFrame, k: Int = 12): DataFrame = {
    val salted = charShingles(docs)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(k - 1))).as("i"), col("s"))
      .select(col("doc_id"), col("i"),
        md5(concat(col("i").cast("string"), lit(":"), col("s"))).as("m"))
    val sigCols = (0 until k).map(i =>
      min(when(col("i") === i, col("m"))).as(s"s$i"))
    salted.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH banding over a signature frame: band b hashes signature positions
    * [b*r, (b+1)*r). Returns (doc_id, band, bk). */
  def lshBands(sig: DataFrame, k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val bands = (0 until k / rowsPerBand).map { b =>
      val key = md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i")): _*))
      sig.select(col("doc_id"), lit(b).as("band"), key.as("bk"))
    }
    bands.reduce(_.unionByName(_))
  }

  /** Candidate pairs from band collisions + estimated similarity =
    * fraction of matching signature positions. Returns (a, b, est_sim). */
  def lshCandidates(docs: DataFrame, k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val sig = minhashSignatures(docs, k)
    val bands = lshBands(sig, k, rowsPerBand)
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sig.columns.filter(_ != "doc_id")
      .foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumnRenamed("doc_id", "a")
    val sb = sig.columns.filter(_ != "doc_id")
      .foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumnRenamed("doc_id", "b")
    val matchCount = (0 until k)
      .map(i => when(col(s"a_s$i") === col(s"b_s$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (matchCount.cast("double") / k).as("est_sim"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * intersection / union in exact ints; one equi-join on the shingle. */
  def jaccardPairs(docs: DataFrame, n: Int = 8, threshold: Double = 0.2): DataFrame = {
    val sh = charShingles(docs, n)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over distinct whitespace tokens: per bit, the sign of
    * the +1/-1 vote sum; all engine-portable integer math. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("doc_id"), h32(col("tok")).as("h"))
    val bits = toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(31))).as("j"))
      .select(col("doc_id"), col("j"),
        when(expr("(shiftright(h, j) & 1) = 1"), 1L).otherwise(-1L).as("v"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("v")).as("sv"))
    bits.groupBy(col("doc_id"))
      .agg(sum(when(col("sv") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs within a Hamming radius, bucketed by the high
    * 16 bits so the self-join is band-limited (docs differing only in low
    * bits collide; two-table OR-band variant would catch the rest). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      expr("shiftright(simhash, 16)").as("bucket"))
    banded.as("x").join(banded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
