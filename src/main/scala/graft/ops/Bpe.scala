package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer learning and application (Sennrich,
  * Haddow & Birch, ACL 2016) — the vocabulary-construction step of a
  * training-data pipeline, distributed Spark-first.
  *
  * Representation: every symbol is exactly ONE char. Words start as
  * their raw characters; each learned merge allocates a fresh
  * private-use-area char (U+E000 + rank) for the merged symbol. Under
  * this encoding the greedy left-to-right non-overlapping merge of BPE
  * is EXACTLY the semantics of the codegen'd `replace(word, pair,
  * marker)` built-in, so both learning and application run with zero
  * UDFs and zero per-row Scala:
  *
  *   - pair counting: substring-explode over the (word, freq)
  *     vocabulary table — vocabulary-bounded, never corpus-bounded;
  *     counts are map-side combined on the pair key. Adjacent pairs
  *     are counted at every position (overlapping occurrences
  *     included), matching the reference algorithm's `get_stats`.
  *   - argmax: an aggregate over the pair-count frame with the
  *     deterministic tie-break (count DESC, pair ASC) — one bounded
  *     row to the driver per iteration, the same driver-state pattern
  *     as k-means centroids.
  *   - application: a chain of N static `replace` column transforms
  *     (one per learned merge, in rank order) — whole-stage codegen,
  *     no shuffle at all.
  *
  * Scale shape: learning runs over the DISTINCT-word frequency table
  * (~10M rows at 100 TB, cached once), so each of the N iterations is
  * one bounded aggregation + one map-only transform of that table —
  * the corpus itself is touched exactly once, by the initial word
  * count. Assumes BMP text with no private-use chars in the corpus
  * (documented; guarded by a filter).
  */
object Bpe {

  /** First allocated merge-symbol char. */
  val markerBase: Char = '\uE000'

  /** A learned merge: the two-symbol pair string it rewrites, the
    * single marker char that replaces it, and the merge expanded back
    * to original characters for human-readable output. */
  final case class Merge(rank: Int, pair: String, marker: String,
      left: String, right: String, count: Long)

  /** Distinct-word frequency table (`w`, `freq`) from a document
    * frame — the only corpus-wide pass in BPE learning. Words
    * containing private-use markers are dropped (they would alias
    * merge symbols). */
  def wordFreq(docs: DataFrame): DataFrame =
    TextOps.tokenized(docs)
      .where(length(col("tok")) > 0 &&
        !col("tok").rlike("[\\uE000-\\uF8FF]"))
      .groupBy(col("tok").as("w"))
      .agg(count(lit(1)).as("freq"))

  /** Adjacent-symbol pair counts over a (`w`, `freq`) vocabulary
    * frame, weighted by word frequency: one row per (pair, total).
    * Overlapping occurrences count at every position, like the
    * reference `get_stats`. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .where(length(col("w")) >= 2)
      .select(col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("g"),
        col("w"))
      .select(expr("substring(w, g, 2)").as("pair"), col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n"))

  /** Learn `nMerges` BPE merges from a document frame. Returns the
    * merge table in rank order; stops early when the best pair's
    * count falls below `minCount`. Deterministic: ties break on the
    * pair's (marker-alphabet) string ascending, and marker chars are
    * allocated in rank order. */
  def learn(docs: DataFrame, nMerges: Int, minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 0 && nMerges < 6400, "marker alphabet is U+E000..U+F8FF")
    var words = wordFreq(docs).cache()
    words.count() // materialize before the loop
    val expand = scala.collection.mutable.Map[Char, String]()
    def expandSym(c: Char): String = expand.getOrElse(c, c.toString)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var stop = false
    while (rank < nMerges && !stop) {
      val best = pairCounts(words)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(1) < minCount) stop = true
      else {
        val pair = best(0).getString(0)
        val n = best(0).getLong(1)
        val marker = (markerBase + rank).toChar
        expand(marker) = expandSym(pair.charAt(0)) + expandSym(pair.charAt(1))
        merges += Merge(rank, pair, marker.toString,
          expandSym(pair.charAt(0)), expandSym(pair.charAt(1)), n)
        val next = words
          .withColumn("w", replace(col("w"), lit(pair), lit(marker.toString)))
          .cache()
        next.count()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Learned merges as a DataFrame (`rank`, `left`, `right`, `n`) —
    * the artifact a tokenizer ships. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "n")
  }

  /** Apply learned merges to a document frame: per document, the
    * BPE-segmented token count and fertility (BPE tokens per
    * whitespace word). A chain of `merges.size` static `replace`
    * transforms per token — map-only, whole-stage codegen; the only
    * shuffle is the final per-doc aggregation. */
  def segmentStats(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val tok = TextOps.tokenized(docs)
    val merged = merges.foldLeft(col("tok")) { (c, m) =>
      replace(c, lit(m.pair), lit(m.marker))
    }
    tok
      .select(col("doc_id"), length(merged).as("n_syms"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(col("n_syms")).as("bpe_tokens"),
        (sum(col("n_syms")).cast("double") / count(lit(1)))
          .as("fertility"))
  }
}
