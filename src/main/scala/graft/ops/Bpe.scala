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
  *
  * Job-count bound: [[learn]] is exact sequential greedy — ONE Spark
  * job pair (top-1 aggregation + vocab rewrite) PER MERGE. That is the
  * right tool up to a few hundred merges (QA fertility probes, the
  * oracle corpus); a production 32k-merge vocabulary would be 32k
  * sequential scheduler round-trips. [[learnBatched]] is the scale
  * path: identical output (proof in its scaladoc), but each pass
  * admits every merge that sequential greedy provably picks next, so
  * the pass count collapses to vocabulary structure (tens of passes
  * for typical corpora), not merge count.
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
    // finally-unpersist the CURRENT vocabulary frame: a failed
    // iteration must not pin it in the long-lived session's cache
    try {
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
    } finally words.unpersist()
    merges.toSeq
  }

  /** [[learn]] with BATCHED passes — bit-identical merge table, job
    * count per pass instead of per merge. Each pass sorts the pair
    * table by the greedy order (count DESC, pair ASC), collects a
    * bounded prefix, and admits a batch that sequential greedy is
    * PROVEN to pick in exactly that order:
    *
    *  - the top pair always enters (it is greedy's next pick by
    *    definition);
    *  - a further pair enters while it shares no symbol with any
    *    earlier-admitted pair of this pass AND its count is STRICTLY
    *    above `nStop` — the best count among pairs that do share a
    *    symbol (bounded by the sorted prefix's edge when truncated).
    *
    * Exactness argument:
    *  - merging a pair never INCREASES any existing pair's count, and
    *    symbol-disjoint pairs' counts are UNCHANGED (the marker
    *    replaces a whole occurrence, creating no new adjacency between
    *    symbols outside it) — so admitted pairs keep their counts and
    *    sorted order while the batch applies;
    *  - every pair CREATED by an admitted merge a·b→X with a ≠ b maps
    *    occurrence-for-occurrence into a pre-existing pair sharing a
    *    symbol with it ("yX" ← "y·a", "X·z" ← "b·z", and the
    *    self-overlap "XX" ← the middle "b·a" of "abab"), so created
    *    counts are ≤ nStop — STRICTLY below every later-admitted
    *    count, which also rules the tie-break out;
    *  - a SELF-pair merge a·a→X is the one exception: its created
    *    "XX" maps onto the pair's OWN occurrences ("aaaa" → "XX"),
    *    which nothing bounds — so a self-pair ENDS its batch, and the
    *    argument above covers everything admitted before it.
    * Worst case (top pairs all chained on shared symbols) a pass
    * degrades to [[learn]]'s single exact merge; typical vocabularies
    * admit wide batches. */
  def learnBatched(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
      maxBatch: Int = 256): Seq[Merge] = {
    require(nMerges >= 0 && nMerges < 6400, "marker alphabet is U+E000..U+F8FF")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    var words = wordFreq(docs).cache()
    words.count() // materialize before the loop
    val expand = scala.collection.mutable.Map[Char, String]()
    def expandSym(c: Char): String = expand.getOrElse(c, c.toString)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var stop = false
    // finally-unpersist, as in [[learn]]
    try {
    while (merges.size < nMerges && !stop) {
      val want = math.min(maxBatch, nMerges - merges.size)
      val collectK = want * 4 + 1
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(collectK).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (top.isEmpty || top(0)._2 < minCount) stop = true
      else {
        val symbols = scala.collection.mutable.Set[Char]()
        val admitted = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        var i = 0
        var scanning = true
        while (scanning && i < top.length && admitted.size < want) {
          val (pair, n) = top(i)
          if (n >= minCount && (admitted.isEmpty ||
              (!symbols(pair.charAt(0)) && !symbols(pair.charAt(1))))) {
            admitted += ((pair, n))
            symbols += pair.charAt(0)
            symbols += pair.charAt(1)
            i += 1
            // a SELF-pair (aa→X) ends the batch: its created marker
            // run-pair XX maps onto the admitted pair's OWN occurrences
            // ("aaaa"→"XX"), not onto a pre-existing sharing pair, so
            // nStop does NOT bound it — greedy could pick XX before any
            // later-admitted pair (review finding, reproduced with
            // 'aaaa'×200 + 'cd'×150: sequential learns [aa, XX, cd],
            // an unbounded batch would learn [aa, cd, ...]). Every
            // NON-self created pair ("yX"←"y·a", "Xz"←"b·z", the
            // "XX"←middle "b·a" of "abab") maps occurrence-for-
            // occurrence onto a pre-existing sharing pair and stays
            // nStop-bounded, so the exactness argument holds for the
            // pairs admitted BEFORE the self-pair.
            if (pair.charAt(0) == pair.charAt(1)) scanning = false
          } else scanning = false
        }
        // nStop bounds the count of ANY pair a batch merge can create:
        // the first unadmitted row bounds all sharing pairs at/after it
        // (sorted order), and a truncated prefix's edge bounds the
        // unseen tail; -1 = no sharing pair can exist at all, so no
        // pair can be created either
        var nStop = if (top.length == collectK) top.last._2 else -1L
        if (i < top.length) nStop = math.max(nStop, top(i)._2)
        val keep = admitted.head +: admitted.tail.takeWhile(_._2 > nStop)
        val startRank = merges.size
        var mergedCol = col("w")
        keep.zipWithIndex.foreach { case ((pair, n), k) =>
          val marker = (markerBase + startRank + k).toChar
          expand(marker) =
            expandSym(pair.charAt(0)) + expandSym(pair.charAt(1))
          merges += Merge(startRank + k, pair, marker.toString,
            expandSym(pair.charAt(0)), expandSym(pair.charAt(1)), n)
          mergedCol = replace(mergedCol, lit(pair), lit(marker.toString))
        }
        val next = words.withColumn("w", mergedCol).cache()
        next.count()
        words.unpersist()
        words = next
      }
    }
    } finally words.unpersist()
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
