package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Q.{h32, tokens}

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All operators are single-pass DataFrame transforms built from codegen'd
  * built-ins (no UDFs): at 100 TB each is one scan + one hash aggregation
  * keyed by document, with every arithmetic step in exact integer math so
  * results are reproducible across engines, partitionings and retries.
  */
object TextOps {

  /** Tiny per-language stopword markers for the n-gram-free heuristic
    * language ID (the real lists would be longer; the operator shape —
    * token-set intersection scoring — is the same). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Spread a few-file input across all cores before exploding (see
    * DedupOps.spread). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Explode to one row per token (whitespace tokenization). */
  def tokenized(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    spread(docs).select(col(idCol), explode(tokens(col(textCol))).as("tok"))

  /** Per-document aggregate stats over tokens: counts, exact length sums,
    * stopword hits — the shared base for quality scoring and language ID. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val enSet = stopwords("en")
    tokenized(docs)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("sum_tok_len"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(when(col("tok").isin(enSet: _*), 1L).otherwise(0L)).as("en_hits"))
  }

  /** Quality scoring: length / punctuation / stopword ratios plus a
    * bucketed verdict — ratios are IEEE divisions of exact integers. */
  def quality(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      length(col("text")).as("n_chars_text"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("long").as("punct_count"))
    tokenStats(docs).join(base, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("punct_count"),
        (col("sum_tok_len").cast("double") / col("n_tokens")).as("avg_token_len"),
        (col("en_hits").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"))
      .withColumn("quality_bucket",
        when(col("n_tokens") >= 20 && col("stop_ratio") >= 0.01 &&
          col("distinct_ratio") >= 0.2, "good").otherwise("low"))
  }

  /** Gopher-style repetition/format quality rules (Rae et al. 2021,
    * "Scaling Language Models", table A1) as a single narrow transform:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (`#` and `...`), bullet-line and ellipsis-line fractions, fraction
    * of words with an alphabetic character, and distinct-stopword
    * presence. Reference intent: the reference's validation predicates
    * gate rows on cheap per-row quality checks
    * (`ingestion_agent/.../models.py` payload validation); this is the
    * document-corpus analog a training-data pipeline runs before
    * tokenization.
    *
    * Scale shape: zero shuffles — every metric is per-row array math over
    * `split()` products (codegen'd higher-order functions), so at 100 TB
    * this is one scan at input parallelism. All counts are exact integers;
    * the ratios are single IEEE divisions of those integers, so results
    * hash-match any engine computing the same definition.
    */
  def gopherRules(docs: DataFrame,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      stopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Long = 2): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val lines = split(col("text"), "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val hashCount = (length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))).cast("long")
    val ellipsisCount = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))).cast("long") / 3)
      .cast("long")
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("long")
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$")))
      .cast("long")
    // distinct stopwords present (presence, not occurrence count)
    val stopHits = size(array_intersect(words,
      array(stopWords.map(lit): _*))).cast("long")
    docs.select(col("doc_id"),
        nWords.as("n_words"),
        (sumLen.cast("double") / nWords).as("mean_word_len"),
        ((hashCount + ellipsisCount).cast("double") / nWords).as("symbol_ratio"),
        (bulletLines.cast("double") / nLines).as("bullet_ratio"),
        (ellipsisLines.cast("double") / nLines).as("ellipsis_ratio"),
        (nAlpha.cast("double") / nWords).as("alpha_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("passes",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_ratio") <= maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisRatio &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("stop_hits") >= minStopHits).cast("int"))
  }

  /** Heuristic language ID by stopword-set hit counts. */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokenized(docs)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      sum(when(col("tok").isin(words: _*), 1L).otherwise(0L)).as(s"${lang}_hits")
    }
    val agg = toks.groupBy(col("doc_id"))
      .agg(scores.head, scores.tail: _*)
    // predicted = argmax with alphabetical tie-break; 'unknown' if no hits
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.foldLeft((lit("unknown"), lit(0L))) { case ((bl, bs), l) =>
      val s = col(s"${l}_hits")
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    agg.withColumn("predicted", best._1)
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs / digit runs / punctuation runs). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0)))
        .cast("long").as("bpe_ish_tokens"))

  /** Corpus-frequency rarity profile per document — the quality signal
    * that separates natural text (mostly common tokens) from junk (rare
    * garbage tokens): per doc, the token count, summed corpus frequency
    * of its tokens, their mean (IEEE division of exact int64 sums), the
    * hapax count (corpus-frequency-1 tokens) and the rarest token's
    * frequency.
    *
    * Shape at scale: one tokenize pass; the vocabulary aggregation and
    * the frequency attach share the token-keyed exchange (same key, same
    * partitioning — exchange reuse); the per-doc rollup is the only
    * other shuffle. Nothing is collected; the vocabulary never has to
    * fit anywhere whole. */
  def rarityStats(docs: DataFrame): DataFrame = {
    val tk = tokenized(docs)
    val vc = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    tk.join(vc, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("c")).as("sum_freq"),
        (sum(col("c")).cast("double") / count(lit(1))).as("avg_freq"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        min(col("c")).as("min_freq"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: walking the corpus in
    * `doc_id` order in fixed-size buckets of `bucketDocs` documents,
    * emit the cumulative token count and the cumulative number of
    * distinct token TYPES seen up to the end of each bucket. The
    * tokens-vs-types curve is the standard corpus-health diagnostic: a
    * natural-language corpus follows Heaps' law (types ~ K·tokens^β,
    * β≈0.5); a template-stamped or truncated-vocabulary corpus plateaus
    * early, a junk corpus grows near-linearly.
    *
    * Shape at scale: ONE corpus-keyed exchange — a (token, bucket)
    * count aggregation (map-side combined) that both curve inputs
    * derive from (same exchange subtree → ReusedExchange): bucket
    * token totals by re-keying its counts, and first-occurrence
    * charging by a min-bucket aggregation per type (floor is monotone
    * in doc_id, so min bucket = the first doc's bucket — no
    * distinct-over-window anywhere). Only one row per bucket
    * (#docs / bucketDocs — pick bucketDocs so this is thousands, not
    * billions) reaches the single ordered cumulative window at the end;
    * raw tokens never cross it. */
  def vocabularyGrowth(docs: DataFrame, bucketDocs: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tb = tokenized(docs)
      .groupBy(col("tok"),
        floor(col("doc_id") / bucketDocs).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val bucketTokens = tb
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_tokens"))
    val newTypes = tb
      .groupBy(col("tok")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketTokens.join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      .select(col("bucket"),
        sum(col("n_tokens")).over(w).as("cum_tokens"),
        sum(col("new_types")).over(w).as("cum_types"))
  }

  /** BM25 relevance of every document against a fixed query-term set.
    *
    * Shape at scale: one tokenize pass → per-doc length aggregation; term
    * frequencies only for the |terms| query terms (the isin filter prunes
    * before the shuffle); document frequencies and corpus stats are
    * term-count-sized aggregates broadcast back onto the per-doc frame.
    * Nothing shuffles more than one row per (doc, query-term).
    *
    * Determinism: per-term contributions are summed as FIXED-ORDER column
    * additions (conditional aggregation per term), never a groupBy over a
    * double column whose addition order would depend on partitioning —
    * bit-identical across engines and retries. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val tok = tokenized(docs)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = tok.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    // constants combined as lit+lit so Catalyst folds them with the same
    // IEEE additions the oracle's SQL literals produce
    val contrib = idf * (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    // fixed-order sum: one conditional-agg column per query term
    val termCols = terms.map(t =>
      max(when(col("tok") === t, contrib)).as(s"c_$t"))
    val perDoc = joined.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
    val score = terms.map(t => coalesce(col(s"c_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    perDoc.select(col("doc_id"), round(score, 4).as("score"))
  }

  /** Corpus-wide top-k most frequent word n-grams (count desc, gram asc).
    * Map-side n-gram expansion from the token array (no token-level
    * self-join), partial-agg'd count, and a global top-k sort over the
    * (already tiny) distinct-gram aggregate. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 50): DataFrame = {
    val gramExpr = "transform(sequence(0, size(w) - " + n + "), i -> " +
      (0 until n).map(j => s"element_at(w, i + ${j + 1})")
        .mkString("concat_ws(' ', ", ", ", "))")
    val grams = spread(docs)
      .select(tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
      .select(explode(expr(gramExpr)).as("gram"))
    grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Per-document top-k terms by tf-idf. The idf factor is the ln-free
    * rational (N+1)/(df+1): monotone in the classic log form (log is
    * monotone), so top-k ranking is IDENTICAL, and the arithmetic —
    * integer counts combined with one double divide and one multiply —
    * is bit-reproducible across engines, where ln() is not.
    *
    * Scale shape: tf is a (doc, token) aggregation (shuffles one row per
    * distinct doc-term), df is a vocabulary-sized aggregation of THAT
    * (not the raw token stream), N broadcasts as a one-row frame, and the
    * final top-k window partitions by doc over tokens-per-doc-bounded
    * groups. No stage touches more than the distinct doc-term pairs. */
  /** @param broadcastVocab broadcast the document-frequency frame back
    *   onto the tf stream (default). Natural-language vocabularies grow
    *   sublinearly (Heaps' law) and usually fit the broadcast budget,
    *   but a junk-heavy token space at web scale can exceed it — pass
    *   false there and the attach becomes a tok-keyed shuffle join that
    *   reuses tf's existing exchange on neither side but never ships
    *   the vocabulary whole. */
  def tfIdfTopK(docs: DataFrame, k: Int = 3,
      broadcastVocab: Boolean = true): DataFrame = {
    // ONE fact-side exchange for the whole pipeline: repartitioning the
    // (tiny) docs table by doc_id up front makes every downstream doc-keyed
    // step exchange-free — HashPartitioning(doc_id) satisfies the
    // ClusteredDistribution of BOTH the (doc_id, tok) tf aggregation and
    // the final per-doc top-k window, so neither re-shuffles the exploded
    // doc-term stream. The vocabulary side (df) is an aggregate of the
    // already-reduced tf frame and (when broadcastVocab) broadcasts back;
    // its map side reuses the doc_id exchange. The rank<=k
    // filter plans as WindowGroupLimit: a bounded per-group heap during
    // the (local, exchange-free) window sort.
    val tf = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfSide = if (broadcastVocab) broadcast(df) else df
    val scored = tf.join(dfSide, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * ((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
        col("score"))
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones; the Lucene-style
    * non-negative idf variant): score every document containing at least
    * one query term with
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`,
    * `idf = ln((N − df + 0.5)/(df + 0.5) + 1)`, and return the global
    * top-k by score. Returns (doc_id, n_hit, score, rank).
    *
    * Shape at scale: the explode is filtered to the query terms BEFORE
    * the tf aggregation, so everything downstream of the scan is sized
    * by matching postings, not the corpus; doc length rides the explode
    * row (no second scan or join for dl); corpus totals are a broadcast
    * 1-row frame; per-term df is an aggregate of the already-tiny tf
    * frame. The global top-k is `orderBy(...).limit(k)` — Spark plans
    * `TakeOrderedAndProject`, a bounded per-partition heap + k·partitions
    * driver merge, never a global sort.
    *
    * Determinism: each (doc, term) partial score is one fixed expression
    * tree over exact integers (tf, df, N, dl, Σdl) rounded ONCE to a
    * scaled ×10⁶ int64 — per-doc sums are order-free integer math (same
    * contract as [[unigramCrossEntropy]]), and the ranking key is the
    * exact scaled sum with doc_id tie-break. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    val qTerms = terms.distinct
    val dl = size(tokens(col("text"))).cast("long")
    val tf = spread(docs)
      .select(col("doc_id"), dl.as("dl"),
        explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val tot = docs.agg(count(lit(1)).as("n_docs"), sum(dl).as("tot_tok"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val rdl = (col("dl") * col("n_docs")).cast("double") / col("tot_tok")
    val tfn = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * rdl))
    val scored = tf.join(broadcast(dfT), "tok").crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(idf * tfn * 1e6).cast("long").as("ps"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("ps")).as("sum_s"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sum_s").desc, col("doc_id"))
    scored.orderBy(col("sum_s").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("n_hit"),
        (col("sum_s").cast("double") / 1e6).as("score"), col("rank"))
  }

  /** Conjunctive (AND) term search: documents whose whitespace token set
    * contains EVERY query term. Returns (doc_id, source, n_chars).
    *
    * For a handful of ad-hoc terms the right plan at any scale is a
    * per-row predicate — `array_contains` over the tokenized text is a
    * stateless, codegen'd filter that runs inside the scan stage with NO
    * shuffle and no index build. A persisted inverted index (token →
    * posting list) only wins once the same corpus serves many queries;
    * that shape is `tfIdfTopK`/`bm25`'s exploded (doc_id, tok) frame
    * grouped by token, and composing it here would cost a corpus-wide
    * shuffle per query instead of a scan. */
  def termSearch(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "termSearch needs at least one term")
    val toks = tokens(col("text"))
    val pred = terms.map(t => array_contains(toks, t)).reduce(_ && _)
    docs.filter(pred).select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** Exact PHRASE search: documents containing the query tokens as a
    * contiguous run, with occurrence count and first position (1-based).
    * `termSearch` answers "has all the words"; this answers "has the
    * words in this order, adjacent" — the difference between matching
    * `hash … join` anywhere and matching the phrase `hash join`.
    *
    * Shape at scale: like [[termSearch]] this is deliberately NOT an
    * index lookup — all candidate positions are enumerated and verified
    * INSIDE the scan stage by one codegen'd higher-order-function chain
    * over the tokens array (`filter` over a position `sequence`, one
    * `element_at` conjunction per phrase token). Zero shuffle, zero row
    * blow-up (no explode — the position stream lives inside the array
    * expression), embarrassingly parallel. A positional inverted index
    * (token → (doc, pos) postings, adjacency equi-join per consecutive
    * term pair) wins only in the many-queries regime, same trade
    * documented on [[buildTermIndex]]. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phraseSearch needs at least two tokens")
    val n = phrase.length
    val toks = tokens(col("text"))
    val hits = filter(
      sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
      p => phrase.zipWithIndex.map { case (w, i) =>
        element_at(col("toks"), p + lit(i)) === lit(w)
      }.reduce(_ && _))
    docs.select(col("doc_id"), toks.as("toks"))
      // guard BEFORE positions are enumerated: sequence(1, hi) with
      // hi < 1 would generate a DESCENDING range, not an empty one
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), hits.as("hits"))
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"),
        size(col("hits")).cast("long").as("n_hits"),
        element_at(col("hits"), 1).cast("long").as("first_pos"))
  }

  /** Materialize the inverted index `termSearch`'s scaladoc points to
    * for the many-queries regime: distinct (tok, doc_id) postings as a
    * managed table BUCKETED AND SORTED BY tok. Each term lookup then
    * reads only its term's buckets (bucket pruning on the equality/IN
    * filter) instead of scanning the corpus — the one-time index build
    * pays the corpus-wide shuffle that per-query `termSearch` avoids.
    * Same bucketed-layout discipline as [[graft.silver.BucketedTables]]. */
  def buildTermIndex(docs: DataFrame, db: String, table: String,
      numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    // db goes into DDL text — same identifier guard as the other indexes
    require(db.matches("[A-Za-z0-9_]+") && table.matches("[A-Za-z0-9_]+"),
      s"term index names must match [A-Za-z0-9_]+: '$db'.'$table'")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .write
      .bucketBy(numBuckets, "tok")
      .sortBy("tok")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"$db.$table")
  }

  /** Conjunctive search against a [[buildTermIndex]] table: the pruned
    * posting lists of the query terms meet on doc_id (a doc matches iff
    * it carries ALL terms). The only shuffled data is the selected
    * postings — corpus size never enters the query. */
  def indexedTermSearch(spark: org.apache.spark.sql.SparkSession,
      db: String, table: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "indexedTermSearch needs at least one term")
    spark.table(s"$db.$table")
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("tok")).as("n_terms"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col("doc_id"))
  }

  /** Document fingerprinting: md5 of whitespace-normalized text plus a
    * position-weighted rolling hash (order-sensitive, exact int math). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("norm_fp"))
    val rolling = spread(docs)
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        ((col("pos") + 1) * (h32(col("tok")) % 1000003)).as("term"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % 2147483647L).as("rolling_hash"))
    norm.join(rolling, "doc_id")
  }

  /** CCNet-style LM quality score: cross-entropy of every document under
    * an add-k-smoothed unigram language model trained on the corpus
    * itself. Low cross-entropy = head-like fluent text, high = tail-like
    * noise — the standard perplexity-bucket filter of the CCNet / CC-100
    * pipelines, with the KenLM 5-gram model replaced by the unigram LM
    * that a SQL engine can train in one aggregation.
    *
    * Returns (doc_id, n_tok, sum_lp, xent): sum_lp is the exact scaled
    * (×10⁶) int64 sum of per-token log-probabilities; xent = −sum_lp /
    * (10⁶·n_tok) in nats. Filtering/bucketing composes downstream (e.g.
    * keep xent below a quantile from the percentile sketch).
    *
    * Determinism: each token's log-prob is rounded to an exact scaled
    * int64 ONCE (per distinct vocabulary token, not per occurrence), so
    * the per-doc sum is order-free integer math — no float-summation
    * hazard no matter how occurrences are partitioned; xent is one IEEE
    * division of exact values.
    *
    * Shape at scale: one tokenize pass; vocabulary counts and the
    * log-prob attach share the token-keyed exchange (same key — exchange
    * reuse, as in [[rarityStats]]); corpus totals are a broadcast 1-row
    * frame; the per-doc rollup is the only other shuffle. The vocabulary
    * never has to fit anywhere whole. */
  def unigramCrossEntropy(docs: DataFrame, addK: Double = 0.5): DataFrame = {
    val tk = spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vc = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = vc.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val lp = vc.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(log((col("c") + addK) / (col("n") + lit(addK) * col("v")))
          * 1e6).cast("long").as("lps"))
    tk.join(lp, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lps")).as("sum_lp"))
      .select(col("doc_id"), col("n_tok"), col("sum_lp"),
        (-(col("sum_lp").cast("double") / 1e6) / col("n_tok")).as("xent"))
  }

  /** Hashed bag-of-words text embedding (feature hashing / "hashing
    * trick", Weinberger et al. 2009, composed with a seeded signed
    * projection): token counts hash into `buckets` bins, and component
    * j is Σ_b count(b)·p(j,b) with the SAME md5-derived plane constants
    * the LSH/JL kernels use — a deterministic, model-free featurizer
    * that gives every document a fixed-dim integer vector any
    * downstream vector op (ANN, k-means, SemDeDup, hard negatives) can
    * consume when no learned embeddings exist. Exact integer math end
    * to end; one (vec-compatible) row per (doc_id, j).
    *
    * Shape at scale: one tokenize pass → (doc, bucket) counts
    * (map-side combined, ≤`buckets` keys per doc); the plane table
    * (buckets×outDim rows, constants) broadcasts onto it; the (doc, j)
    * rollup combines map-side. No corpus-sized join, no explode beyond
    * the bounded bucket×outDim fan. */
  def hashedEmbedding(docs: DataFrame, buckets: Int = 1024,
      outDim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val db = tokenized(docs)
      .groupBy(col("doc_id"), (h32(col("tok")) % buckets).as("b"))
      .agg(count(lit(1)).as("c"))
    val planes = spark.range(outDim).toDF("j")
      .crossJoin(spark.range(buckets).toDF("b"))
      .select(col("j"), col("b"),
        (h32(concat(col("j").cast("string"), lit(","),
          col("b").cast("string"))) % 2001L - 1000L).as("p"))
    db.join(broadcast(planes), "b")
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("c") * col("p")).as("v"))
  }

  /** Interpolated bigram-LM cross-entropy — the KenLM-flavored upgrade
    * of [[unigramCrossEntropy]]: per-bigram probability is
    * λ·P₂(w₂|w₁) + (1−λ)·P₁(w₂) with add-k smoothing on both levels, so
    * fluent (high-transition-probability) text scores LOW cross-entropy
    * and shuffled/junk text scores high even when its unigram profile
    * looks natural — exactly the signal the unigram model cannot see.
    *
    * Determinism contract as [[unigramCrossEntropy]]: each DISTINCT
    * bigram's log-prob is rounded to ×10⁶ int64 once (IEEE ops in a
    * fixed written order that the oracle mirrors token-for-token), and
    * per-doc sums are exact integer adds — order-free across partitions
    * and engines. Documents with fewer than two tokens have no bigram
    * distribution and are (documentedly) absent from the output.
    *
    * Shape at scale: bigram extraction is map-side (an adjacent-pair
    * transform over each doc's token array — no self-join, no window);
    * the bigram-type LM table is built by one (w1,w2)-keyed map-side-
    * combined aggregation plus two token-keyed attaches; corpus totals
    * are a broadcast 1-row frame; the per-doc rollup is the only other
    * corpus-keyed exchange. (A per-(doc,bigram) pre-collapse before the
    * LM attach was measured SLOWER at sf0.1 — within-doc bigram
    * multiplicities are ≈1 in natural text, so the collapse adds an
    * exchange without shrinking the stream.) */
  def bigramCrossEntropy(docs: DataFrame, addK: Double = 0.5,
      lambda: Double = 0.7): DataFrame = {
    val base = spread(docs).select(col("doc_id"), tokens(col("text")).as("a"))
    val bg = base.where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS w1, a[i] AS w2))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = base.select(explode(col("a")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("n"), count(lit(1)).as("v"))
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lp = big
      .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c1", "cw1"),
        "w1")
      .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c1", "cw2"),
        "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * (col("c2") + addK) /
            (col("cw1") + lit(addK) * col("v")) +
          lit(1.0 - lambda) * (col("cw2") + addK) /
            (col("n") + lit(addK) * col("v"))) * 1e6)
          .cast("long").as("lps"))
    bg.join(lp, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lps")).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp"),
        (-(col("sum_lp").cast("double") / 1e6) / col("n_bigrams")).as("xent"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-unigram features are under a TARGET
    * distribution (the rows matching `targetPred`, e.g. a trusted
    * high-quality source) than under the RAW corpus distribution.
    * log_w > 0 = target-like; resampling with probability ∝ exp(log_w)
    * shifts the corpus mixture toward the target domain.
    *
    * Features are hashed into `buckets` bins (h32 mod buckets — the
    * paper's hashed n-gram trick), so both LMs are fixed-size regardless
    * of corpus size. Returns (doc_id, n_tok, sum_dlp, log_w) with the
    * same scaled-int64 determinism contract as [[unigramCrossEntropy]]:
    * each bucket's log-ratio is rounded to ×10⁶ int64 once, per-doc sums
    * are exact.
    *
    * Shape at scale: one tokenize pass feeding a map-side-combined count
    * aggregation on ≤`buckets` keys; the two LMs and their log-ratio
    * table are a ≤`buckets`-row frame BROADCAST back onto the token
    * stream (scoring is map-side — no corpus-sized join shuffle); the
    * per-doc rollup is the only corpus-keyed exchange. */
  def dsirLogWeights(docs: DataFrame, targetPred: Column,
      buckets: Int = 8192, addK: Double = 0.5): DataFrame = {
    val tk = spread(docs)
      .select(col("doc_id"), targetPred.as("is_t"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("is_t"),
        (h32(col("tok")) % buckets).as("b"))
    val bc = tk.groupBy(col("b"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val tot = bc.agg(sum(col("c_raw")).as("n_raw"), sum(col("c_t")).as("n_t"))
    val denom = lit(addK * buckets)
    val lp = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        (round(log((col("c_t") + addK) / (col("n_t") + denom)) * 1e6)
            .cast("long")
          - round(log((col("c_raw") + addK) / (col("n_raw") + denom)) * 1e6)
            .cast("long")).as("dlps"))
    tk.join(broadcast(lp), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("dlps")).as("sum_dlp"))
      .select(col("doc_id"), col("n_tok"), col("sum_dlp"),
        (col("sum_dlp").cast("double") / 1e6).as("log_w"))
  }

  /** Per-document character-level Shannon entropy (bits/char) — the
    * classic gibberish / degenerate-repetition screen ("aaaa…" ≈ 0 bits,
    * base64 noise ≈ 6 bits, natural English ≈ 4–4.5 bits; C4/Gopher-style
    * pipelines cut both tails). Computed as log2(n) − Σ k·log2(k) / n over
    * the per-char counts so the only floating step is the final fold of
    * exact integer counts.
    *
    * Scale: counting is PURE per-document map work — one typed pass per
    * partition, a bounded (≤ ~distinct-chars) count table per doc, no
    * exploded per-character rows and no shuffle at all before the final
    * per-doc frame (the same imperative-pass pattern as
    * [[graft.ops.DedupOps.shingleSets]]). The declarative
    * explode+groupBy form shuffles nothing either but materializes one
    * row per CHARACTER through codegen — measured 2.5× DuckDB at sf0.1;
    * this pass is the map-side-combine it was simulating.
    *
    * Characters are Unicode CODE POINTS (`codePointAt` walks surrogate
    * pairs), so emoji / astral CJK count once — matching RE2-based
    * engines — not twice as UTF-16 units. Empty-text (and null-text)
    * docs are excluded: entropy is undefined over zero characters, and
    * both this and the oracle SQL drop them explicitly. */
  /** fastText-style hashed linear classifier — the APPLY step of the
    * quality-filter models real pipelines train offline (CCNet's fastText
    * LM filter, the LLaMA "looks-like-Wikipedia" classifier): features
    * are unigram + adjacent-bigram tokens hashed into `dBuckets` buckets,
    * the model is a `weights(bucket, w)` table of integer milli-weights,
    * and a document's score is the mean feature weight.
    *
    * Exactness: bucket ids are md5-derived ([[graft.queries.Q.h32]] mod
    * `dBuckets` — non-negative, so `%` agrees across engines), the score
    * numerator is an exact int64 sum of milli-weights, and the only
    * floating step is one final IEEE division — bit-identical across
    * engines, partitionings and retries.
    *
    * Scale: the model is `dBuckets` rows — broadcast, never shuffled
    * (that is the point of the hashing trick: the feature space is fixed
    * no matter the corpus). Per document the plan is explode → hash →
    * broadcast-join → one doc-keyed hash aggregation with map-side
    * combine; the shuffle carries one partial (count, sum) pair per
    * document, never tokens. At 100 TB this is scan-bound.
    *
    * Reference intent: serverless_data_lake curates LLM training corpora
    * (SURVEY §1); a trained-model quality gate is the standard companion
    * to its heuristic filters (`quality`, above). */
  def hashedClassifierScore(docs: DataFrame, weights: DataFrame,
      dBuckets: Int = 4096): DataFrame = {
    val toks = tokens(col("text"))
    // zip_with over two shifted slices: empty (not descending-sequence
    // garbage) for 1-token docs
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val feats = spread(docs)
      .select(col("doc_id"), explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"), (h32(concat(lit("f#"), col("f"))) % dBuckets)
        .as("bucket"))
    feats.join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_milli"))
      .select(col("doc_id"), col("n_feats"), col("score_milli"),
        (col("score_milli").cast("double") /
          (col("n_feats").cast("double") * 1000.0)).as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** Deterministic stand-in model for [[hashedClassifierScore]]: one
    * integer milli-weight in [-1000, 1000] per bucket, md5-derived so
    * any engine regenerates it bit-identically (a real deployment loads
    * trained weights from a table instead — same shape, same plan). */
  def demoClassifierWeights(spark: org.apache.spark.sql.SparkSession,
      dBuckets: Int = 4096): DataFrame =
    spark.range(dBuckets).toDF("bucket")
      .select(col("bucket"),
        (h32(concat(lit("qw#"), col("bucket").cast("string"))) % 2001 - 1000)
          .as("w"))

  def charEntropy(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // no spread: a pure map pass parallelizes with the scan's file
    // splits (sized by maxPartitionBytes); an exchange here would add a
    // stage wave carrying the full text for nothing
    docs
      .where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val counts = new java.util.HashMap[Integer, Long]()
          var i = 0
          var n = 0L
          while (i < text.length) {
            val cp = text.codePointAt(i)
            counts.merge(cp, 1L, (a, b) => a + b)
            i += Character.charCount(cp)
            n += 1L
          }
          var sk = 0.0
          val it = counts.values().iterator()
          while (it.hasNext) {
            val k = it.next().toDouble
            sk += k * (math.log(k) / math.log(2.0))
          }
          (id, n, counts.size.toLong, sk)
        }
      }
      .toDF("doc_id", "n_chars", "n_distinct_chars", "sk")
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        round(log(2.0, col("n_chars")) - col("sk") / col("n_chars"), 6)
          .as("entropy"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every `k`-char gram, slide
    * a window of `w` consecutive gram hashes, select each window's
    * MINIMUM hash; the distinct selected values are the document's
    * fingerprint set. Guarantees (the paper's winnowing property): any
    * shared substring of length ≥ k + w − 1 contributes at least one
    * SHARED selected fingerprint, while only ~2/(w+1) of all gram
    * hashes are retained — a density-vs-guarantee dial that plain
    * min-hashing doesn't offer.
    *
    * Returns (doc_id, fp) — one row per distinct selected fingerprint.
    *
    * Shape at scale: the gram hashing AND the sliding-window minima are
    * computed per row in ONE imperative map-side pass
    * ([[winnowFpsOf]], the [[graft.ops.DedupOps]] signature-kernel
    * mapPartitions pattern) — the whole selection is map-side, the only
    * distributed row expansion is the final explode of the (already
    * ~w-fold winnowed) fingerprint set. No shuffle until a consumer
    * aggregates. (The earlier declarative form — `transform`/`slice`/
    * `array_min` lambdas over md5-hex `conv` grams — evaluated every
    * lambda interpreted and allocated a hex string per position; the
    * kernel was measured 9.3× faster on the gram pass at sf0.1 and is
    * bit-identical, OpsSpec pins the equivalence.) */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4)
      : DataFrame = {
    require(k >= 1 && w >= 1, "gram size k and window w must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs)
      .where(col("text").isNotNull && length(col("text")) >= k)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) => (id, winnowFpsOf(text, k, w, md)) }
      }
      .toDF("doc_id", "fps")
      .select(col("doc_id"), explode(col("fps")).as("fp"))
  }

  /** Imperative winnowing kernel for ONE document: gram hashes (md5
    * prefix-32, the engine's portable content hash — one digest per
    * position on a task-reused MessageDigest, no intermediate hex
    * string), per-window minima, distinct. Bit-identical to the
    * declarative form `array_distinct(flatten(transform(..,
    * array_min(slice(..)))))` over
    * `conv(substring(md5(substring(text,p,k)),1,8),16,10)` grams —
    * which evaluates those lambdas INTERPRETED and allocates a 32-char
    * hex string plus a conv parse per position (ProfileWinnow at sf0.1:
    * gram pass 3.76 s declarative → 0.40 s kernel, and it was 67% of
    * q165; the [[graft.ops.DedupOps]] signature kernels set the
    * mapPartitions precedent). Shingles use code-unit substrings
    * (= SQL substring for the ASCII corpus; see TESTDATA.md). */
  private[graft] def winnowFpsOf(text: String, k: Int, w: Int,
      md: java.security.MessageDigest): Array[Long] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val n = math.max(text.length - (k - 1), 1)
    val hs = new Array[Long](n)
    var p = 0
    while (p < n) {
      md.reset()
      val d = md.digest(
        text.substring(p, math.min(p + k, text.length)).getBytes(utf8))
      hs(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    val m = math.max(n - (w - 1), 1)
    val fps = new Array[Long](m)
    var j = 0
    while (j < m) {
      var mn = hs(j)
      var t = j + 1
      val end = math.min(j + w, n)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      fps(j) = mn
      j += 1
    }
    // distinct via sort + unique (order is irrelevant downstream: every
    // consumer aggregates; no boxing, unlike a HashSet)
    java.util.Arrays.sort(fps)
    var out = 0
    var i = 1
    while (i < m) {
      if (fps(i) != fps(out)) { out += 1; fps(out) = fps(i) }
      i += 1
    }
    java.util.Arrays.copyOf(fps, out + 1)
  }

  /** Per-document DISTINCT word n-gram shingle sets, fingerprinted to
    * int64 with Spark's own xxhash64 — the set representation q142's
    * set-similarity join consumes, computed in ONE imperative
    * mapPartitions pass (the [[winnowFingerprints]] kernel precedent).
    *
    * Bit-identical to the declarative form
    * `array_distinct(transform(zip_with(zip_with(slice(w,1,…),
    * slice(w,2,…), concat), slice(w,3,…), concat), s -> xxhash64(s)))`
    * over `split(trim(text), "\s+")` tokens: tokenization replicates
    * Spark's space-only `trim` + keep-trailing-empties split, the
    * joined shingle bytes are token bytes separated by single spaces,
    * and the hash is catalyst's XXH64 with the xxhash64 expression's
    * seed (42) — pinned by an OpsSpec equivalence test. The declarative
    * chain evaluated its lambdas INTERPRETED and allocated a shingle
    * String per position; the kernel hashes through one reused byte
    * buffer. Distinct via sort+unique: downstream consumers aggregate
    * or rebuild canonically-sorted lists, so element order is free.
    *
    * Returns (doc_id, tk: array&lt;long&gt;); null text stays null
    * (downstream explode drops both null and empty identically). */
  def hashedWordNgramSets(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1; got $n")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, text) =>
        (id, ngramXxhashOf(text, n))
      })
      .toDF("doc_id", "tk")
  }

  /** Imperative kernel for ONE document of [[hashedWordNgramSets]]:
    * space-only trim (Spark's `trim`), Java-regex `\s+` split with
    * trailing empties kept (Spark's `split` limit −1), n-token shingles
    * joined by single spaces, XXH64(seed 42) over the UTF-8 bytes via a
    * task-reused buffer, sort+unique distinct. */
  private[graft] def ngramXxhashOf(text: String, n: Int): Array[Long] = {
    if (text == null) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    var s0 = 0
    var e0 = text.length
    while (s0 < e0 && text.charAt(s0) == ' ') s0 += 1
    while (e0 > s0 && text.charAt(e0 - 1) == ' ') e0 -= 1
    val toks = text.substring(s0, e0).split("\\s+", -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return Array.emptyLongArray
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) { tb(i) = toks(i).getBytes(utf8); i += 1 }
    var buf = new Array[Byte](64)
    val out = new Array[Long](m)
    var p = 0
    while (p < m) {
      var len = n - 1
      var j = 0
      while (j < n) { len += tb(p + j).length; j += 1 }
      if (buf.length < len)
        buf = new Array[Byte](math.max(len, buf.length * 2))
      var o = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(o) = ' '; o += 1 }
        val t = tb(p + j)
        System.arraycopy(t, 0, buf, o, t.length)
        o += t.length
        j += 1
      }
      out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          len, 42L)
      p += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var q = 1
    while (q < m) {
      if (out(q) != out(w)) { w += 1; out(w) = out(q) }
      q += 1
    }
    java.util.Arrays.copyOf(out, w + 1)
  }

  /** Plagiarism/overlap candidate pairs from shared winnowing
    * fingerprints: documents sharing ≥ `minShared` selected fingerprints
    * (each of document frequency ≤ `dfCap`).
    *
    * Returns (a, b, n_shared), a < b.
    *
    * Shape at scale: the pair fan-out is fingerprint-keyed — candidates
    * scale with Σ df², never corpus². `dfCap` bounds the per-fingerprint
    * fan-out exactly like a stop-gram list (MOSS drops
    * ubiquitous fingerprints for the same reason): a fingerprint shared
    * by half the corpus is boilerplate, not evidence of copying, and
    * dropping it caps the skew at dfCap² rows per key.
    *
    * The df count is map-side combined (O(1) buffer per hot key) and
    * the join-back is pinned `shuffle_hash` (the [[graft.ops.DedupOps]]
    * spansOfGrams rationale: AQE can skew-split it, and the keep set
    * outgrows any broadcast at corpus scale — a broadcast plan would
    * also leave the postings round-robin-partitioned and force a THIRD
    * full-volume exchange for the group-by below). Pairs are then
    * expanded MAP-SIDE from each fingerprint's sorted member list (the
    * pairsFromBands pattern) riding the join's fp-partitioning — one
    * exchange and one postings side less than the former
    * posts⋈posts self-join. r15 second cut: the df filter and the
    * member list collapse into ONE aggregation via the df-capped
    * [[graft.functions.MinKLongs]] typed Aggregator (state ≤ dfCap+1
    * longs per key, so a corpus-hot boilerplate fingerprint costs a
    * 65-long buffer, never a corpus-length list — the skew guarantee
    * the df-filter-then-join shape existed to provide). A kept key
    * (2 ≤ df ≤ dfCap) is under the cap, so its member list is COMPLETE
    * and sorted — pair expansion is unchanged; an over-cap key shows
    * exactly dfCap+1 members and the size filter drops it, which is the
    * old `df <= dfCap` test verbatim. One gram pass + 2 exchanges
    * (fp, pair), down from 2 passes + 3 exchanges + the join.
    *
    * Precondition (r15, with the MinKLongs fusion): `dfCap` must be in
    * [2, Int.MaxValue) — the capped aggregator needs a positive int
    * buffer bound, where the pre-fusion shape silently returned an
    * empty frame for dfCap < 2. No current caller passes such a value;
    * the `require` below makes the new contract explicit. */
  def winnowPairs(docs: DataFrame, k: Int = 8, w: Int = 4,
      minShared: Long = 2L, dfCap: Long = 64L): DataFrame = {
    require(dfCap >= 2 && dfCap < Int.MaxValue, s"dfCap out of range: $dfCap")
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    import spark.implicits._
    val mink = udaf(new graft.functions.MinKLongs(dfCap.toInt + 1),
      Encoders.scalaLong)
    // pair expansion as a typed flatMap (r16): the declarative
    // flatten(transform(.., transform(slice(..), struct)))  evaluates
    // its higher-order lambdas INTERPRETED, allocating a struct per
    // pair and an array per member — the same class of cost the r15
    // winnow/trigram kernels removed upstream. The kernel emits the
    // identical i<j pairs from each kept fingerprint's sorted member
    // list through the codegen'd tuple encoder.
    winnowFingerprints(docs, k, w)
      .groupBy(col("fp"))
      .agg(mink(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= dfCap)
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val n = ids.size
        new Iterator[(Long, Long)] {
          private var i = 0
          private var j = 1
          def hasNext: Boolean = i < n - 1
          def next(): (Long, Long) = {
            val p = (ids(i), ids(j))
            j += 1
            if (j >= n) { i += 1; j = i + 1 }
            p
          }
        }
      }
      .toDF("a", "b")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Top adjacent-bigram collocations by pointwise mutual information:
    * PMI(a,b) = ln( c_ab·N / (c_a·_·c_·b) ) over exact integer bigram
    * counts, with first-slot/second-slot marginals derived from the
    * SAME bigram count frame (one aggregation feeds all three
    * factors). High-PMI pairs are collocations ("new york"); raw
    * frequency top-k (the [[topNgrams]] face) surfaces stopword pairs
    * instead — PMI is the standard collocation fix. `minCount` guards
    * the classic PMI low-count pathology (a 1-occurrence pair of two
    * hapaxes maxes the score).
    *
    * Determinism: PMI's argument is a RATIONAL of exact int64 counts —
    * one IEEE division chain + one ln, rounded once to ×10⁶ (the q122
    * contract); ranking ties break (a, b) ascending.
    *
    * Shape at scale: bigram counts shuffle once (map-side combined);
    * marginals re-aggregate that reduced frame twice and attach by
    * broadcast-or-shuffle joins on its own keys; the global top-k plans
    * as TakeOrderedAndProject. */
  def pmiBigrams(docs: DataFrame, k: Int = 25, minCount: Long = 5L)
      : DataFrame = {
    val pairs = spread(docs)
      .select(tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> struct(element_at(w, i) AS a,
                         element_at(w, i + 1) AS b))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cab"))
    val tot = pairs.agg(sum(col("cab")).as("nb"))
    val ma = pairs.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val mb = pairs.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    pairs.filter(col("cab") >= minCount)
      .join(ma, "a")
      .join(mb, "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("cab"),
        (round(log(col("cab").cast("double") * col("nb")
          / (col("ca").cast("double") * col("cb"))) * 1e6)
          .cast("long").cast("double") / 1e6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Pairwise source VOCABULARY overlap — exact Jaccard and overlap
    * coefficient between the distinct-token sets of every source pair:
    * the set-based complement of [[sourceDivergence]] (which compares
    * the distributions over a shared vocabulary; this measures how
    * shared the vocabulary itself is — containment shows up in the
    * overlap coefficient long before Jaccard moves).
    *
    * Returns (source_a, source_b, va, vb, inter, jaccard,
    * overlap_coef) for pairs with ≥ 1 shared token, a < b.
    *
    * Shape at scale: one (source, token) presence-dedup shuffle; each
    * token's source set collapses to ONE row whose pairs fan out
    * MAP-SIDE into the combining intersection count (≤ S²/2 per token,
    * S bounded) — the q169 fan-out pattern; vocab sizes ride a
    * broadcast join. The token stream is shuffled once. */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    val tk = tokenized(docs, idCol = "source")
      .select(col("source").cast("string").as("source"), col("tok"))
      .distinct()
    val sizes = tk.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val inter = tk.groupBy(col("tok"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(expr(
        """flatten(transform(ss, (x, i) ->
             transform(slice(ss, i + 2, size(ss)),
                       y -> struct(x AS sa, y AS sb))))""")).as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("nv").as("va"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("nv").as("vb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("va"), col("vb"),
        col("inter"),
        round(col("inter").cast("double")
          / (col("va") + col("vb") - col("inter")), 6).as("jaccard"),
        round(col("inter").cast("double")
          / least(col("va"), col("vb")), 6).as("overlap_coef"))
  }

  /** Pairwise source-distribution divergence: add-k-smoothed KL and
    * Jensen–Shannon divergence between every ordered pair of sources'
    * unigram token distributions — the corpus-comparison report that
    * decides which sources are interchangeable and which shift the
    * mixture (the distributional face of the q159 duplication matrix).
    *
    * p_s(t) = (c_s(t) + k) / (N_s + k·V) over the GLOBAL vocabulary V,
    * so zero-count tokens carry smoothed mass. Returns one row per
    * ordered source pair: (source_a, source_b, kl, js) in nats.
    *
    * Determinism (the q122 contract): every per-token contribution is
    * rounded ONCE to a scaled (×10⁶) int64, so the cross-engine result
    * is exact integer summation + one IEEE division.
    *
    * Shape at scale: one token-keyed count aggregation pivots to an
    * S-column frame (S = #sources, a bounded catalog dimension — the
    * only driver-side collects are the source list and the totals row),
    * then each sparse row fans out MAP-SIDE against the broadcast
    * S(S−1)-row pair frame straight into a combining aggregation: the
    * expanded (token, pair) rows never hit the wire — partial
    * aggregation reduces them to S(S−1) groups per partition, so the
    * pair shuffle carries S² × partitions rows regardless of
    * vocabulary size. (A first cut computed all S(S−1) pair terms as
    * one wide projection per row instead — 760 aggregate columns —
    * and the giant expression tree cost 6.6 s on 31 cached rows;
    * row-wise fan-out with ONE small codegen'd term expression is 20×
    * faster and S-scalable.) */
  def sourceDivergence(docs: DataFrame, addK: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tk = tokenized(docs, idCol = "source")
      .select(col("source").cast("string").as("source"), col("tok"))
    // persisted: the (source, tok) counts feed four consumers (source
    // list, totals, vocab size, pivot) — without the cache each one
    // re-tokenizes the whole corpus
    val counts = tk.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sources = counts.select(col("source"))
        .distinct().as[String].collect().sorted.toSeq
      require(sources.size >= 2, "sourceDivergence needs >= 2 sources")
      val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
        .as[(String, Long)].collect().toMap
      val vocabV = counts.select(col("tok")).distinct().count()
      // token × S sparse matrix folded to ONE map column per token
      val mat = counts.groupBy(col("tok")).pivot("source", sources).sum("c")
        .select(col("tok"), map_from_arrays(
          array(sources.map(lit(_)): _*),
          array(sources.map(s => coalesce(col(s"`$s`"), lit(0L))): _*))
          .as("cm"))
      // smoothed denominators per source as a literal map: the double
      // (N_s + k·V) is computed once here, exactly as the oracle's SQL
      // double arithmetic computes it
      val denom = map_from_arrays(
        array(sources.map(lit(_)): _*),
        array(sources.map(s => lit(totals(s) + addK * vocabV)): _*))
      val pairsDf =
        (for { a <- sources; b <- sources if a != b } yield (a, b))
          .toDF("source_a", "source_b")
      val ca = element_at(col("cm"), col("source_a")).cast("double")
      val cb = element_at(col("cm"), col("source_b")).cast("double")
      val pa = (ca + addK) / element_at(denom, col("source_a"))
      val pb = (cb + addK) / element_at(denom, col("source_b"))
      val lpa = log(pa)
      val lpb = log(pb)
      val lpm = log((pa + pb) / 2.0)
      val klT = round(pa * (lpa - lpb) * 1e6).cast("long")
      val jsT = round((pa * (lpa - lpm) + pb * (lpb - lpm)) / 2.0 * 1e6)
        .cast("long")
      // the result is S(S−1) rows — collect it INSIDE the cached scope
      // (the final aggregation is the heaviest consumer of `counts`;
      // returning it lazily would re-tokenize the corpus uncached after
      // the finally-unpersist) and hand back a local-backed frame
      val result = mat.crossJoin(broadcast(pairsDf))
        .select(col("source_a"), col("source_b"),
          klT.as("klt"), jsT.as("jst"))
        .groupBy(col("source_a"), col("source_b"))
        .agg((sum(col("klt")).cast("double") / 1e6).as("kl"),
          (sum(col("jst")).cast("double") / 1e6).as("js"))
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getDouble(2), r.getDouble(3)))
        .toSeq
      result.toDF("source_a", "source_b", "kl", "js")
    } finally counts.unpersist()
  }
}
