package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q.{h32, tokens}

/** Dataset-curation operators for training-data pipelines: deterministic
  * sampling, repetition/boilerplate scoring, identifier masking, sequence
  * packing and benchmark-contamination checks.
  *
  * Scale design (100 TB):
  *  - sampling and masking are stateless per-row filters/projections — no
  *    shuffle, fully pushdown-friendly;
  *  - repetition stats shuffle (doc_id, token) partials once, with
  *    map-side combine, then reduce per doc;
  *  - sequence packing needs a GLOBAL running total — implemented as the
  *    two-phase cumulative sum (per-partition subtotals → tiny driver
  *    prefix scan → broadcast offsets), never a single-partition window;
  *  - contamination broadcasts the (small) benchmark shingle set and
  *    semi-joins the corpus against it — the corpus never shuffles.
  *
  * All hashes are md5-derived (h32) so results match the DuckDB oracle
  * bit-for-bit.
  */
object Curation {

  /** Deterministic hash-bucket membership: stable across runs, engines and
    * partitionings (unlike rand()-based .sample). Keep a row iff
    * h32(key) % 100 < pct. */
  def sampleBucket(key: Column, pct: Int): Column =
    h32(key.cast("string")) % 100 < pct

  /** Deterministic train/val/test assignment from the same hash-bucket
    * machinery: bucket < testPct → "test", < testPct+valPct → "val",
    * else "train". Stable across runs, engines, partitionings and
    * incremental re-runs — a document never migrates between splits when
    * new data arrives, which rand()-based splitting cannot guarantee. */
  def splitAssign(key: Column, valPct: Int = 20, testPct: Int = 10): Column = {
    val b = h32(key.cast("string")) % 100
    when(b < testPct, "test")
      .when(b < testPct + valPct, "val")
      .otherwise("train")
  }

  /** Split accounting per stratum: (stratum, split, n_docs, n_chars).
    * One small-cardinality aggregation over the corpus. */
  def splitCounts(df: DataFrame, stratum: Column, key: Column,
      sizeCol: Column, valPct: Int = 20, testPct: Int = 10): DataFrame =
    df.groupBy(stratum.as("stratum"),
        splitAssign(key, valPct, testPct).as("split"))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).as("n_chars"))

  /** Leakage-free train/val/test split: assign splits by NEAR-DUP
    * CLUSTER, not by document — the fix for the cross-split
    * contamination that q128 measures. Whole duplicate families land in
    * one split (the split key is the cluster's min doc_id from
    * [[graft.ops.DedupOps.duplicateClusters]]), so no near-identical
    * text straddles the train/eval boundary — the Pile/FineWeb-style
    * decontaminated split. Deterministic: same hash-bucket machinery as
    * [[splitAssign]], keyed by cluster id, stable under re-runs and
    * incremental arrival of MORE members of an existing cluster.
    *
    * Returns (doc_id, cluster_id, split).
    *
    * Shape at scale: the cluster computation is the q66 engine
    * (banded candidates → verified edges → adaptive connected
    * components); the split itself is one map-side hash on the joined
    * label — no extra shuffle beyond the label attach. */
  def leakageFreeSplit(docs: DataFrame, valPct: Int = 20,
      testPct: Int = 10): DataFrame =
    // duplicateClusters already emits exactly one row per input doc
    // (singletons included) — no join back onto docs needed, the split
    // is one map-side hash on the cluster label
    graft.ops.DedupOps.duplicateClusters(docs)
      .select(col("doc_id"), col("cluster_id"),
        splitAssign(col("cluster_id"), valPct, testPct).as("split"))

  /** Per-stratum sampling accounting at `pct`%: (stratum, n_total,
    * n_sampled, rate). One small-cardinality aggregation, no extra pass
    * over the sampled subset. */
  def stratifiedSampleCounts(df: DataFrame, stratum: Column, key: Column,
      pct: Int = 10): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(sampleBucket(key, pct), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("rate",
        col("n_sampled").cast("double") / col("n_total"))

  /** Gopher-style repetition signals per document: token count, distinct
    * token count, duplicate-token ratio and most-frequent-token fraction.
    * High dup_ratio / top_frac marks boilerplate and degenerate text. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val perTok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
          .as("dup_ratio"),
        (col("max_c").cast("double") / col("n_tokens")).as("top_frac"))
  }

  /** Gopher-style duplicated-N-GRAM repetition metrics (Rae et al. 2021
    * App. A1.2 — the n-gram complement of [[repetitionStats]]'s unigram
    * signals): per document, the fraction of characters inside token
    * n-grams that repeat WITHIN the doc, and the fraction inside the
    * single most frequent n-gram. Character mass is counted per
    * occurrence (c·len(gram), the standard implementation — overlapping
    * coverage is NOT deduplicated; exact positional coverage is what
    * [[graft.ops.DedupOps.duplicateSpans]] computes when spans matter),
    * normalized by the doc's trimmed character count.
    *
    * Shape at scale: n-grams assemble map-side from each doc's token
    * array (slice + concat_ws — no self-join); the only corpus-keyed
    * exchanges are the (doc, gram) count and the doc rollup, both
    * map-side combined. Ratios are IEEE divisions of exact integer
    * sums; the top gram ties break on the gram string ascending. */
  def ngramRepetition(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 2, "use repetitionStats for unigram signals")
    val grams = docs
      .select(col("doc_id"), length(trim(col("text"))).as("total_chars"),
        tokens(col("text")).as("a"))
      .where(size(col("a")) >= n)
      .select(col("doc_id"), col("total_chars"),
        explode(expr(s"transform(sequence(1, size(a) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(a, i, $n)))")).as("gram"))
    val perGram = grams
      .groupBy(col("doc_id"), col("total_chars"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("total_chars"), col("c"),
        (col("c") * length(col("gram"))).as("mass"))
    perGram.groupBy(col("doc_id"))
      .agg(first(col("total_chars")).as("total_chars"),
        sum(when(col("c") >= 2, col("mass")).otherwise(0L)).as("dup_mass"),
        max(col("mass")).as("top_mass"))
      .select(col("doc_id"),
        (col("dup_mass").cast("double") / col("total_chars"))
          .as("dup_ngram_char_frac"),
        (col("top_mass").cast("double") / col("total_chars"))
          .as("top_ngram_char_frac"))
  }

  /** Mask long digit runs (≥ minRun) — account numbers, row ids, phone
    * numbers — with a fixed placeholder. Pattern is RE2-safe so the same
    * regex runs in Spark (Java regex) and DuckDB (RE2). */
  def maskIds(c: Column, minRun: Int = 6, replacement: String = "[ID]"): Column =
    regexp_replace(c, s"[0-9]{$minRun,}", replacement)

  /** Number of masked runs in a value (audit column for maskIds). */
  def maskedRunCount(c: Column, minRun: Int = 6): Column =
    size(regexp_extract_all(c, lit(s"[0-9]{$minRun,}"), lit(0)))

  /** Bloom-prefiltered benchmark-contamination check — the 100 TB shape
    * of [[contamination]]: build ONE Bloom filter over the benchmark
    * side's distinct shingles (benchmark suites are small by definition;
    * the filter is `numBits/8` bytes however many docs they hold), inline
    * it as a foldable binary so the probe folds into the corpus scan, and
    * only bloom-surviving shingles — true positives plus the sized
    * false-positive rate — reach the exact verification join. The corpus
    * shingle stream is filtered at scan width with NO shuffle before the
    * (already tiny) broadcast join.
    *
    * Correctness anchor: Bloom filters have NO false negatives, so the
    * output is IDENTICAL to the exact [[contamination]] — the oracle that
    * hash-checks the exact form verifies the bloom path end-to-end (a
    * dropped true positive would change the result).
    *
    * EAGER: unlike the engine's other DataFrame-returning operators, this
    * one runs Spark jobs at construction time — the benchmark shingle
    * frame is persisted and the filter build collects its one sketch row
    * (`buildFilter`'s head()) before the returned frame is ever executed.
    * A caller that builds but never runs the result still pays the
    * benchmark-side scan; the benchmark persist's lifecycle is the
    * caller's, as with the engine's other internal persists. An EMPTY
    * benchmark side returns an explicitly empty (doc_id, n_shared) frame
    * (BloomFilterAggregate over zero rows yields a null sketch, which
    * must not reach might_contain as Literal(null)). */
  def bloomContamination(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8, threshold: Long = 1L,
      numBits: Long = 1L << 22): DataFrame = {
    // benchmark shingles are materialized once (persist) — the filter
    // build and the exact-verify join read the same tiny frame
    // (benchmark-suite-bounded; cache lifecycle is the caller's, as with
    // the engine's other internal persists)
    val benchSh = DedupOps.charShingles(benchmark, n)
      .select(col("s")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filter = graft.functions.Bloom.buildFilter(
      benchSh, col("s"), expectedItems = numBits / 16, numBits = numBits)
    if (filter == null) {
      // zero benchmark shingles: nothing can be contaminated — return the
      // empty result explicitly instead of letting Literal(null) propagate
      // through might_contain by accident
      benchSh.unpersist()
      return corpus.select(col("doc_id")).limit(0)
        .select(col("doc_id"), lit(0L).as("n_shared"))
    }
    // probe the RAW shingle stream: the Bloom reject happens map-side at
    // scan width, so only probable-positive shingles pay the per-doc
    // dedup shuffle and the exact join — the order that makes the
    // operator scale (a post-distinct probe would shuffle the whole
    // corpus shingle stream first)
    DedupOps.charShinglesRaw(corpus, n)
      .filter(graft.functions.Bloom.mightContain(filter, col("s")))
      .distinct()
      .join(broadcast(benchSh), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= threshold)
  }

  /** Filter-cascade attrition accounting (the curation funnel every
    * corpus build reads before shipping): given ordered named stage
    * predicates, report per stage how many documents entered, were
    * removed, and survived — survivors of stage i = rows passing ALL
    * predicates 1..i, the way a real cascade short-circuits.
    *
    * Scale: every predicate is evaluated in ONE pass over the corpus
    * (flags as columns, cumulative conjunctions as parallel conditional
    * sums in a single aggregation); the per-stage rows are unpivoted
    * from that one aggregate row with `stack` — nothing but the
    * O(stages) result ever leaves the aggregation. Predicates may be
    * join-derived flags (e.g. a dedup-loser column attached upstream);
    * the funnel itself never adds a shuffle beyond the final global
    * aggregate. */
  /** Streaming-safe contamination guard: flag each document whose
    * char-n-gram shingles MIGHT hit a benchmark Bloom filter (built once
    * from the benchmark suite via [[graft.functions.Bloom.buildFilter]])
    * — the per-ROW, stateless admission face of [[bloomContamination]].
    * `maybe_contaminated = false` is SAFE to admit immediately (Bloom
    * has no false negatives); `true` rows go to the exact verification
    * join (the batch operator) — at a live ingest edge that means the
    * clean ~everything flows through with zero state and zero shuffle,
    * and only the sliver pays verification. Runs identically in batch
    * and Structured Streaming (pure row expression: shingle transform +
    * exists-probe — StreamingSpec proves the stream face). */
  def bloomGuard(docs: DataFrame, filter: Array[Byte],
      textCol: String = "text", n: Int = 8): DataFrame = {
    val sh = expr(s"transform(sequence(1, greatest(length($textCol) - " +
      s"${n - 1}, 1)), i -> substring($textCol, i, $n))")
    docs.withColumn("maybe_contaminated",
      exists(sh, s => graft.functions.Bloom.mightContain(filter, s)))
  }

  def filterFunnel(df: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "filterFunnel needs at least one stage")
    val flagged = df.select(stages.zipWithIndex.map {
      case ((_, c), i) => c.cast("boolean").as(s"_f$i")
    }: _*)
    val cums = stages.indices.map { i =>
      sum(when(stages.indices.take(i + 1).map(j => col(s"_f$j"))
        .reduce(_ && _), 1L).otherwise(0L)).as(s"_n$i")
    }
    val row = flagged.agg(count(lit(1)).as("_total"), cums: _*)
    val stackArgs = stages.zipWithIndex.map { case ((name, _), i) =>
      val nIn = if (i == 0) "_total" else s"_n${i - 1}"
      s"${i + 1}L, '${name.replace("'", "''")}', $nIn, _n$i"
    }.mkString(", ")
    row.select(expr(
        s"stack(${stages.size}, $stackArgs) AS (stage_idx, stage, n_in, n_out)"))
      .select(col("stage_idx"), col("stage"), col("n_in"),
        (col("n_in") - col("n_out")).as("n_removed"), col("n_out"))
  }

  /** Per-document rejection attribution: the row-level complement of
    * [[filterFunnel]]'s counts. Labels every document with the FIRST
    * stage that rejects it (cascade order, same semantics as the
    * funnel: a doc failing stages 2 and 4 is charged to stage 2) or
    * `kept` if it survives the whole cascade — the quarantine/audit
    * frame a curation run writes next to its survivors so every drop is
    * explainable.
    *
    * Shape at scale: one `coalesce(when(!s1)…, when(!s2)…, 'kept')` per
    * row — pure codegen'd map work inside the scan, no shuffle, no
    * per-stage jobs; stage predicates are evaluated once each. */
  def rejectionAttribution(df: DataFrame, keyCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "rejectionAttribution needs at least one stage")
    val verdict = coalesce(
      (stages.zipWithIndex.map { case ((name, c), i) =>
        when(!c.cast("boolean") || c.isNull, struct(
          lit(i + 1).cast("long").as("stage_idx"), lit(name).as("verdict")))
      } :+ struct(lit(0L).as("stage_idx"), lit("kept").as("verdict"))): _*)
    df.select(col(keyCol), verdict.as("v"))
      .select(col(keyCol), col("v.stage_idx").as("stage_idx"),
        col("v.verdict").as("verdict"))
  }

  /** Sliding-window document chunking with overlap (RAG / context-window
    * prep): token windows of `size` starting every `stride` tokens, the
    * last window short if the document ends mid-window. Returns one row
    * per (doc, chunk): (doc_id, chunk_id, start, chunk_len, chunk_text)
    * with `start` 1-based and `chunk_id = (start−1)/stride + 1`.
    *
    * Scale: pure per-row map work — tokenize once (one precompiled
    * regex per task), fan each document out to ~n_tok/stride rows,
    * slice from the SAME tokens array (no re-tokenization per chunk);
    * no shuffle, no state, embarrassingly parallel at any corpus size.
    * r15: one imperative typed pass (the DedupOps signature-kernel
    * pattern) instead of explode+slice+concat_ws — the declarative form
    * re-ran `split`'s uncached regex compile per row and carried the
    * full token array through the Generate; measured 15% faster at sf1
    * (ProfileQ113), identical output (CurationSpec + oracle q113).
    *
    * Deliberately NOT pre-repartitioned: the chain is map-only, so an
    * up-front exchange would serialize every document text once for
    * nothing (measured 1.9× slower at sf0.1); multi-file corpora split
    * natively across the cluster. */
  def chunkDocuments(docs: DataFrame, size: Int = 16,
      stride: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ws = java.util.regex.Pattern.compile("\\s+")
        rows.flatMap { case (id, text) =>
          // exactly tokens(): split(trim(x), "\s+"), keep-empties limit.
          // Spark's trim strips SPACES only (Java String.trim strips all
          // chars ≤ U+0020 — a \t/\n-edged text would tokenize
          // differently); the manual loop is the ngramXxhashOf port,
          // equivalence by construction (OpsSpec pins the \t/\n edge).
          var s0 = 0
          var e0 = text.length
          while (s0 < e0 && text.charAt(s0) == ' ') s0 += 1
          while (e0 > s0 && text.charAt(e0 - 1) == ' ') e0 -= 1
          val tk = ws.split(text.substring(s0, e0), -1)
          val n = tk.length
          // starts 1, 1+stride, … ≤ max(n,1): (max-1)/stride+1 chunks
          val nChunks = (math.max(n, 1) + stride - 1) / stride
          Iterator.tabulate(nChunks) { c =>
            val start = c * stride + 1
            val end = math.min(start + size - 1, n)
            val sb = new java.lang.StringBuilder
            var i = start - 1
            while (i < end) {
              if (i > start - 1) sb.append(' ')
              sb.append(tk(i)); i += 1
            }
            (id, (c + 1).toLong, start.toLong, (end - start + 1).toLong,
              sb.toString)
          }
        }
      }
      .toDF("doc_id", "chunk_id", "start", "chunk_len", "chunk_text")
  }

  // PII patterns shared by redactPii and its audit counts — RE2-safe so
  // the same regexes run in Spark (Java regex) and DuckDB (RE2), with no
  // constructs whose greedy/backtracking semantics differ between the
  // engines on these shapes.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact personally-identifying spans — emails, +CC-NNN-NNNN phone
    * numbers, IPv4 addresses — with fixed placeholders (the standard
    * pre-training scrub). Email replacement runs FIRST so a dotted mail
    * domain can't be half-eaten by the IPv4 rule. Per-row map work only. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")

  /** Audit count of matches for one PII pattern (run it against the
    * PRE-redaction text). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Concat-and-chunk sequence packing: documents are laid out in doc_id
    * order and cut into fixed token-budget packs; a document's pack is its
    * START offset divided by the budget (the packing used to build fixed-
    * length LLM training sequences from variable-length documents).
    *
    * Needs a global exclusive running token total. A bare
    * `Window.orderBy(doc_id)` would drag the whole corpus into ONE
    * partition; instead:
    *   1. range-partition by doc_id, count tokens per partition;
    *   2. prefix-scan those ~numPartitions subtotals on the driver;
    *   3. broadcast the offsets back and window only WITHIN partitions.
    * Per-task state is one long; the corpus is touched exactly once.
    *
    * Returns (doc_id, n_tok, pack_id). */
  def packSequences(docs: DataFrame, budget: Int = 2048): DataFrame = {
    val spark = docs.sparkSession
    // STAGED, not persist+finally-unpersist: spark_partition_id must be
    // observed from ONE materialization by ALL consumers, including the
    // returned lazy plan that executes after this function returns. An
    // unpersisted recompute re-runs repartitionByRange with a fresh
    // sampling seed (derived from the new RDD id), so partition bounds
    // — and therefore every pack assignment — could silently shift.
    // Stage() materializes eagerly and cuts lineage.
    val parted = graft.core.Stage(docs
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tok"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    val subtotals = parted.groupBy(col("pid"))
      .agg(sum(col("n_tok")).as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = subtotals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.tail.zip(subtotals).map { case ((pid, cumIncl), (_, t)) =>
      (pid, cumIncl - t) // exclusive prefix: total BEFORE this partition
    }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("pid", "offset")
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offsetDf), "pid")
      .withColumn("cum0",
        sum(col("n_tok")).over(w) - col("n_tok") + col("offset"))
      .select(col("doc_id"), col("n_tok"),
        floor(col("cum0") / budget).as("pack_id"))
  }

  /** Pack-level accounting for packSequences: (pack_id, n_docs, n_tokens). */
  def packStats(docs: DataFrame, budget: Int = 2048): DataFrame =
    packSequences(docs, budget)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Benchmark-contamination check: for each corpus document, the number
    * of its distinct char-n-gram shingles that also occur in the benchmark
    * (eval-set) documents. Docs with n_shared ≥ threshold should be
    * dropped from training data.
    *
    * The benchmark shingle set is small by construction (eval sets are
    * thousands of docs, not billions) — it broadcasts, and the corpus side
    * stays where it is: a broadcast semi-join + one doc-keyed partial
    * aggregation, no corpus shuffle. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      threshold: Long = 1L): DataFrame = {
    val corpusSh = DedupOps.charShingles(corpus, n)
    val benchSh = DedupOps.charShingles(benchmark, n)
      .select(col("s")).distinct()
    corpusSh.join(broadcast(benchSh), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= threshold)
  }

  /** Cap each stratum at a token budget, admitting documents in
    * deterministic hash-priority order (h32 of the key, key tiebreak)
    * until the budget is exhausted — a document is admitted iff it
    * STARTS before the budget line, so the cap can overshoot by at most
    * one document (the standard pack-until-full semantic, same as
    * [[packSequences]]' chunk rule). Returns per-stratum accounting
    * (stratum, n_docs, n_kept, tok_kept).
    *
    * Scale: one shuffle on the stratum key + an in-partition sort for
    * the running sum — the window is PARTITIONED (never a global
    * single-partition cumsum), and hash-priority admission means re-runs
    * over a grown corpus keep a stable prefix (a doc only drops out when
    * higher-priority docs fill the budget, never because input order
    * changed). */
  def tokenBudgetCap(docs: DataFrame, stratum: Column, key: Column,
      nTokens: Column, budget: Long): DataFrame = {
    // nTokens is the FINAL tiebreak: if the caller's key is not unique
    // per row, two same-key rows with different token counts would
    // otherwise order arbitrarily — and which of them starts before the
    // budget line would flip across runs/partitionings, breaking the
    // stable-prefix guarantee. With it, equal-ranked rows are identical
    // in every column the cumsum sees, so cum0 is deterministic.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(h32(key.cast("string")).asc, key.asc, nTokens.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(stratum.as("stratum"), nTokens.as("n_tok"),
        (sum(nTokens).over(w) - nTokens).as("cum0"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum0") < budget, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cum0") < budget, col("n_tok")).otherwise(0L))
          .as("tok_kept"))
  }

  /** Resample a corpus toward equal per-stratum shares (domain mixing,
    * the "source weights" step of a pretraining data recipe): find the
    * largest feasible corpus where every stratum can supply its equal
    * share without upsampling, then deterministically hash-sample each
    * stratum down to its quota. Returns per-stratum accounting:
    * (stratum, n_before, n_kept, target_share, actual_share).
    *
    * Feasible size M = min over strata of n_s / t_s with t_s = 1/k; the
    * most-constrained stratum keeps everything (rate 1), the rest keep
    * rate = M·t_s/n_s via the same h32-bucket predicate as
    * [[sampleBucket]] — stable across runs, engines and partitionings.
    *
    * Scale: two passes over the corpus — a per-stratum count (tiny
    * output) and a filtered re-count under the broadcast rate table. The
    * rate derivation itself runs on k-row frames. No driver collect, no
    * corpus shuffle (both aggregations have map-side combine on a
    * low-cardinality key).
    *
    * Granularity bound: acceptance rates are expressed in integer hash
    * buckets, so a rate below 1/`buckets` floors to a zero quota (the
    * stratum still appears in the accounting with n_kept = 0). The
    * default 10^6 buckets expresses rates down to 1e-6 while keeping the
    * 32-bit hash's bucket occupancy uniform to ~0.02% (a modulus near
    * 2^32 would skew low buckets by up to 25%). The `+ 1e-3` inside
    * floor() absorbs IEEE round-trip error so the most-constrained
    * stratum's rate-1 threshold cannot land at buckets−1 and silently
    * drop ~1/buckets of the stratum it must keep whole; both engines
    * compute the identical double expression. */
  def mixtureResample(df: DataFrame, stratum: Column, key: Column,
      buckets: Int = 1000000): DataFrame = {
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_before"))
    // k-row frames throughout: equal target share, feasible total,
    // per-stratum acceptance threshold in hash buckets
    val k1 = counts.agg(count(lit(1)).as("n_strata"))
    val shared = counts.crossJoin(broadcast(k1))
      .withColumn("target_share", lit(1.0) / col("n_strata"))
    val feasible = shared
      .agg(min(col("n_before") / col("target_share")).as("m"))
    val rates = shared.crossJoin(broadcast(feasible))
      .withColumn("thresh",
        floor(col("m") * col("target_share") / col("n_before")
          * buckets + 1e-3).cast("long"))
      .select(col("stratum"), col("n_before"), col("target_share"),
        col("thresh"))
    // null-safe join: a NULL stratum is counted like any other group by
    // groupBy, so it must also be SAMPLED like any other — an equi-join
    // would reject every null row, report n_kept = 0, and (worse) let
    // the null group constrain the feasible size while contributing
    // nothing to the output
    val kept = df
      .join(broadcast(rates), stratum <=> rates("stratum"))
      .filter(h32(key.cast("string")) % buckets < col("thresh"))
      .groupBy(rates("stratum"))
      .agg(count(lit(1)).as("n_kept"))
    val totalKept = kept.agg(sum(col("n_kept")).as("total_kept"))
    // LEFT join (null-safe, same reason as above): a stratum whose
    // quota floored to zero keeps its accounting row (n_kept 0)
    // instead of silently vanishing
    rates.join(kept.withColumnRenamed("stratum", "k_stratum"),
        col("stratum") <=> col("k_stratum"), "left")
      .drop("k_stratum")
      .na.fill(0L, Seq("n_kept"))
      .crossJoin(broadcast(totalKept))
      .select(col("stratum"), col("n_before"), col("n_kept"),
        col("target_share"),
        (col("n_kept").cast("double") / col("total_kept"))
          .as("actual_share"))
  }

  /** CCNet-style repeated-segment (boilerplate) removal: split every
    * document into segments, count how many DISTINCT documents each
    * segment occurs in, and strip segments whose document frequency
    * reaches `minDf` (navigation bars, cookie banners, license footers —
    * anything that repeats across many pages). Returns per-document
    * (doc_id, n_segments, n_removed, clean_text) with clean_text the
    * surviving segments re-joined in original order ('' when everything
    * was boilerplate).
    *
    * The segmenter here is fixed-size token blocks
    * ([[chunkDocuments]] with stride = size); on corpora with real line
    * structure the same shape runs with a newline splitter — the operator
    * logic (df-count → mark → strip) is segmenter-agnostic.
    *
    * Scale: the segment frame is map-only work, recomputed for the two
    * passes rather than persisted — at 100 TB re-reading the scan twice
    * is cheaper than caching an exploded copy of the corpus. Pass 1 is
    * one shuffle keyed by segment text with map-side combine, reduced to
    * ONLY the df ≥ minDf survivors — small by the boilerplate premise
    * (boilerplate is few distinct strings repeated many times), so the
    * mark join broadcasts (AQE-decided, not forced: an adversarial corpus
    * can have an unbounded boilerplate set). Pass 2 is the mark join plus
    * one doc-keyed reassembly shuffle. No driver collects, no windows. */
  def boilerplateStrip(docs: DataFrame, segSize: Int = 2,
      minDf: Long = 20): DataFrame = {
    def segments = chunkDocuments(docs, size = segSize, stride = segSize)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val boiler = segments
      .groupBy(col("chunk_text"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("chunk_text"), lit(1).as("is_boiler"))
    segments
      .join(boiler, Seq("chunk_text"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("is_boiler").isNotNull, 1L).otherwise(0L))
          .as("n_removed"),
        array_sort(collect_list(when(col("is_boiler").isNull,
          struct(col("chunk_id"), col("chunk_text"))))).as("kept"))
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        array_join(transform(col("kept"), x => x.getField("chunk_text")),
          " ").as("clean_text"))
  }

  /** Deterministic seeded training shards: assign every row a shard and a
    * reproducible position within it, so the training order of a corpus
    * is a pure function of (seed, key) — identical across runs, engines,
    * partitionings and cluster sizes, and changing the seed reshuffles
    * globally. shard = h32(seed|key) mod nShards; position = rank of the
    * same hash within the shard (key tiebreak for non-unique keys).
    *
    * Scale: one shuffle keyed by shard + a per-shard sort. At production
    * scale the materialized write is `repartition(nShards, shard)
    * .sortWithinPartitions(hash)` — one exchange, local sorts, position
    * implicit in file order; the explicit row_number here is the
    * verifiable form of the same order. Choose nShards ≈ corpus/shard-
    * size so per-shard sorts fit an executor (spill-safe regardless). */
  def trainingShards(df: DataFrame, key: Column, nShards: Int,
      seed: String): DataFrame = {
    val h = h32(concat(lit(seed + "|"), key.cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, key.asc)
    df.withColumn("h", h)
      .withColumn("shard", col("h") % nShards)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("h")
  }

  /** Temperature-scaled source mixture (the multilingual/multi-source
    * sampling recipe of mBERT / XLM-R / GPT-3): stratum weight
    * ∝ n_tokens^alpha with alpha < 1 flattening the distribution —
    * rare sources are upsampled relative to their natural share. Returns
    * per-stratum (stratum, n_tok, weight, share, rate) where share is the
    * stratum's fraction of the sampled epoch and rate = share·budget/n_tok
    * is the per-token sampling rate (> 1 means the source repeats within
    * an epoch).
    *
    * Determinism across engines: n_tok is an exact int64 sum; pow() is
    * bit-identical for these magnitudes in both engines (verified), and
    * the weight is then ROUNDED TO AN EXACT INTEGER (×10^6) before the
    * denominator sum, so the total is order-free int64 arithmetic and
    * every share/rate is one IEEE division of exact integers — no
    * float-summation-order hazard.
    *
    * Scale: one map-side-combined aggregation on a low-cardinality key;
    * everything after runs on k-row frames (1-row total broadcast). */
  def temperatureMixture(docs: DataFrame, stratum: Column, nTokens: Column,
      alpha: Double = 0.7, budget: Long = 100000L): DataFrame = {
    val counts = docs.groupBy(stratum.as("stratum"))
      .agg(sum(nTokens).as("n_tok"))
      .withColumn("w_scaled",
        round(pow(col("n_tok").cast("double"), alpha) * 1e6).cast("long"))
    val total = counts.agg(sum(col("w_scaled")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .select(col("stratum"), col("n_tok"),
        (col("w_scaled").cast("double") / 1e6).as("weight"),
        (col("w_scaled").cast("double") / col("w_total")).as("share"),
        (col("w_scaled").cast("double") / col("w_total") * budget
          / col("n_tok")).as("rate"))
  }

  /** Seeded weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, IPL 2006): each key draws a deterministic uniform
    * u ∈ (0, 1] from the md5-derived 32-bit hash of (key, seed) and the
    * k largest rank keys ln(u)/w win — exactly a weighted sample without
    * replacement, reproducible across runs, engines and partitionings
    * (rand()-based sampling is none of those).
    *
    * Scale: rank computation is pure map work; selection is a global
    * top-k, which Spark plans as TakeOrderedAndProject — per-partition
    * heaps of size k, no shuffle of the population.
    *
    * Weights must be positive: A-ES ranks are ln(u)/w, so w=0 divides to
    * -Infinity (never sampled) and w<0 flips the rank sign (always
    * sampled) — both silently wrong. Non-positive-weight rows are
    * excluded up front (zero probability mass), matching the algorithm's
    * w > 0 domain. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: String = "42"): DataFrame = {
    val u = (h32(concat(key.cast("string"), lit("#" + seed))) + lit(1L))
      .cast("double") / lit(4294967297.0)
    df.where(weight.cast("double") > 0)
      .select(key.as("key"), weight.cast("long").as("w"),
        (log(u) / weight.cast("double")).as("r_exact"))
      .orderBy(col("r_exact").desc, col("key"))
      .limit(k)
      .select(col("key"), col("w"), round(col("r_exact"), 6).as("r"))
  }

  /** Deterministic epoch assembly from a temperature mixture — the step
    * AFTER [[temperatureMixture]] computes per-source sampling rates:
    * materialize which documents (and how many copies of each) make up
    * one training epoch. A document in a source with rate r appears
    * ⌊r⌋ times plus one more with probability frac(r), decided by the
    * same md5 hash-bucket coin as every sampler here — so the epoch is
    * a pure function of (corpus, alpha, budget, seed): reproducible
    * across runs, engines and partitionings, and auditable row-by-row.
    *
    * Returns (doc_id, source, copy) with copy ∈ 1..n_copies.
    *
    * Shape at scale: rates are an S-row broadcast joined map-side; the
    * copy expansion is a per-row explode bounded by ⌈r⌉ — no shuffle
    * beyond the S-row aggregation inside [[temperatureMixture]].
    * The fractional coin compares against round(frac·10⁶) so both
    * engines quantize the threshold identically. */
  def assembleEpoch(docs: DataFrame, stratum: Column, nTokens: Column,
      alpha: Double = 0.7, budget: Long = 100000L,
      seed: String = "42"): DataFrame = {
    val rates = temperatureMixture(docs, stratum, nTokens, alpha, budget)
      .select(col("stratum"), col("rate"))
    val coin = h32(concat(col("doc_id").cast("string"), lit("#" + seed)))
      .%(1000000L)
    docs.select(col("doc_id"), stratum.as("stratum"))
      .join(broadcast(rates), "stratum")
      .select(col("doc_id"), col("stratum").as("source"),
        (floor(col("rate")).cast("long") +
          when(coin < round((col("rate") - floor(col("rate"))) * 1e6)
            .cast("long"), 1L).otherwise(0L)).as("n_copies"))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  /** Seeded weighted sampling without replacement PER GROUP — A-ES
    * ([[weightedSample]]) composed with the k-bounded
    * [[graft.functions.TopKByScore]] aggregator: each stratum draws its
    * own k winners by the same deterministic rank keys. This is the
    * stratified epoch-sampling primitive (k docs per source/language,
    * weighted by length or quality) that a per-group `row_number`
    * window would pay a full shuffle+sort of the population for; here
    * every map task forwards at most k rows per group.
    *
    * The rank ln(u)/w is rounded ONCE to a scaled (×10⁶) int64 — the
    * q122 determinism contract — so selection and the reported rank are
    * exact cross-engine; ties break by key ascending. Non-positive
    * weights are excluded (zero mass), as in [[weightedSample]].
    *
    * Returns (grp, rnk, key, r): rank 1..k within each group, r the
    * scaled A-ES rank key in nats. */
  def weightedSamplePerGroup(df: DataFrame, group: Column, key: Column,
      weight: Column, k: Int, seed: String = "42"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val u = (h32(concat(key.cast("string"), lit("#" + seed))) + lit(1L))
      .cast("double") / lit(4294967297.0)
    val rs = round(log(u) / weight.cast("double") * 1e6).cast("long")
    val topk = udaf(new graft.functions.TopKByScore(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    df.where(weight.cast("double") > 0)
      .select(group.as("grp"), key.cast("long").as("key"), rs.as("rs"))
      .groupBy(col("grp"))
      .agg(topk(col("rs"), col("key")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("grp"), (col("i") + 1).cast("long").as("rnk"),
        col("e._2").as("key"),
        (col("e._1").cast("double") / 1e6).as("r"))
  }
}
