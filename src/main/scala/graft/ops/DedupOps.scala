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
object DedupOps extends Serializable {

  /** Distinct character n-gram shingles of one document, first-occurrence
    * order. Shared by the signature pass and the candidate-verification
    * pass so both see the identical set. */
  private def distinctShingles(text: String, n: Int): Array[String] = {
    val nPos = math.max(text.length - (n - 1), 1)
    val set = new java.util.LinkedHashSet[String]()
    var p = 0
    while (p < nPos) {
      set.add(text.substring(p, math.min(p + n, text.length)))
      p += 1
    }
    set.toArray(new Array[String](set.size))
  }

  /** MinHash minima of one shingle set: top-32-bits-of-md5 shingle hash
    * through k affine permutations — exact int64 math any engine
    * reproduces bit-for-bit (see permHash). */
  private def signatureOf(shset: Array[String], k: Int,
      md: java.security.MessageDigest): Array[Long] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val mins = Array.fill(k)(Long.MaxValue)
    shset.foreach { s =>
      md.reset()
      val d = md.digest(s.getBytes(utf8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var i = 0
      while (i < k) {
        val v = (h * (2 * i + 1) + i.toLong * 12582917L) % 2147483647L
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    mins
  }

  /** One document's MinHash signature from raw text — the imperative
    * kernel behind [[signaturesOnly]], exposed for the streaming
    * near-dup path (graft.streaming.NearDupStream) so batch and stream
    * compute bit-identical signatures. Callers supply a reused
    * MessageDigest per task/partition. */
  private[graft] def signatureFor(text: String, n: Int, k: Int,
      md: java.security.MessageDigest): Array[Long] =
    signatureOf(distinctShingles(text, n), k, md)

  /** Exact dedup: group by md5 of normalized text, keep the minimum id.
    * Returns (fingerprint, keep_id, n_copies). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(lower(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Spread a (possibly few-file) input across all cores before an
    * expansion-heavy stage — a small parquet table arrives as one
    * partition, which would serialize the explode/hash work onto a single
    * task. On a cluster this is the same idiom used to fan work out after
    * a selective filter. */
  private[graft] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distinct character n-gram shingles per document: (doc_id, s). */
  def charShingles(docs: DataFrame, n: Int = 8): DataFrame =
    charShinglesRaw(docs, n).distinct()

  /** The pre-distinct shingle stream — for callers that can cheaply
    * discard most of it map-side (e.g. a Bloom probe) BEFORE paying the
    * dedup shuffle. */
  def charShinglesRaw(docs: DataFrame, n: Int = 8): DataFrame =
    spread(docs).select(col("doc_id"), col("text"),
      explode(sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))))
        .as("pos"))
      .select(col("doc_id"), expr(s"substring(text, pos, $n)").as("s"))

  /** MinHash permutation constants: hash i of shingle-hash h is the
    * classic affine permutation ((2i+1)·h + i·12582917) mod (2^31-1).
    * One md5 per shingle, k cheap integer mixes — exact int64 math that
    * any engine reproduces bit-for-bit. */
  private[graft] def permHash(h: Column, i: Int): Column =
    (h * (2 * i + 1) + lit(i.toLong * 12582917L)) % 2147483647L

  /** Per-document distinct shingle set + full MinHash signature, computed
    * in ONE imperative map-side pass (typed mapPartitions): shingling,
    * hashing and all k permutation minima per document, with a reused
    * MessageDigest per task. Returns
    * (doc_id, shset, n_sh, s0..s{k-1}) with NO exchange at all — nothing
    * shuffles until the (tiny) band keys downstream.
    *
    * mapPartitions is deliberate here (the documented last resort): the
    * declarative forms — explode + collect_set (shuffles every shingle)
    * or array_distinct/transform lambdas (higher-order functions evaluate
    * interpreted, boxing n_shingles·k lambda calls) — both measured
    * slower at sf0.1, and the signature math is opaque to Catalyst
    * anyway. Shingles use code-unit substrings (= SQL substring for the
    * ASCII corpus; see TESTDATA.md). */
  private[graft] def setsWithSignatures(docs: DataFrame, n: Int,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = spread(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val shset = distinctShingles(text, n)
          (id, shset, shset.length, signatureOf(shset, k, md))
        }
      }
      .toDF("doc_id", "shset", "n_sh", "sig")
    out.select(col("doc_id") +: col("shset") +: col("n_sh") +:
      (0 until k).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)
  }

  /** Signatures WITHOUT the shingle-set arrays: the variant every
    * at-scale caller wants — one (doc_id, k longs) row per document, so a
    * persist of the output holds KBs per million docs instead of the full
    * shingled corpus. The shingle sets are still built per-row (they
    * define the signature) but never leave the task. */
  private[graft] def signaturesOnly(docs: DataFrame, n: Int,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = spread(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          (id, signatureOf(distinctShingles(text, n), k, md))
        }
      }
      .toDF("doc_id", "sig")
    out.select(col("doc_id") +:
      (0 until k).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)
  }

  /** Per-document set of 64-bit shingle FINGERPRINTS (doc_id, shset,
    * n_sh) — distinct char n-gram shingles hashed to int64. For
    * consumers that only need shingle IDENTITY (ownership minima,
    * novelty counts, candidate-pair intersection counts — never the
    * shingle text), longs through the corpus-sized shuffle beat n-char
    * strings: half the bytes and long-keyed hash aggregation. Collision
    * odds for a ~10⁶-shingle corpus at 64 bits: ~10⁻⁷.
    *
    * Hash: catalyst XXH64 (seed 42) over the shingle's UTF-8 bytes —
    * NOT md5. No oracle ever sees these values (every consumer emits
    * counts), so engine-agnosticity buys nothing, and the r16 A/B
    * showed the md5 form COSTING more than the narrower joins saved
    * (family subset bench 5.64 → 7.01 s): one MessageDigest round per
    * shingle is ~50× an XXH64 mix. Distinct via sort+unique on the
    * hashes (== distinct shingles under the injectivity premise above,
    * which OpsSpec checks on the real corpus); all-ASCII texts hash
    * windows of one per-doc byte array with zero per-shingle
    * allocation, the general path hashes per-position substrings. */
  private[graft] def shingleSetsHashed(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        import org.apache.spark.sql.catalyst.expressions.XXH64
        rows.map { case (id, text) =>
          val nPos = math.max(text.length - (n - 1), 1)
          val hs = new Array[Long](nPos)
          val bytes = text.getBytes(utf8)
          if (bytes.length == text.length) {
            // all-ASCII: byte offsets == char offsets, hash windows of
            // the one array directly
            var p = 0
            while (p < nPos) {
              hs(p) = XXH64.hashUnsafeBytes(bytes, off + p,
                math.min(n, text.length - p), 42L)
              p += 1
            }
          } else {
            var p = 0
            while (p < nPos) {
              val b = text.substring(p, math.min(p + n, text.length))
                .getBytes(utf8)
              hs(p) = XXH64.hashUnsafeBytes(b, off, b.length, 42L)
              p += 1
            }
          }
          java.util.Arrays.sort(hs)
          var w = 0
          var q = 1
          while (q < nPos) {
            if (hs(q) != hs(w)) { w += 1; hs(w) = hs(q) }
            q += 1
          }
          val out = java.util.Arrays.copyOf(hs, w + 1)
          (id, out, out.length)
        }
      }
      .toDF("doc_id", "shset", "n_sh")
  }

  /** Per-document RAW-STRING shingle set (doc_id, shset, n_sh) — the
    * reference form of the verification pass (specs compare the hashed
    * production path against it). Production verification uses
    * [[shingleSetsHashed]] since r16: intersection counts are identical
    * under the injective fingerprint and longs beat strings through the
    * pair joins. No spread: callers feed an already-filtered frame. */
  private[graft] def shingleSets(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val s = distinctShingles(text, n); (id, s, s.length)
        }
      }
      .toDF("doc_id", "shset", "n_sh")
  }

  /** MinHash signature over the distinct shingle set. Returns one row per
    * doc with int64 columns s0..s{k-1}. Entirely map-side (see
    * signaturesOnly): shuffling n_shingles·k exploded rows instead is
    * the difference between moving KBs and TBs at 100 TB scale. */
  def minhashSignatures(docs: DataFrame, k: Int = 12): DataFrame =
    signaturesOnly(docs, 8, k)

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
  def lshCandidates(docs: DataFrame, k: Int = 12, rowsPerBand: Int = 3): DataFrame =
    candidatesFromSignatures(minhashSignatures(docs, k), k, rowsPerBand)

  /** Just the distinct band-collision pairs (no similarity estimate) —
    * the lean candidate-generation path `nearDuplicates` consumes.
    *
    * Shape: ONE shuffle (the bucket groupBy) instead of a band self-join
    * (two exchanges) — pairs are expanded map-side from each bucket's
    * sorted member list. A hot bucket lands in one task either way (the
    * self-join hashes on the same key), so skew behavior is identical
    * with one exchange less. */
  private[graft] def pairsFromBands(sig: DataFrame, k: Int,
      rowsPerBand: Int): DataFrame =
    rawPairsFromBands(sig, k, rowsPerBand).distinct()

  /** Band-collision pairs WITHOUT the cross-band dedup — one exchange
    * shorter. A pair colliding in several bands appears once per such
    * band; callers must either dedup downstream (`nearDuplicates` dedups
    * its tiny verified output) or use `pairsFromBands`. */
  private[graft] def rawPairsFromBands(sig: DataFrame, k: Int,
      rowsPerBand: Int): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val nBands = k / rowsPerBand
    val keys = (0 until nBands).map { b =>
      md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i")): _*))
    }
    // one scan of sig: (doc_id, band, bk) via posexplode of the key array
    val bands = sig.select(col("doc_id"),
      posexplode(array(keys: _*)).as(Seq("band", "bk")))
    bands.groupBy(col("band"), col("bk"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // all i<j member pairs (sort_array above makes a < b), expanded
      // in a typed flatMap (r16): the declarative
      // flatten(transform(.., transform(slice(..), struct))) evaluated
      // its lambdas INTERPRETED with a struct per pair — the
      // winnowPairs kernel pattern
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
  }

  /** Hot-bucket state bound (r15 verdict item 7, disclosed): LSH
    * banding inherently funnels every member of one band key into ONE
    * aggregation buffer — a degenerate key (mass-duplicated boilerplate
    * sharing a signature) costs m·(1+k)·8 bytes of list state in one
    * task here (the id-only [[rawPairsFromBands]] buffer is m·8), e.g.
    * ~100 MB for a million-member bucket at k=12 — far under an
    * executor's working memory, and the pair EXPANSION streams (the
    * typed iterator yields m²/2 pairs without materializing them). The
    * quadratic pair count itself, not the buffer, is what degenerates
    * first (10⁶ members → 5·10¹¹ pairs): that is LSH's documented
    * operating contract — near-dup candidates are the duplicated
    * sliver; run [[exactDedup]]/[[normalizedDedup]] ahead of banding on
    * boilerplate-heavy corpora so exact copies never reach it. A member
    * cap is deliberately NOT applied: it would silently drop true
    * candidate pairs (winnowPairs' dfCap is a DECLARED semantic of that
    * operator; here it would change query results). SkewSpec pins the
    * mass-duplicated case end-to-end. */
  private[graft] def candidatesFromSignatures(sig0: DataFrame, k: Int,
      rowsPerBand: Int): DataFrame = {
    // r15: est_sim is computed DURING the band-bucket pair expansion —
    // each bucket's member list carries the full signature vector
    // (12 longs of metadata per member, guide-§2.3 "shuffle metadata,
    // not payloads"), so the former shape's sig persist + pair distinct
    // + TWO signature joins collapse into the one bucket aggregation
    // the banding already pays (ProfileQ151: the est block was +0.9 s
    // of a 3.0 s run). est_sim = matching-position count / k, the same
    // IEEE division as the join form; cross-band duplicates carry the
    // pair-determined est, so the trailing distinct is exactly the old
    // pair dedup.
    val sig = sig0
      .select(col("doc_id") +: (0 until k).map(i => col(s"s$i")): _*)
    val nBands = k / rowsPerBand
    val keys = (0 until nBands).map { b =>
      md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i")): _*))
    }
    val spark = sig0.sparkSession
    import spark.implicits._
    val bands = sig.select(col("doc_id"),
      array((0 until k).map(i => col(s"s$i")): _*).as("sv"),
      posexplode(array(keys: _*)).as(Seq("band", "bk")))
    bands.groupBy(col("band"), col("bk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sv"))))
        .as("ms"))
      .filter(size(col("ms")) > 1)
      // typed pair expansion (r16, the winnowPairs kernel pattern): the
      // declarative nested-transform form evaluated interpreted — a
      // struct per pair plus a zip_with/aggregate lambda chain per
      // est_sim. Same i<j pairs (ms sorted by (doc_id, sv), doc_ids
      // unique per bucket, so a < b), same matching-position count,
      // same IEEE division by k.
      .select(col("ms")).as[Seq[(Long, Seq[Long])]]
      .flatMap { ms =>
        val n = ms.size
        new Iterator[(Long, Long, Double)] {
          private var i = 0
          private var j = 1
          def hasNext: Boolean = i < n - 1
          def next(): (Long, Long, Double) = {
            val (a, sa) = ms(i)
            val (b, sb) = ms(j)
            var c = 0
            var p = 0
            while (p < k) {
              if (sa(p) == sb(p)) c += 1
              p += 1
            }
            j += 1
            if (j >= n) { i += 1; j = i + 1 }
            (a, b, c.toDouble / k)
          }
        }
      }
      .toDF("a", "b", "est_sim")
      .distinct()
  }

  /** Exact n-gram Jaccard for ALL pairs sharing ≥1 shingle. O(Σ df²) —
    * quadratic in document frequency of shared shingles, so this is the
    * exhaustive small-corpus baseline. At scale use `nearDuplicates`
    * (LSH candidates → exact Jaccard verification), which is linear in
    * candidate count. */
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

  /** The scale path: MinHash-LSH candidate generation, then EXACT Jaccard
    * computed only on candidate pairs. The intersection join is driven
    * from the (small) candidate list — pairs × shingles-per-doc rows, not
    * the Σ df² all-pairs blowup — so cost is linear in candidates.
    *
    * Cache ownership: registers TWO session-cache persists (the raw
    * candidate pairs and the candidate shingle sets), both consumed more
    * than once by the returned plan. They live in the session cache until
    * `spark.catalog.clearCache()` (the bench does this per run); callers
    * invoking the operator repeatedly in one long-lived session should do
    * the same between invocations or the intermediates accumulate. */
  def nearDuplicates(docs: DataFrame, n: Int = 8, threshold: Double = 0.2,
      k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    // Pass 1 (map-side, corpus-wide): signatures ONLY — one (doc_id,
    // k longs) row per doc. The round-2 version persisted the full
    // shingle-set string arrays here and joined them against EVERY doc;
    // that fat persist+join was 54% of the whole bench. Signatures are
    // KBs where shingle sets are the corpus itself.
    val sig = signaturesOnly(docs, n, k)
    // candidate pairs from band collisions — persisted: consumed twice
    // (candidate-id set below + the final verification join). RAW pairs
    // (no cross-band dedup): the distinct exchange is pushed to the
    // verified 25-row output, where it costs nothing — duplicate pairs
    // are harmless in the broadcast-semi build and only re-verify a
    // handful of rows
    val pairs = rawPairsFromBands(sig, k, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pass 2 (map-side, CANDIDATES only): recompute shingle sets for just
    // the docs that appear in a candidate pair. The semi-join is
    // deliberately UNHINTED: on a typical corpus candidates are a tiny
    // fraction and AQE converts it to a broadcast join at runtime (it
    // knows the materialized size of the pairs stage), but on a
    // boilerplate-heavy corpus the candidate set is corpus-sized and a
    // forced broadcast() would collect it onto the driver — the 8 GB
    // broadcast limit / driver OOM, exactly where LSH degrades anyway.
    // AQE keeps that case a shuffle join with no driver participation.
    // spread() re-fans the filtered survivors across cores (a selective
    // semi-join leaves them in the scan's few partitions), and the persist
    // holds candidate sets only — both verification sides read it.
    // no distinct: the semi-join's hash build dedups ids anyway, and
    // skipping it saves a shuffle in the build subtree.
    // r16: HASHED sets (int64 XXH64 fingerprints, shingleSetsHashed)
    // — intersection COUNT is all verification needs, and it is exactly
    // preserved under an injective hash of the shingles; longs through
    // the two pair joins beat 8-char strings (half the shuffle bytes,
    // long-equality intersects). Collision odds per candidate pair at
    // 64 bits: ~|setA∪setB|²/2⁶⁵ ≈ 1e-11 for 1e4-shingle docs (the q142
    // fingerprinting disclosure; OpsSpec pins hashed ≡ string
    // verification on real data).
    val candIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id")))
    val sets = shingleSetsHashed(
      spread(docs.join(candIds, Seq("doc_id"), "left_semi")), n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact verification: per-pair array_intersect on the two (small)
    // shingle-set arrays — linear in candidate count, never the Σ df²
    // all-pairs shingle join
    val sa = sets.select(col("doc_id").as("a"), col("shset").as("seta"),
      col("n_sh").as("na"))
    val sb = sets.select(col("doc_id").as("b"), col("shset").as("setb"),
      col("n_sh").as("nb"))
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("seta"), col("setb"))).as("i"),
        col("na"), col("nb"))
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // cross-band pair dedup, deferred from candidate generation: here
      // it runs on the verified near-dup rows (tiny at any scale)
      .distinct()
  }

  /** Cross-corpus (incremental-ingest) near-duplicate check: which
    * INCOMING documents near-duplicate something in an EXISTING corpus —
    * the production admission path, where each new batch is screened
    * against everything already ingested without re-deduping the corpus
    * (the batch-mode complement of
    * [[graft.streaming.NearDupStream.nearDupCandidates]]).
    *
    * Shape: MinHash signatures map-side on BOTH sides (identical kernel,
    * so batch corpus and incoming agree bit-for-bit), band keys exploded
    * map-side, then one equi-join on (band, band-key) — incoming × corpus,
    * never incoming × incoming or corpus × corpus, so candidate volume
    * scales with the batch, not the corpus. Verification recomputes
    * shingle sets for CANDIDATE docs only (AQE turns the semi-joins into
    * broadcasts when the candidate sliver is small — the typical case).
    *
    * At steady state the corpus side's signatures/bands are ingest-time
    * metadata — persist `minhashSignatures` alongside the silver table
    * (the same pattern as TextOps' materialized inverted index) and this
    * operator's corpus-side cost drops to a scan of k ints per doc;
    * recomputing here keeps the operator self-contained for corpora
    * without the index.
    *
    * @return (new_id, corpus_id, jaccard) — exact n-gram Jaccard ≥
    *         `threshold`, one row per verified cross pair. */
  def crossNearDuplicates(incoming: DataFrame, corpus: DataFrame,
      n: Int = 8, threshold: Double = 0.2, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame =
    crossScreen(bandsOf(incoming, n, k, rowsPerBand),
      bandsOf(corpus, n, k, rowsPerBand), incoming, corpus, n, threshold)

  /** (doc_id, band, bk) LSH band rows for a corpus — the frame
    * [[buildBandIndex]] persists and [[crossNearDuplicates]] computes
    * inline. Entirely map-side (signatures + key hash per row). */
  def bandsOf(docs: DataFrame, n: Int = 8, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame = {
    val nBands = k / rowsPerBand
    val sig = signaturesOnly(docs, n, k)
    val keys = (0 until nBands).map { b =>
      md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"s$i")): _*))
    }
    sig.select(col("doc_id"), posexplode(array(keys: _*)).as(Seq("band", "bk")))
  }

  /** Persist a corpus's LSH band rows as a managed table BUCKETED AND
    * SORTED BY band key — the ingest-time near-dup index the
    * [[crossNearDuplicates]] scaladoc points to. Screening a batch then
    * reads k/rowsPerBand ints-and-a-key per corpus doc instead of
    * re-hashing the corpus text, and the bucketed layout hands the
    * candidate join a pre-partitioned side (same discipline as
    * [[graft.ops.TextOps.buildTermIndex]] / silver.BucketedTables).
    * Refresh incrementally by appending the new batch's own
    * [[bandsOf]] rows after admission. */
  def buildBandIndex(docs: DataFrame, db: String, table: String,
      n: Int = 8, k: Int = 12, rowsPerBand: Int = 3,
      numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    requireIndexNames(db, table)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    bandsOf(docs, n, k, rowsPerBand)
      // generation stamp for incremental maintenance ([[updateBandIndex]])
      .withColumn("batch", lit(0L))
      .write
      .bucketBy(numBuckets, "bk")
      .sortBy("bk")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"$db.$table")
  }

  /** [[crossNearDuplicates]] against a persisted [[buildBandIndex]]
    * table: identical output, corpus-side signature work replaced by an
    * index scan. `corpus` is still needed for the exact-Jaccard
    * verification text of CANDIDATE docs only. */
  def crossNearDuplicatesIndexed(incoming: DataFrame, corpus: DataFrame,
      index: DataFrame, n: Int = 8, threshold: Double = 0.2, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame =
    crossScreen(bandsOf(incoming, n, k, rowsPerBand),
      index.select(col("doc_id"), col("band"), col("bk")),
      incoming, corpus, n, threshold)

  private def tombstoneTable(table: String) = s"${table}_tombstones"

  /** Metastore identifier guard for the band-index maintenance surface:
    * db/table names are interpolated into `spark.sql` DDL text
    * (CREATE DATABASE / ALTER TABLE … RENAME / DROP TABLE), so they are
    * restricted to `[A-Za-z0-9_]+` up front — a clear failure at the
    * call site instead of a half-executed rename on an exotic name.
    * The suffixes `_staged`, `_old` and `_tombstones` are RESERVED for
    * the maintenance side tables ([[updateBandIndex]],
    * [[compactBandIndex]]); an index table named with one would collide
    * with its own machinery, so those are rejected too. */
  private def requireIndexNames(db: String, table: String): Unit = {
    val ident = "[A-Za-z0-9_]+"
    require(db.matches(ident),
      s"band-index database name '$db' must match $ident")
    require(table.matches(ident),
      s"band-index table name '$table' must match $ident")
    Seq("_staged", "_old", "_tombstones").foreach { suf =>
      require(!table.endsWith(suf),
        s"band-index table name '$table' ends in reserved maintenance " +
          s"suffix '$suf'")
    }
  }

  /** Incremental [[buildBandIndex]] maintenance — the lakehouse index
    * pattern that avoids rebuilding a corpus-sized table per batch:
    *
    *  - `admitted` docs APPEND their own band rows into the bucketed
    *    table, stamped with a monotonically increasing `batch` id
    *    (Spark appends to a bucketed table with matching bucket spec,
    *    so new files land in the same bk-hash buckets and the
    *    bucket-pruned candidate join keeps working unchanged);
    *  - `removedIds` (retracted/redacted docs) append to a tombstone
    *    side table as (doc_id, as_of = this batch) — parquet files are
    *    immutable, so deletes are logical until [[compactBandIndex]]
    *    folds them in. The as-of generation is what makes
    *    RE-ADMISSION correct: a tombstone hides only rows with
    *    batch ≤ as_of, so a doc deleted in batch 3 and re-ingested
    *    (possibly with different text) in batch 5 shows exactly its
    *    new rows — the stale pre-deletion rows stay hidden.
    *
    * Cost per batch: band rows of the batch (map-side) + two 1-row
    * maxes (index batch, tombstone as_of) + a tombstone append — never
    * a corpus-sized write. Single-writer maintenance, like any
    * non-transactional metastore table. */
  def updateBandIndex(spark: org.apache.spark.sql.SparkSession,
      db: String, table: String, admitted: DataFrame,
      removedIds: DataFrame, n: Int = 8, k: Int = 12,
      rowsPerBand: Int = 3, numBuckets: Int = 8): Unit = {
    import spark.implicits._
    requireIndexNames(db, table)
    val ts = s"$db.${tombstoneTable(table)}"
    if (!spark.catalog.tableExists(ts)) {
      Seq.empty[(Long, Long)].toDF("doc_id", "as_of").write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(ts)
    }
    // Generation id for THIS call: strictly greater than every id any
    // prior call wrote, whether that call admitted rows (batch =
    // nextBatch) or only removed them (as_of = nextBatch − 1). Deriving
    // from the index's max(batch) alone would hand consecutive
    // removal-only calls the SAME id; folding in max(as_of) + 1 keeps
    // generations strictly increasing without changing tombstone
    // semantics (pre-existing tombstones always satisfy
    // as_of + 1 ≤ max(batch) + 1, so they never skip ids).
    // Both maxes are null-safe: a zero-row index (empty-corpus
    // bootstrap) or a fresh tombstone table has no max. Indexes
    // persisted by the pre-generation code version lack the batch
    // column entirely — adopt them with one rewrite adding
    // lit(0L).as("batch") before maintaining incrementally.
    val maxBatch = Option(spark.table(s"$db.$table")
        .agg(max(col("batch"))).head().get(0))
      .map(_.asInstanceOf[Long])
    val maxAsOf = Option(spark.table(ts)
        .agg(max(col("as_of"))).head().get(0))
      .map(_.asInstanceOf[Long])
    val nextBatch = math.max(maxBatch.getOrElse(-1L),
      maxAsOf.map(_ + 1L).getOrElse(-1L)) + 1L
    if (!admitted.isEmpty) {
      bandsOf(admitted, n, k, rowsPerBand)
        .withColumn("batch", lit(nextBatch))
        .write
        .bucketBy(numBuckets, "bk")
        .sortBy("bk")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .saveAsTable(s"$db.$table")
    }
    if (!removedIds.isEmpty) {
      // as_of = nextBatch − 1: a removal hides all PRIOR generations
      // but never this same call's admissions — so "remove + re-admit
      // in one batch" is a REPLACE, not a permanent disappearance
      removedIds.select(col("doc_id"), lit(nextBatch - 1).as("as_of"))
        .write.mode(org.apache.spark.sql.SaveMode.Append).saveAsTable(ts)
    }
  }

  /** The live view of a maintained band index: persisted rows minus
    * rows hidden by a tombstone of generation ≥ their batch (a
    * broadcast anti-join — the tombstone set is the retracted sliver,
    * never corpus-sized; compaction keeps it so). */
  def liveBandIndex(spark: org.apache.spark.sql.SparkSession,
      db: String, table: String): DataFrame = {
    val idx = spark.table(s"$db.$table")
    val ts = s"$db.${tombstoneTable(table)}"
    if (spark.catalog.tableExists(ts)) {
      val dead = broadcast(spark.table(ts))
      idx.join(dead,
        idx("doc_id") === dead("doc_id") && idx("batch") <= dead("as_of"),
        "left_anti")
    } else idx
  }

  /** Fold tombstones into the index: rewrite the LIVE view into a
    * staged bucketed table, then swap via rename-out / rename-in /
    * drop-old — the corpus-sized write happens entirely off to the
    * side, and at EVERY instant either the old or the new table data
    * exists under a well-known name: a crash between the renames
    * leaves the previous index intact under `<table>_old` (recovery =
    * one rename, never a rebuild), a crash before the first rename
    * leaves the index untouched with an orphan staging table the next
    * compaction overwrites. Single-writer maintenance (tombstones
    * appended CONCURRENTLY with a running compaction would be folded
    * out by the final truncate — don't do that without a transactional
    * metastore). Run when the tombstone sliver or the accumulated
    * per-batch appended files warrant it — the same economics as any
    * lakehouse compaction. */
  def compactBandIndex(spark: org.apache.spark.sql.SparkSession,
      db: String, table: String, numBuckets: Int = 8): Unit = {
    import spark.implicits._
    requireIndexNames(db, table)
    val staged = s"${table}_staged"
    val old = s"${table}_old"
    // crash recovery BEFORE any destructive step: a previous compaction
    // that died between its two renames left the only live copy under
    // <table>_old — restore it; if both exist, the previous run died
    // after its second rename and _old is a stale leftover
    if (!spark.catalog.tableExists(s"$db.$table")
        && spark.catalog.tableExists(s"$db.$old")) {
      spark.sql(s"ALTER TABLE $db.$old RENAME TO $db.$table")
    } else if (spark.catalog.tableExists(s"$db.$old")) {
      spark.sql(s"DROP TABLE $db.$old")
    }
    spark.sql(s"DROP TABLE IF EXISTS $db.$staged")
    liveBandIndex(spark, db, table)
      .write
      .bucketBy(numBuckets, "bk")
      .sortBy("bk")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"$db.$staged")
    spark.sql(s"ALTER TABLE $db.$table RENAME TO $db.$old")
    spark.sql(s"ALTER TABLE $db.$staged RENAME TO $db.$table")
    spark.sql(s"DROP TABLE $db.$old")
    Seq.empty[(Long, Long)].toDF("doc_id", "as_of").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"$db.${tombstoneTable(table)}")
  }

  private def crossScreen(incomingBands: DataFrame, corpusBands: DataFrame,
      incoming: DataFrame, corpus: DataFrame, n: Int,
      threshold: Double): DataFrame = {
    // candidate cross pairs: one equi-join on (band, band-key); persisted
    // because both verification semi-joins and the final join consume it
    val pairs = incomingBands
      .select(col("doc_id").as("new_id"), col("band"), col("bk"))
      .join(corpusBands
        .select(col("doc_id").as("corpus_id"), col("band"), col("bk")),
        Seq("band", "bk"))
      .select(col("new_id"), col("corpus_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r16: hashed candidate sets — the nearDuplicates rationale (int64
    // fingerprints through the verification joins, count-exact under an
    // injective hash)
    val setsNew = shingleSetsHashed(spread(incoming.join(
        pairs.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_semi")), n)
      .select(col("doc_id").as("new_id"), col("shset").as("seta"),
        col("n_sh").as("na"))
    val setsCorp = shingleSetsHashed(spread(corpus.join(
        pairs.select(col("corpus_id").as("doc_id")), Seq("doc_id"), "left_semi")), n)
      .select(col("doc_id").as("corpus_id"), col("shset").as("setb"),
        col("n_sh").as("nb"))
    pairs.join(setsNew, "new_id").join(setsCorp, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        size(array_intersect(col("seta"), col("setb"))).as("i"),
        col("na"), col("nb"))
      .select(col("new_id"), col("corpus_id"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // cross-band dedup deferred to the verified (tiny) output, as in
      // nearDuplicates
      .distinct()
  }

  /** Per-document shingle novelty (the "how much of this doc is new
    * text" curation signal, RefinedWeb/C4 style): each distinct char
    * n-gram shingle is owned by the lowest doc_id containing it; a
    * document's novelty is the fraction of its shingles it owns.
    * Returns (doc_id, n_sh, n_novel, novelty). Exact integer counts, one
    * IEEE754 division — hash-stable across engines.
    *
    * Scale: per-document shingle dedup happens MAP-SIDE (the same
    * imperative [[shingleSets]] pass the verification path uses), so the
    * only corpus-scale exchange is the shingle-keyed window that decides
    * ownership; the per-doc rollup then shuffles already-reduced doc
    * rows with map-side combine. This is the honest corpus-wide cost of
    * any first-occurrence semantic; at 100 TB the shingle shuffle is
    * what you pay for exact novelty, and the banded/bucketed
    * [[nearDuplicates]] path is the approximation to reach for when you
    * only need pairwise dups. */
  def shingleNovelty(docs: DataFrame, n: Int = 8): DataFrame = {
    // persisted: the per-doc shingle-set computation (the dominant cost)
    // feeds BOTH the ownership branch and the n_sh side — without the
    // cache Spark evaluates the two subtrees independently and the
    // member-scale pass runs twice (same pattern as nearDuplicates'
    // signatures-only persist). HASHED sets: ownership only needs
    // shingle identity, so the corpus-sized explode+shuffle carries
    // int64 fingerprints, not n-char strings (see shingleSetsHashed).
    val base = shingleSetsHashed(spread(docs), n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One corpus-sized shuffle total: the ownership question ("which doc
    // first used this shingle?") is a hash-aggregated min per shingle —
    // partial (map-side) min, then ONE row per distinct shingle through
    // the wire. A window over partitionBy(s) would shuffle the same rows
    // but then SORT every partition and carry full rows back out to a
    // per-doc re-aggregation; the agg form replaces that second
    // corpus-sized pass with a doc-count-sized one (owners → n_novel).
    // Per-doc totals ride along from shingleSets' precomputed n_sh —
    // no exchange at all on that side.
    val novel = base.select(col("doc_id"), explode(col("shset")).as("s"))
      .groupBy(col("s")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    base.select(col("doc_id"), col("n_sh").cast("long").as("n_sh"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_sh"))
          .as("novelty"))
  }

  /** Connected components over an undirected edge list, with an
    * AQE-style adaptive choice of algorithm:
    *
    *  - **Bounded driver union-find** when the distinct edge set fits
    *    `driverEdgeLimit` (default 2²⁰ pairs ≈ 16 MB of longs — the same
    *    order as a broadcast-join side, and the same "bounded driver
    *    data" budget as the per-partition-subtotal pattern elsewhere in
    *    the engine). Near-dup edge sets are the DUPLICATED sliver of a
    *    corpus — rare by construction on curated data — so this is the
    *    common case at every scale, and it replaces ~10 scheduled jobs
    *    of iteration machinery with one collect (measured: 0.84 s → ms
    *    at sf0.1's 256 edges).
    *  - **Iterative min-label propagation** otherwise (boilerplate-heavy
    *    corpora where the dup graph is corpus-sized): every node starts
    *    as its own component and adopts the minimum label among itself
    *    and its neighbors each round; fixpoint = components labeled by
    *    their minimum node id. Each round is one equi-join + one hash
    *    aggregation — both shuffle on node id, AQE handles skewed hubs.
    *    Rounds = graph diameter (near-dup graphs: 2-3). For adversarial
    *    long-chain graphs the alternating large-star/small-star
    *    algorithm (Kiveris et al., "Connected Components in MapReduce
    *    and Beyond", SoCC'14) drops rounds to O(log n) with the same
    *    per-round join shape. [[graft.core.Stage]] truncates per-round
    *    lineage (durably when a checkpoint dir is set); convergence is a
    *    scalar count, never a label collect.
    *
    * Both paths produce the identical min-label fixpoint (spec-asserted
    * against each other on real data).
    */
  /** The persisted symmetric edge frame for label propagation, built
    * from the deduped HALF frame (src < dst): the two directions are
    * disjoint, so the symmetrizing union needs no second distinct, and
    * when `half` is already cached (the probe materialized it) both
    * branches are cache-local — the caller's dup-edge pipeline never
    * re-executes. Re-clustered by src AFTER the union: the dedup
    * exchange hashes on (src, dst), which does NOT satisfy the
    * per-iteration join's src clustering, so without the explicit
    * repartition every round would re-shuffle the EDGE-SIZED frame out
    * of the cache (the round-8 PageRank finding, same class). One extra
    * build-time exchange buys an iteration loop whose only per-round
    * movement is node-sized; the cached clustering is visible to the
    * planner via InMemoryTableScan. Package-visible so PlanAuditSpec
    * pins the shape. */
  private[graft] def ccEdges(half: DataFrame): DataFrame =
    half.select(col("src"), col("dst"))
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** One label-propagation round's candidate frame: the rank join on
    * src (exchange-free against [[ccEdges]]'s clustering) feeding the
    * node-keyed min-label aggregation — the round's node-sized
    * shuffle. */
  private[graft] def ccCand(e: DataFrame, labels: DataFrame): DataFrame =
    e.join(labels, e("src") === labels("id"))
      .select(col("dst").as("id"), col("comp").as("cand"))
      .groupBy(col("id")).agg(min(col("cand")).as("cand"))

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 50, driverEdgeLimit: Int = 1 << 20): DataFrame = {
    // one undirected edge per pair, persisted: the size probe
    // materializes it with ONE run of the caller's dup-edge pipeline
    // (an LSH verify — the expensive part), and every later consumer in
    // EITHER path (the fast-path collect; the distributed symmetrize /
    // touched-node distinct) reads the cache. The previous
    // limit(n+1).collect() probe paid a full extra pipeline run plus a
    // wasted limit-sized transfer whenever the graph turned out big —
    // the Graph.pageRank round-9 finding, same class. Self-loops are
    // dropped up front: a node adopting its own label is a no-op in
    // both paths (and the driver union-find treated them so already).
    val half = edges
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EVERYTHING from the first action on runs inside the try: a failure
    // during the probe count or the distributed pre-loop (symmetrize,
    // touched-node Stage) must not pin the persist in the session cache
    try {
    val nEdges = half.count()
    if (nEdges <= driverEdgeLimit) {
      val probe = half.collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root — the fixpoint labels the iterative path finds
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val spark = nodes.sparkSession
      import spark.implicits._
      val labelRows = {
        import scala.jdk.CollectionConverters._
        parent.keySet().asScala.iterator.map(id => (id, find(id))).toSeq
      }
      val labels = labelRows.toDF("id", "comp")
      val touchedIds = labelRows.map(_._1).toDF("id")
      val singles = nodes.join(broadcast(touchedIds), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp"))
      return labels.union(singles)
    }
    val e = ccEdges(half)
    // propagate over edge-INCIDENT nodes only: a node with no edges can
    // never receive a smaller label, so the iteration never needs to
    // carry it. In a near-dup graph the incident set is the duplicated
    // sliver of the corpus — orders of magnitude smaller than the node
    // set — and every per-iteration join, aggregate and convergence
    // check shrinks with it. Singletons rejoin as comp = id at the end
    // (one anti-join, no iteration).
    try {
      // materialized (tiny): referenced after e is unpersisted
      val touched = graft.core.Stage(
        e.select(col("src").as("id")).distinct())
      var labels = graft.core.Stage(
        touched.select(col("id"), col("id").as("comp")))
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        // min-label propagation with the convergence indicator computed IN
        // the same pass: least(old, min(neighbor label)) per node, plus a
        // `changed` flag — the separate next⋈labels convergence join the
        // previous shape paid per iteration is a filter over the frame the
        // checkpoint just materialized.
        val cand = ccCand(e, labels)
        val next = graft.core.Stage(labels.join(cand, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"),
            (coalesce(col("cand"), col("comp")) < col("comp")).as("changed")))
        converged = next.filter(col("changed")).limit(1).count() == 0L
        labels = next.select(col("id"), col("comp"))
        iter += 1
      }
      val singles = nodes.join(touched, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp"))
      labels.union(singles)
    } finally e.unpersist()
    } finally half.unpersist(false)
  }

  /** Near-duplicate clusters: LSH-verified Jaccard pairs as edges,
    * connected components as cluster ids (minimum doc_id in the
    * component), `keep` marking the canonical representative. Documents
    * with no near-duplicate form singleton clusters of themselves. */
  def duplicateClusters(docs: DataFrame, n: Int = 8, threshold: Double = 0.2,
      k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val pairs = nearDuplicates(docs, n, threshold, k, rowsPerBand)
      .select(col("a"), col("b"))
    val comps = connectedComponents(
      docs.select(col("doc_id").as("id")), pairs)
    comps.select(col("id").as("doc_id"), col("comp").as("cluster_id"),
      (col("id") === col("comp")).as("keep"))
  }

  /** Survivorship over near-duplicate clusters: instead of
    * [[duplicateClusters]]' lowest-id canonical, keep each cluster's
    * HIGHEST-QUALITY member (quality desc, doc_id asc tiebreak) — the
    * policy an actual corpus build wants, where the canonical copy
    * should be the longest/cleanest one, not the earliest-crawled.
    * Returns (doc_id, cluster_id, keep_id, keep).
    *
    * Scale: clustering cost is [[duplicateClusters]]'; the policy adds
    * one doc_id-keyed join to attach the quality column and one
    * cluster-keyed window to elect the champion — both AQE-managed
    * exchanges, no driver participation. */
  def survivorship(docs: DataFrame, qualityCol: String = "n_chars",
      n: Int = 8, threshold: Double = 0.2, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame = {
    val clusters = duplicateClusters(docs, n, threshold, k, rowsPerBand)
      .select(col("doc_id"), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(qualityCol).desc, col("doc_id").asc)
    clusters.join(docs.select(col("doc_id"), col(qualityCol)), "doc_id")
      .withColumn("keep_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_id"), col("keep_id"),
        (col("doc_id") === col("keep_id")).as("keep"))
  }

  /** 32-bit SimHash over distinct whitespace tokens: per bit, the sign of
    * the +1/-1 vote sum; all engine-portable integer math.
    *
    * The 32 bit-votes are 32 parallel sum() COLUMNS (not a 32× row
    * explosion): partial aggregation shuffles one 32-int row per doc. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("doc_id"), h32(col("tok")).as("h"))
    val voteCols = (0 until 32).map(j =>
      sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), 1L).otherwise(-1L))
        .as(s"v$j"))
    val votes = toks.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val hash = (0 until 32)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("doc_id"), hash.as("simhash"))
  }

  /** C4-style passage-level exact dedup: cut each document into
    * non-overlapping `width`-token passages, keep only the globally FIRST
    * occurrence of each distinct passage (ordered by (doc_id, position)),
    * and reconstruct the surviving text per document.
    *
    * Scale shape: one shuffle, hash-partitioned by passage content (the
    * row_number window); passages are bounded-size strings so the state
    * per key is tiny, and skew is impossible unless one literal passage
    * dominates the corpus — in which case the win condition (rn=1) is
    * still a single-pass top-1 per key, not a collect. The reconstruction
    * groups by doc_id — a second shuffle of only the SURVIVING passages.
    */
  def passageDedup(docs: DataFrame, width: Int = 8): DataFrame = {
    val chunks = spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        explode(sequence(lit(0), ((size(col("tk")) - 1) / width).cast("int")))
          .as("pos"),
        col("tk"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("tk"), col("pos") * width + 1, lit(width)))
          .as("passage"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("passage")).orderBy(col("doc_id"), col("pos"))
    val kept = chunks
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") === 1)
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("passage"))))),
          t => t.getField("passage"))).as("kept_text"))
  }

  /** Exact duplicate-SPAN detection (the suffix-array dedup of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22, re-expressed relationally): find maximal token spans that
    * occur more than once anywhere in the corpus — including twice within
    * one document — and report every span of at least `minSpan` tokens.
    * Whole-doc and paragraph dedup miss these (a licence header pasted
    * mid-document, a boilerplate nav block); span-level detection is what
    * lets a pipeline CUT the duplicated run and keep the novel remainder.
    *
    * Relational shape instead of a suffix array: every `k`-token window
    * gets a rolling fingerprint (md5-derived h32 of the joined window —
    * position-exact, no false merges beyond hash collision); a corpus-
    * wide count marks fingerprints occurring ≥2 times; each document
    * then merges its duplicated positions into maximal spans with a
    * gaps-and-islands window (a new island starts where a duplicated
    * window begins past every previous window's reach). A span of L
    * duplicated tokens yields L−k+1 consecutive duplicated windows, so
    * span length = island extent + k − 1 and `minSpan ≥ k` is exact.
    *
    * Scale: the k-gram stream shuffles twice on the fingerprint — once
    * to count (map-side combined), once to join the duplicated set back
    * (both AQE-skew-safe equi-ops; the duplicated sliver is tiny next to
    * the corpus) — then once per doc for the island window. Nothing is
    * collected; no all-pairs anything. The suffix-array formulation
    * needs a global sort of every suffix — THIS shape is the one that
    * distributes.
    *
    * @return (doc_id, span_id, start_tok, end_tok, n_toks) — 1-based
    *         inclusive token positions, span_id numbering the doc's
    *         spans in order. */
  /** The rolling k-gram fingerprint frame (doc_id, p, kg — three longs):
    * slice + concat + md5 per token position, the dominant CPU of the
    * span operators. Deliberately NOT persisted: the barrier was
    * measured ~14% SLOWER than letting the dup-count and position-join
    * consumers re-pipeline it (ProfileQ127 — recompute beats
    * materialize at this row width). */
  private def gramFrame(docs: DataFrame, k: Int): DataFrame =
    spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1),
          greatest(size(col("tk")) - (k - 1), lit(1)))).as("p"))
      .filter(col("p") + (k - 1) <= size(col("tk")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        h32(concat_ws(" ", slice(col("tk"), col("p"), lit(k)))).as("kg"))

  def duplicateSpans(docs: DataFrame, k: Int = 5,
      minSpan: Int = 10): DataFrame =
    spansOfGrams(gramFrame(docs, k), k, minSpan)

  private def spansOfGrams(grams: DataFrame, k: Int,
      minSpan: Int): DataFrame = {
    require(minSpan >= k, s"minSpan ($minSpan) must be >= window k ($k)")
    val w = org.apache.spark.sql.expressions.Window
    val dup = grams.groupBy(col("kg"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("kg"))
    // The join-back is PINNED to a shuffled hash join — the second of
    // the two fingerprint shuffles this operator's contract budgets.
    // Unhinted, AQE broadcasts the dup set whenever it sizes under the
    // threshold, and at the sf10 anchor that was measured both SLOWER
    // and unstable (6.4–19.8 s vs 4.4–4.9 s hinted; the driver collect
    // + ~50 MB torrent build per run is the variance, ProfileQ125Sf10)
    // — and at 100 TB the dup sliver outgrows any broadcast anyway, so
    // the hinted plan is also the only shape that survives scale-up.
    val dupPos = grams.join(dup.hint("shuffle_hash"), "kg")
      .select(col("doc_id"), col("p"))
    val byDoc = w.partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = dupPos
      // a window reaches tokens [p, p+k-1]; a new island starts where p
      // lies past the furthest reach of every earlier duplicated window
      .withColumn("prev_reach", max(col("p") + (k - 1))
        .over(byDoc.rowsBetween(w.unboundedPreceding, -1)))
      .withColumn("fresh",
        when(col("prev_reach").isNull || col("p") > col("prev_reach"), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("fresh")).over(byDoc))
    islands.groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("p")).as("start_tok"),
        (max(col("p")) + (k - 1)).as("end_tok"))
      .select(col("doc_id"), col("span_id"), col("start_tok"),
        col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_toks"))
      .filter(col("n_toks") >= minSpan)
  }

  /** The actionable half of [[duplicateSpans]]: CUT every detected
    * duplicate span out of each document and reconstruct the remainder —
    * the Lee et al. pipeline's actual output (they drop the repeated
    * 50-token runs, not the documents). Returns every document:
    * (doc_id, n_tok, n_removed, clean_text), n_removed = 0 and the
    * original token stream for untouched docs, empty clean_text for
    * fully-duplicated ones.
    *
    * Scale: spans per doc are few and bounded (they are ≥minSpan-token
    * runs), so the coverage join is a doc-keyed equi-join with a range
    * residual — never position × corpus. The reconstruction groups the
    * SURVIVING tokens per doc (one doc-keyed shuffle, same shape as
    * passageDedup's rebuild). */
  def stripDuplicateSpans(docs: DataFrame, k: Int = 5,
      minSpan: Int = 10): DataFrame = {
    // spans collected per doc: a ≥minSpan-run-bearing sliver of the
    // corpus, each doc carrying its few (start,end) ranges
    val spans = duplicateSpans(docs, k, minSpan)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sp"))
    // Rebuild MAP-SIDE: join the span lists back (unhinted — AQE
    // broadcasts the typical sparse-span case and keeps a shuffle join
    // when half the corpus carries spans, the nearDuplicates semi-join
    // rule), then strip covered tokens in ONE imperative typed pass per
    // row (r15; the signaturesOnly mapPartitions precedent). The prior
    // declarative rebuild ran interpreted higher-order lambdas —
    // sequence + struct-per-token + exists() per token × span — and was
    // measured 19% slower end-to-end at sf0.1 (ProfileQ127 variant 12:
    // 1.76 s → 1.43 s); the kernel is the same coverage test without
    // per-token allocation. Tokenization is exactly tokens():
    // split(trim(x), "\s+") with Spark's keep-trailing-empties limit.
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("sp"), expr("array()")).as("sp"))
      .as[(Long, String, Seq[(Long, Long)])]
      .mapPartitions { rows =>
        val ws = java.util.regex.Pattern.compile("\\s+")
        rows.map { case (id, text, sp) =>
          // Spark-trim semantics: strip SPACES only (Java String.trim
          // strips all ≤ U+0020) — the ngramXxhashOf port, so the kernel
          // tokenizes \t/\n-edged texts exactly like the declarative
          // tokens() form (OpsSpec pins it)
          var s0 = 0
          var e0 = text.length
          while (s0 < e0 && text.charAt(s0) == ' ') s0 += 1
          while (e0 > s0 && text.charAt(e0 - 1) == ' ') e0 -= 1
          val tk = ws.split(text.substring(s0, e0), -1)
          val n = tk.length.toLong
          val sb = new java.lang.StringBuilder
          var kept = 0L
          var pos = 1L
          var i = 0
          while (i < tk.length) {
            var covered = false
            val it = sp.iterator
            while (!covered && it.hasNext) {
              val s = it.next()
              if (pos >= s._1 && pos <= s._2) covered = true
            }
            if (!covered) {
              if (kept > 0L) sb.append(' ')
              sb.append(tk(i)); kept += 1L
            }
            pos += 1L; i += 1
          }
          (id, n, n - kept, sb.toString)
        }
      }
      .toDF("doc_id", "n_tok", "n_removed", "clean_text")
  }

  /** SimHash near-dup pairs within a Hamming radius: OR-banded candidate
    * generation — each doc enters TWO 16-bit buckets (high half, low
    * half), pairs colliding in EITHER band are candidates (union,
    * deduped), and the exact Hamming filter verifies. A pair whose ≤6
    * differing bits all fall in one half is guaranteed caught by the
    * other band; diffs split across both halves can still be missed —
    * full recall at radius h needs h+1 bands of 32/(h+1) bits (pigeonhole),
    * which this banding generalizes to. The join stays an equi-join on
    * (band, bucket) — band-limited, AQE-skew-safe, never all-pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    // persisted: BOTH sides of the banded self-join read it, and
    // without the barrier Spark recomputes the whole simhash subtree
    // (token explode + distinct + 32-column vote aggregate) twice —
    // ProfileQ47 measured 0 ReusedExchange and the full operator at
    // ~3× the simhash pass alone. The frame is one 16-byte row per
    // doc (the nearDuplicates signatures-persist pattern).
    val sh = simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(expr("shiftright(simhash, 16)"),
        expr("simhash & 65535"))).as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)").as("hamming"))
      // a pair can collide in both bands; hamming is pair-determined so
      // the distinct is exactly pair-dedup
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** CONTAINMENT near-duplicate pairs: pairs where the smaller
    * document's shingle set is ≥`tau` contained in the other's —
    * C(A,B) = |A∩B| / min(|A|,|B|). Catches the subset relations
    * symmetric Jaccard structurally under-scores (a tweet quoted inside
    * an article: containment 1.0, Jaccard ≈ |tweet|/|article| ≈ 0), the
    * other standard dedup screen next to [[nearDuplicates]].
    *
    * Same scale shape as nearDuplicates: banded LSH candidates, exact
    * verification on candidate docs only. Note the candidate generator
    * is MinHash — an estimator of JACCARD — so high-containment pairs
    * with tiny Jaccard can escape banding (inherent to MinHash
    * containment screens; a containment-complete generator needs
    * size-stratified banding). Pairs that do band-collide are verified
    * with EXACT containment. */
  def containmentPairs(docs: DataFrame, n: Int = 8, tau: Double = 0.9,
      k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val sig = signaturesOnly(docs, n, k)
    val pairs = rawPairsFromBands(sig, k, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id")))
    // hashed candidate sets (the nearDuplicates r16 rationale)
    val sets = shingleSetsHashed(
      spread(docs.join(candIds, Seq("doc_id"), "left_semi")), n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sa = sets.select(col("doc_id").as("a"), col("shset").as("seta"),
      col("n_sh").as("na"))
    val sb = sets.select(col("doc_id").as("b"), col("shset").as("setb"),
      col("n_sh").as("nb"))
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("seta"), col("setb"))).as("i"),
        col("na"), col("nb"))
      .select(col("a"), col("b"),
        (col("i").cast("double") / least(col("na"), col("nb")))
          .as("containment"))
      .filter(col("containment") >= tau)
      .distinct()
  }

  /** Sketch-calibration report: how well the MinHash signature's
    * estimated Jaccard tracks the EXACT n-gram Jaccard, measured on the
    * LSH candidate pairs themselves — the go/no-go diagnostic before
    * trusting a (k, rowsPerBand) configuration on a new corpus.
    *
    * Output: one row per estimate decile — candidate-pair count, mean
    * estimated and mean exact similarity, and the mean |est − exact|
    * calibration error. A well-sized sketch shows mean_est ≈ mean_exact
    * per bucket; a too-small k shows fat error and off-diagonal mass.
    *
    * Shape at scale: candidate generation is the banded path (never
    * all-pairs); exact verification recomputes shingle sets for
    * CANDIDATE docs only (the `nearDuplicates` pattern); the report is
    * a ≤`buckets`-row aggregate. Determinism: per-pair similarities are
    * rounded to ppm int64 BEFORE the bucket sums (the
    * unigramCrossEntropy rule — never sum raw doubles in shuffle
    * order), so bucket means are IEEE divisions of exact integers. */
  def minhashCalibration(docs: DataFrame, n: Int = 8, k: Int = 12,
      rowsPerBand: Int = 3, buckets: Int = 10): DataFrame = {
    val sig = signaturesOnly(docs, n, k)
    val cand = candidatesFromSignatures(sig, k, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id")))
    // persisted (the containmentPairs pattern, r15): BOTH verification
    // sides (sa, sb) read this frame, and without the barrier each side
    // re-runs the semi-join + per-candidate shingling pass — the q151
    // before-plan carried the subtree twice. Hashed (r16): the
    // nearDuplicates rationale.
    val sets = shingleSetsHashed(
      spread(docs.join(candIds, Seq("doc_id"), "left_semi")), n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sa = sets.select(col("doc_id").as("a"), col("shset").as("seta"),
      col("n_sh").as("na"))
    val sb = sets.select(col("doc_id").as("b"), col("shset").as("setb"),
      col("n_sh").as("nb"))
    val exact = cand.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"), col("est_sim"),
        size(array_intersect(col("seta"), col("setb"))).as("i"),
        col("na"), col("nb"))
      .select(col("est_sim"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
    exact
      .select(
        least(floor(col("est_sim") * buckets), lit(buckets - 1))
          .cast("long").as("bucket"),
        round(col("est_sim") * 1e6).cast("long").as("est_ppm"),
        round(col("jaccard") * 1e6).cast("long").as("j_ppm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("est_ppm")).cast("double") / count(lit(1)) / 1e6)
          .as("mean_est"),
        (sum(col("j_ppm")).cast("double") / count(lit(1)) / 1e6)
          .as("mean_exact"),
        (sum(abs(col("est_ppm") - col("j_ppm"))).cast("double")
          / count(lit(1)) / 1e6).as("mean_abs_err"))
  }

  /** EXACT-threshold set-similarity self-join (the All-Pairs / PPJoin
    * family — Bayardo et al. WWW'07, Xiao et al. WWW'08): every unordered
    * document pair whose whitespace-token-set Jaccard ≥ tauNum/tauDen,
    * with NO false negatives — the deterministic complement to the
    * probabilistic MinHash/LSH path (reference dedup intent:
    * serverless_processing_iceberg/main.py:64-74 dedups exact keys; this
    * is the similarity generalization a curation pipeline needs).
    *
    * Candidate generation is SYMMETRIC prefix filtering under a global
    * canonical token order (ascending document frequency, ties by
    * token): each doc explodes only its first n−⌈τ·n⌉+2 canonical
    * tokens and candidates are prefix×prefix equi-joins (completeness
    * proof at the join site — the +1 over the classic prefix is what
    * makes the symmetric form exact; the classic length is complete
    * only against full postings). Rare-first ordering keeps prefix
    * postings short; the symmetric length filter
    * τ·max(|x|,|y|) ≤ min(|x|,|y|) prunes candidates at join time; the
    * threshold test itself is exact integer math (tauDen·i ≥ tauNum·u).
    *
    * Scale (100 TB): token-keyed equi-joins only (df count, df attach,
    * prefix×prefix) — map-side-combined aggregations and AQE-splittable
    * shuffles; candidate volume is Σ_tok |prefix postings|², kept
    * subquadratic by rare-first prefixes and a ~|doc|/|prefix| factor
    * below the prefix×full form (measured 2× end-to-end at sf0.1);
    * verification is a pair-keyed join on bounded token arrays. No step
    * is O(n²) in documents. */
  def setSimJoin(docs: DataFrame, tauNum: Long = 4L, tauDen: Long = 5L)
      : DataFrame =
    setSimJoinSets(docs.select(col("doc_id"),
      array_distinct(tokens(col("text"))).as("tk")), tauNum, tauDen)

  /** [[setSimJoin]] over a pre-built set column: `sets` is
    * (doc_id, tk: array&lt;string&gt;) where `tk` is each document's
    * DISTINCT element set — unigram tokens, n-gram shingles, category
    * tags, whatever the caller's similarity domain is. The element
    * choice decides the join's selectivity: on this corpus's 31-token
    * vocabulary unigrams make τ=0.8 similarity DENSE (≈25% of all pairs
    * match — output-bound for any engine, see SCALING.md), while 2-gram
    * shingles over the same text are sparse and the prefix filter does
    * its job. */
  def setSimJoinSets(sets0: DataFrame, tauNum: Long = 4L, tauDen: Long = 5L)
      : DataFrame = {
    // fan a few-file input across cores first — everything downstream
    // (explode, df join, candidate join) inherits this parallelism
    val sets = spread(sets0)
    val posts = sets.select(col("doc_id"), explode(col("tk")).as("tok"))
    val dfc = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // canonical per-doc token order: (df asc, tok asc). PERSISTED: the
    // frame feeds four consumers (prefix explode, full-postings explode,
    // and both verification sides) — without the cache each consumer
    // re-runs the explode + df-count + sort-collect subtree (same
    // pattern as shingleNovelty's base persist). One row per doc.
    val lists = posts.join(dfc, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"),
        expr("transform(st, x -> x.tok)").as("tk"),
        size(col("st")).cast("long").as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SYMMETRIC prefix join (PPJoin-style), prefix length
    // n − ⌈τ·n⌉ + 2 (exact integer ceil-div, capped at n). Completeness:
    // sort both docs by the global canonical order and suppose the two
    // prefixes are DISJOINT; let m be the smaller of the two prefix-max
    // order positions, say x's. Every common token with order < m would
    // lie in BOTH prefixes (any x-token below x's prefix max is in x's
    // prefix, and its order is also below y's prefix max), so all
    // common tokens have order ≥ m — they fit in x's suffix plus its
    // last prefix slot: o ≤ n_x − p_x + 1 = ⌈τ·n_x⌉ − 1 < τ·n_x. But
    // J ≥ τ with the length filter forces o ≥ τ·n_x — contradiction.
    // (The classic |x|−⌈τ|x|⌉+1 prefix is complete only against FULL
    // postings; the +1 buys the symmetric form, and prefix×prefix
    // probes ~|prefix|/|doc| of the posting volume the prefix×full
    // join paid.)
    val ceilTauN =
      floor((lit(tauNum) * col("n") + lit(tauDen - 1)) / lit(tauDen))
    val prefLen = least(col("n"), col("n") - ceilTauN + 2).cast("int")
    val pref = lists.select(col("doc_id").as("p_id"), col("n").as("p_n"),
      explode(slice(col("tk"), lit(1), prefLen)).as("tok"))
    // the probe side renames ALL columns (including the join token) so
    // the condition is a plain two-attribute equi-join — comparing
    // pref("tok") to a same-lineage "tok" relies on Spark's self-join
    // disambiguation and logs a trivially-true-predicate warning
    val prefB = pref.select(col("p_id").as("f_id"), col("p_n").as("f_n"),
      col("tok").as("f_tok"))
    val cand = pref.join(prefB,
        col("tok") === col("f_tok") && col("p_id") < col("f_id")
          && lit(tauNum) * greatest(col("p_n"), col("f_n"))
             <= lit(tauDen) * least(col("p_n"), col("f_n")))
      .select(col("p_id").as("a"), col("f_id").as("b"))
      .distinct()
    cand
      .join(lists.select(col("doc_id").as("a"), col("tk").as("tka"),
        col("n").as("na")), Seq("a"))
      .join(lists.select(col("doc_id").as("b"), col("tk").as("tkb"),
        col("n").as("nb")), Seq("b"))
      .withColumn("inter",
        size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("uni"))
      .select(col("a"), col("b"), col("na"), col("nb"), col("inter"),
        round(col("inter").cast("double") / col("uni"), 6).as("jac"))
  }

  /** C4-style "fuzzy-exact" dedup: normalize (lowercase, strip
    * punctuation to spaces, collapse whitespace, trim), fingerprint the
    * normalized text, keep the FIRST occurrence (min doc_id) of each
    * fingerprint. This is the normalization-then-exact-hash step of the
    * C4 / RefinedWeb pipelines — it collapses trivially-reformatted
    * copies that byte-exact dedup ([[exactDedup]]) misses, without
    * paying near-dup candidate generation.
    *
    * Returns one row per input document:
    * (doc_id, norm_fp, keep_id, n_copies, is_dup).
    *
    * Shape at scale: normalization + md5 are map-side; the keep-first
    * and group-size stats are ONE window over the fp-keyed exchange
    * (no groupBy + join-back second shuffle). Per-fp group size is the
    * duplication factor of one normalized text — bounded in any real
    * corpus, so the window never sees a giant partition. */
  def normalizedDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("norm_fp"))
    docs.select(col(idCol).as("doc_id"),
        md5(trim(regexp_replace(
          regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", " "),
          "\\s+", " "))).as("norm_fp"))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
  }

  /** Sorted-neighborhood entity-resolution pairs (Hernández & Stolfo
    * 1995): sort the corpus by a blocking key, compare each record only
    * against its `w` neighbors in the sorted order, verify candidates
    * with exact token-set Jaccard. The classic complement to LSH
    * blocking ([[lshCandidates]]): O(N·w) comparisons with a
    * user-chosen sort key instead of probabilistic buckets.
    *
    * Returns (a, b, rank_gap, jac) for neighbor pairs with
    * Jaccard ≥ tauNum/tauDen, a < b in sort order.
    *
    * Shape at scale — the global sort rank WITHOUT a single-partition
    * window (the [[graft.ops.Curation.packSequences]] two-phase
    * pattern): range-partition by the key, count rows per partition,
    * prefix-scan the ~numPartitions subtotals on the driver, broadcast
    * the offsets back, and rank only WITHIN partitions. The neighbor
    * self-join then never materializes rank ranges on one node either:
    * ranks are bucketed at width `w`, the left side replicated to its
    * home and successor bucket, joined bucket-equi on the right's home
    * bucket — every |Δrank| ≤ w pair appears exactly once (the
    * [[graft.ops.Temporal]] canonical-bucket attribution trick on rank
    * space), and the shuffle key is the bucket, never the pair. */
  def sortedNeighborhood(docs: DataFrame, w: Int = 4,
      tauNum: Long = 1L, tauDen: Long = 2L, keyLen: Int = 16): DataFrame = {
    require(w >= 1, "window w must be >= 1")
    val spark = docs.sparkSession
    // null text is excluded up front: a null blocking key would rank
    // NULLS FIRST in Spark but NULLS LAST in most SQL engines, silently
    // shifting every neighbor window by the null count.
    //
    // STAGED, not persisted: spark_partition_id is only meaningful for
    // ONE materialization, and three consumers observe it (subtotal
    // count, rank window, pair join) — the last one AFTER this function
    // returns. A persist + finally-unpersist here would let the
    // returned lazy plan recompute the range exchange from scratch,
    // and RangePartitioner's sampling seed derives from the (new) RDD
    // id, so recomputed partition bounds can differ from the ones the
    // offsets were computed from — silently shifting every global rank.
    // Stage() materializes eagerly and cuts lineage, so every consumer
    // reads the same blocks.
    // r16: token sets are FINGERPRINTED to int64 (xxhash64) before the
    // range exchange — identity is all the verification intersect and
    // size counts need (jac values are exactly preserved under an
    // injective hash, the shingleSetsHashed rationale), and longs
    // through the range exchange, the Stage checkpoint, the window
    // carry and both join sides beat token strings. The per-token
    // lambda runs once per doc map-side, ahead of everything.
    val keyed = graft.core.Stage(
      spread(docs.where(col("text").isNotNull))
        .select(col("doc_id"),
          substring(regexp_replace(lower(col("text")), "\\s+", ""), 1,
            keyLen).as("bkey"),
          transform(array_distinct(tokens(col("text"))),
            t => xxhash64(t)).as("tk"))
        .repartitionByRange(col("bkey"), col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val subtotals = keyed.groupBy(col("pid"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subtotals.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.tail.zip(subtotals).map { case ((pid, cumIncl), (_, c)) =>
      (pid, cumIncl - c)
    }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("pid", "offset")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("bkey"), col("doc_id"))
    // persisted (r16): BOTH neighbor-join sides read the ranked frame,
    // and without the barrier each side re-runs the pid exchange + sort
    // + row_number window over the whole corpus (the r16 before-plan
    // carried the Window subtree twice). One corpus-sized pass saved at
    // any scale; registered in the session cache like nearDuplicates'
    // persists (the bench clears it between runs).
    val ranked = keyed.join(broadcast(offsetDf), "pid")
      .withColumn("r", row_number().over(win) + col("offset") - 1)
      .select(col("doc_id"), col("tk"), col("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // neighbor join on rank buckets of width w: pair (ra < rb,
    // rb − ra ≤ w) has floor(rb/w) ∈ {floor(ra/w), floor(ra/w)+1};
    // left emits home+successor, right stays home → exactly one match
    val left = ranked.select(col("doc_id").as("a"), col("tk").as("tka"),
        col("r").as("ra"),
        explode(array(floor(col("r") / w),
          floor(col("r") / w) + 1)).as("bk"))
    val right = ranked.select(col("doc_id").as("b"), col("tk").as("tkb"),
      col("r").as("rb"), floor(col("r") / w).as("bk"))
    left.join(right,
        left("bk") === right("bk") && col("rb") > col("ra")
          && col("rb") - col("ra") <= w)
      .withColumn("inter",
        size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .withColumn("uni",
        size(col("tka")).cast("long") + size(col("tkb")) - col("inter"))
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("uni"))
      .select(col("a"), col("b"), (col("rb") - col("ra")).as("rank_gap"),
        round(col("inter").cast("double") / col("uni"), 6).as("jac"))
  }
}
