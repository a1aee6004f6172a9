package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Curation
import graft.sources.Tables
import Q._

/** Dataset-curation operators (ops/Curation.scala) as oracle-checked
  * queries: deterministic sampling, repetition scoring, identifier
  * masking, sequence packing, benchmark contamination.
  */
object CurationQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  val defs: Map[String, QueryDef] = Map(

    // ---- deterministic hash-bucket sampling, stratified accounting ------
    "q61_sample_stratified" -> QueryDef(
      build = (spark, dir) =>
        Curation.stratifiedSampleCounts(t(spark, dir, "documents"),
            col("lang"), col("doc_id"), pct = 10)
          .orderBy(col("stratum")),
      oracle = Some(s"""
        SELECT lang AS stratum, COUNT(*) AS n_total,
          CAST(SUM(CASE WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
          CAST(SUM(CASE WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10
                   THEN 1 ELSE 0 END) AS BIGINT) * 1.0 / COUNT(*) AS rate
        FROM documents GROUP BY lang ORDER BY stratum""")),

    // ---- Gopher-style repetition / boilerplate signals ------------------
    "q62_repetition_stats" -> QueryDef(
      build = (spark, dir) =>
        Curation.repetitionStats(t(spark, dir, "documents"))
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
        tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY doc_id, tok)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_distinct,
          (CAST(SUM(c) AS BIGINT) - COUNT(*)) * 1.0 / CAST(SUM(c) AS BIGINT)
            AS dup_ratio,
          MAX(c) * 1.0 / CAST(SUM(c) AS BIGINT) AS top_frac
        FROM tc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- identifier masking (digit runs ≥6 → [ID]) ----------------------
    "q63_mask_ids" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "customer")
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            Curation.maskIds(col("c_name")).as("masked_name"),
            Curation.maskedRunCount(col("c_name")).cast("long").as("n_masked"))
          .orderBy(col("c_custkey")),
      oracle = Some("""
        SELECT c_custkey,
          regexp_replace(c_name, '[0-9]{6,}', '[ID]', 'g') AS masked_name,
          CAST(len(regexp_extract_all(c_name, '[0-9]{6,}')) AS BIGINT) AS n_masked
        FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""")),

    // ---- concat-and-chunk sequence packing (two-phase global cumsum) ----
    "q64_pack_sequences" -> QueryDef(
      build = (spark, dir) =>
        Curation.packStats(t(spark, dir, "documents"), budget = 2048)
          .orderBy(col("pack_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, len($tokensSql) AS n_tok FROM documents),
        cs AS (SELECT doc_id, n_tok,
          SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum0
          FROM tk)
        SELECT CAST(floor(cum0 / 2048.0) AS BIGINT) AS pack_id,
          COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM cs GROUP BY pack_id ORDER BY pack_id""")),

    // ---- benchmark-contamination check (shared char-8-gram shingles) ----
    "q65_contamination" -> QueryDef(
      build = (spark, dir) => {
        val docs = t(spark, dir, "documents")
        Curation.contamination(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH shc AS (SELECT DISTINCT doc_id, substr(text, g, 8) AS s
          FROM (SELECT doc_id, text,
                  unnest(generate_series(1, greatest(len(text) - 7, 1))) AS g
                FROM documents WHERE source <> 'src0')),
        shb AS (SELECT DISTINCT substr(text, g, 8) AS s
          FROM (SELECT text,
                  unnest(generate_series(1, greatest(len(text) - 7, 1))) AS g
                FROM documents WHERE source = 'src0'))
        SELECT doc_id, COUNT(*) AS n_shared
        FROM shc JOIN shb USING (s)
        GROUP BY doc_id HAVING COUNT(*) >= 1 ORDER BY doc_id""")),

    // ---- deterministic stratified train/val/test split ------------------
    "q98_train_split" -> QueryDef(
      build = (spark, dir) =>
        Curation.splitCounts(t(spark, dir, "documents"),
          col("source"), col("doc_id"), col("n_chars")),
      oracle = Some(s"""
        SELECT source AS stratum,
          CASE WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10 THEN 'test'
               WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 30 THEN 'val'
               ELSE 'train' END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY stratum, split""")),

    // ---- corpus length histogram (fixed-width integer buckets) ----------
    "q99_char_histogram" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "documents")
          .groupBy(expr("n_chars div 25").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars")),
      oracle = Some("""
        SELECT n_chars // 25 AS bucket, COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM documents GROUP BY bucket""")),

    // ---- per-source corpus accounting incl. exact-duplicate rate --------
    "q100_source_stats" -> QueryDef(
      build = (spark, dir) =>
        t(spark, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            (count(lit(1)) - countDistinct(col("text"))).as("n_exact_dups"),
            (sum(col("n_chars")).cast("double") / count(lit(1)))
              .as("avg_chars")),
      oracle = Some("""
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents GROUP BY source""")),

    // ---- per-document top-k terms by tf-idf -----------------------------
    // idf uses the ln-free rational (N+1)/(df+1): same ranking as the log
    // form (log is monotone) with bit-reproducible arithmetic; see
    // TextOps.tfIdfTopK.
    "q101_tfidf_topk" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.TextOps.tfIdfTopK(t(spark, dir, "documents"), k = 3),
      oracle = Some(raw"""
        WITH tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
          GROUP BY doc_id, tok),
        dfr AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, tok, tf,
                 tf * ((n_docs + 1.0) / (df + 1.0)) AS score
          FROM tf JOIN dfr USING (tok) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, tok, tf, score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, tok ASC) AS rank
          FROM scored)
        SELECT doc_id, rank, tok, tf, score
        FROM ranked WHERE rank <= 3"""),
      bench = true,
      // The heavy stage (doc-keyed explode → tf → window) runs at an
      // explicit defaultParallelism repartition; the only
      // shuffle.partitions-sized exchange left is the vocabulary
      // aggregate, whose reduce side is partial-agg-shrunk to
      // vocab-per-mapper rows — a handful of reducers is right-sized and
      // AQE's per-stage barriers have nothing to re-plan. Semantics-free,
      // applied identically by Bench and Verify.
      confs = Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4")),

    // ---- domain-mixing resample to equal per-stratum shares -------------
    "q104_mixture_resample" -> QueryDef(
      build = (spark, dir) =>
        Curation.mixtureResample(t(spark, dir, "documents"),
            col("lang"), col("doc_id"))
          .orderBy(col("stratum")),
      oracle = Some(s"""
        WITH c AS (SELECT lang AS stratum, COUNT(*) AS n_before
                   FROM documents GROUP BY 1),
        k AS (SELECT COUNT(*) AS n_strata FROM c),
        s AS (SELECT stratum, n_before,
                CAST(1.0 AS DOUBLE) / n_strata AS target_share
              FROM c, k),
        f AS (SELECT MIN(n_before / target_share) AS m FROM s),
        r AS (SELECT stratum, n_before, target_share,
                CAST(floor(m * target_share / n_before * 1000000 + 1e-3)
                  AS BIGINT) AS thresh
              FROM s, f),
        kept AS (SELECT lang AS stratum, COUNT(*) AS n_kept
                 FROM documents d JOIN r ON d.lang = r.stratum
                 WHERE ${h32Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < thresh
                 GROUP BY 1),
        t AS (SELECT SUM(n_kept) AS total_kept FROM kept)
        SELECT r.stratum, r.n_before, COALESCE(kept.n_kept, 0) AS n_kept,
               r.target_share,
               CAST(COALESCE(kept.n_kept, 0) AS DOUBLE) / total_kept
                 AS actual_share
        FROM r LEFT JOIN kept USING (stratum), t
        ORDER BY stratum""")),

    // ---- composed curation pipeline: lang filter → exact dedup →
    // length filter → deterministic split accounting. One query
    // exercising the operators CHAINED the way a real corpus build runs
    // them; every stage reuses an already-oracle-checked primitive.
    "q107_curation_pipeline" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val en = t(spark, dir, "documents").filter(col("lang") === "en")
        val deduped = en
          .withColumn("keep",
            min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
          .filter(col("doc_id") === col("keep"))
        val sized = deduped
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tok"))
          .filter(col("n_tok") >= 20)
        sized
          .groupBy(Curation.splitAssign(col("doc_id")).as("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"))
          .orderBy(col("split"))
      },
      oracle = Some(s"""
        WITH en AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
        d AS (SELECT doc_id, text,
                MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
              FROM en),
        k AS (SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                  AS n_tok
              FROM d WHERE doc_id = keep),
        f AS (SELECT doc_id, n_tok FROM k WHERE n_tok >= 20)
        SELECT CASE WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10
                      THEN 'test'
                    WHEN ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 30
                      THEN 'val'
                    ELSE 'train' END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM f GROUP BY split ORDER BY split""")),

    // ---- Bloom-prefiltered contamination (the 100 TB contamination
    // shape). No false negatives ⇒ output equals the exact form, so the
    // exact-contamination oracle hash-verifies the bloom path itself.
    "q115_bloom_contamination" -> QueryDef(
      build = (spark, dir) => {
        val docs = t(spark, dir, "documents")
        Curation.bloomContamination(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH shc AS (SELECT DISTINCT doc_id, substr(text, g, 8) AS s
          FROM (SELECT doc_id, text,
                  unnest(generate_series(1, greatest(len(text) - 7, 1))) AS g
                FROM documents WHERE source <> 'src0')),
        shb AS (SELECT DISTINCT substr(text, g, 8) AS s
          FROM (SELECT text,
                  unnest(generate_series(1, greatest(len(text) - 7, 1))) AS g
                FROM documents WHERE source = 'src0'))
        SELECT doc_id, COUNT(*) AS n_shared
        FROM shc JOIN shb USING (s)
        GROUP BY doc_id HAVING COUNT(*) >= 1 ORDER BY doc_id""")),

    // ---- sliding-window chunking with overlap (RAG / context prep) ------
    "q113_chunk_overlap" -> QueryDef(
      build = (spark, dir) =>
        Curation.chunkDocuments(t(spark, dir, "documents"),
            size = 16, stride = 8)
          .orderBy(col("doc_id"), col("chunk_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
        st AS (SELECT doc_id, toks,
                 unnest(generate_series(1, greatest(len(toks), 1), 8))
                   AS start
               FROM tk)
        SELECT doc_id,
          (start - 1) // 8 + 1 AS chunk_id,
          start,
          CAST(len(toks[start:least(start + 15, len(toks))]) AS BIGINT)
            AS chunk_len,
          array_to_string(toks[start:least(start + 15, len(toks))], ' ')
            AS chunk_text
        FROM st ORDER BY doc_id, chunk_id"""),
      bench = true),

    // ---- PII redaction (emails / phones / IPv4 → placeholders) ----------
    // PII is injected deterministically into a third of the corpus so the
    // scrub exercises real matches AND untouched rows; counts audit the
    // pre-redaction text.
    "q114_pii_redaction" -> QueryDef(
      build = (spark, dir) => {
        val seeded = t(spark, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 3 === 0,
              concat(col("text"),
                lit(" contact user"), col("doc_id").cast("string"),
                lit("@mail.example or call +1-555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
                lit(" from "), (col("doc_id") % 256).cast("string"),
                lit(".0.0.1")))
              .otherwise(col("text")).as("text2"))
        seeded.select(col("doc_id"),
            Curation.piiCount(col("text2"), Curation.emailRe).as("n_emails"),
            Curation.piiCount(col("text2"), Curation.phoneRe).as("n_phones"),
            Curation.piiCount(col("text2"), Curation.ipv4Re).as("n_ips"),
            Curation.redactPii(col("text2")).as("redacted"))
          .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0
            || col("doc_id") % 10 === 1)
          .orderBy(col("doc_id"))
      },
      oracle = Some(raw"""
        WITH seeded AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN
            text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              '@mail.example or call +1-555-' ||
              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
              ' from ' || CAST(doc_id % 256 AS VARCHAR) || '.0.0.1'
          ELSE text END AS text2 FROM documents),
        scrub AS (SELECT doc_id,
          CAST(len(regexp_extract_all(text2,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_emails,
          CAST(len(regexp_extract_all(text2,
            '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(text2,
            '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
          regexp_replace(regexp_replace(regexp_replace(text2,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
            '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g') AS redacted
        FROM seeded)
        SELECT doc_id, n_emails, n_phones, n_ips, redacted FROM scrub
        WHERE n_emails + n_phones + n_ips > 0 OR doc_id % 10 = 1
        ORDER BY doc_id""")),

    // ---- per-source token-budget cap (hash-priority admission) ----------
    "q110_token_budget_cap" -> QueryDef(
      build = (spark, dir) => {
        val d = t(spark, dir, "documents")
        Curation.tokenBudgetCap(d, col("source"), col("doc_id"),
            size(tokens(col("text"))).cast("long"), budget = 500L)
          .orderBy(col("stratum"))
      },
      oracle = Some(raw"""
        WITH tk AS (SELECT source, doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              AS n_tok
          FROM documents),
        cs AS (SELECT source, n_tok,
            SUM(n_tok) OVER (PARTITION BY source
              ORDER BY ${h32Sql("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
              AS cum0
          FROM tk)
        SELECT source AS stratum, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN cum0 < 500 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept,
          CAST(SUM(CASE WHEN cum0 < 500 THEN n_tok ELSE 0 END) AS BIGINT)
            AS tok_kept
        FROM cs GROUP BY source ORDER BY stratum""")),

    // ---- CCNet-style repeated-segment boilerplate removal ---------------
    "q119_boilerplate_strip" -> QueryDef(
      build = (spark, dir) =>
        Curation.boilerplateStrip(t(spark, dir, "documents"),
            segSize = 2, minDf = 20)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, $tokensSql AS toks FROM documents),
        seg AS (SELECT doc_id, (g - 1) // 2 + 1 AS seg_idx,
                  array_to_string(toks[g:least(g + 1, len(toks))], ' ')
                    AS seg
                FROM (SELECT doc_id, toks,
                        unnest(generate_series(1, greatest(len(toks), 1), 2))
                          AS g
                      FROM tk)),
        sdf AS (SELECT seg, COUNT(DISTINCT doc_id) AS df
                FROM seg GROUP BY seg),
        mark AS (SELECT s.doc_id, s.seg_idx, s.seg, d.df
                 FROM seg s JOIN sdf d USING (seg))
        SELECT doc_id, COUNT(*) AS n_segments,
          CAST(SUM(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_removed,
          COALESCE(string_agg(CASE WHEN df < 20 THEN seg END,
            ' ' ORDER BY seg_idx), '') AS clean_text
        FROM mark GROUP BY doc_id ORDER BY doc_id""")),

    // ---- deterministic seeded training shards ---------------------------
    "q120_train_shards" -> QueryDef(
      build = (spark, dir) =>
        Curation.trainingShards(
            t(spark, dir, "documents").select(col("doc_id")),
            col("doc_id"), nShards = 8, seed = "42")
          .orderBy(col("shard"), col("shard_pos")),
      oracle = Some(s"""
        WITH h AS (SELECT doc_id,
            ${h32Sql("'42|' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents)
        SELECT doc_id, h % 8 AS shard,
          CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
            AS BIGINT) AS shard_pos
        FROM h ORDER BY shard, shard_pos""")),

    // ---- temperature-scaled source mixture weights ----------------------
    "q121_temperature_mix" -> QueryDef(
      build = (spark, dir) =>
        Curation.temperatureMixture(t(spark, dir, "documents"),
            col("source"), size(tokens(col("text"))).cast("long"),
            alpha = 0.7, budget = 100000L)
          .orderBy(col("stratum")),
      oracle = Some(raw"""
        WITH n AS (SELECT source AS stratum,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS n_tok
          FROM documents GROUP BY source),
        w AS (SELECT stratum, n_tok,
            CAST(ROUND(pow(CAST(n_tok AS DOUBLE), 0.7) * 1e6) AS BIGINT)
              AS ws
          FROM n),
        t AS (SELECT SUM(ws) AS w_total FROM w)
        SELECT stratum, n_tok,
          CAST(ws AS DOUBLE) / 1e6 AS weight,
          CAST(ws AS DOUBLE) / w_total AS share,
          CAST(ws AS DOUBLE) / w_total * 100000 / n_tok AS rate
        FROM w, t ORDER BY stratum""")),

    // ---- deterministic epoch assembly (materialize the mixture) ---------
    // q121 computes per-source rates; this materializes the epoch:
    // floor(rate) copies per doc plus a seeded-coin extra for the
    // fraction - the epoch is a pure function of (corpus, alpha,
    // budget, seed), auditable row-by-row
    "q178_epoch_assembly" -> QueryDef(
      build = (spark, dir) =>
        Curation.assembleEpoch(t(spark, dir, "documents"),
            col("source"), size(tokens(col("text"))).cast("long"),
            alpha = 0.7, budget = 100000L)
          .orderBy(col("doc_id"), col("copy")),
      oracle = Some(raw"""
        WITH n AS (SELECT source AS stratum,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS n_tok
          FROM documents GROUP BY source),
        w AS (SELECT stratum, n_tok,
            CAST(ROUND(pow(CAST(n_tok AS DOUBLE), 0.7) * 1e6) AS BIGINT)
              AS ws
          FROM n),
        t AS (SELECT SUM(ws) AS w_total FROM w),
        r AS (SELECT stratum,
            CAST(ws AS DOUBLE) / w_total * 100000 / n_tok AS rate
          FROM w, t),
        d AS (SELECT doc_id, d.source,
            CAST(floor(rate) AS BIGINT) +
              (CASE WHEN (${h32Sql("CAST(doc_id AS VARCHAR) || '#42'")})
                      % 1000000
                    < CAST(round((rate - floor(rate)) * 1000000.0)
                        AS BIGINT)
                THEN 1 ELSE 0 END) AS n_copies
          FROM documents d JOIN r ON r.stratum = d.source)
        SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies))
          AS BIGINT) AS copy
        FROM d WHERE n_copies >= 1
        ORDER BY doc_id, copy""")),

    // ---- CCNet-style unigram-LM cross-entropy quality score -------------
    "q122_unigram_xent" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.TextOps.unigramCrossEntropy(t(spark, dir, "documents"),
            addK = 0.5)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
        vc AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vc),
        lp AS (SELECT tok,
            CAST(ROUND(ln((c + 0.5) / (n + 0.5 * v)) * 1e6) AS BIGINT)
              AS lps
          FROM vc, tot)
        SELECT doc_id, COUNT(*) AS n_tok,
          CAST(SUM(lps) AS BIGINT) AS sum_lp,
          -(CAST(SUM(lps) AS BIGINT) / 1e6) / COUNT(*) AS xent
        FROM tk JOIN lp USING (tok)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Gopher duplicated-n-gram repetition metrics --------------------
    "q157_ngram_repetition" -> QueryDef(
      build = (spark, dir) =>
        Curation.ngramRepetition(t(spark, dir, "documents"), n = 3)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH arr AS (SELECT doc_id, len(trim(text)) AS total_chars,
                       $tokensSql AS a FROM documents),
        pos AS (SELECT doc_id, total_chars, a,
                  unnest(generate_series(1, len(a) - 2)) AS i
                FROM arr WHERE len(a) >= 3),
        g AS (SELECT doc_id, total_chars,
                array_to_string(a[i:i+2], ' ') AS gram FROM pos),
        pg AS (SELECT doc_id, total_chars, gram,
                 CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2, 3),
        pm AS (SELECT doc_id, total_chars, c,
                 c * len(gram) AS mass FROM pg)
        SELECT doc_id,
          CAST(SUM(CASE WHEN c >= 2 THEN mass ELSE 0 END) AS DOUBLE)
            / MAX(total_chars) AS dup_ngram_char_frac,
          CAST(MAX(mass) AS DOUBLE) / MAX(total_chars) AS top_ngram_char_frac
        FROM pm GROUP BY doc_id ORDER BY doc_id""")),

    // ---- interpolated bigram-LM cross-entropy (KenLM-flavored) ----------
    "q153_bigram_xent" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.TextOps.bigramCrossEntropy(t(spark, dir, "documents"),
            addK = 0.5, lambda = 0.7)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH arr AS (SELECT doc_id, $tokensSql AS a FROM documents),
        uni0 AS (SELECT doc_id, unnest(a) AS tok FROM arr),
        uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1
                FROM uni0 GROUP BY 1),
        tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n,
                       CAST(COUNT(*) AS BIGINT) AS v FROM uni),
        pos AS (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS g
                FROM arr WHERE len(a) >= 2),
        bg AS (SELECT doc_id, a[g] AS w1, a[g + 1] AS w2 FROM pos),
        big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                FROM bg GROUP BY 1, 2),
        lp AS (SELECT w1, w2,
            CAST(ROUND(ln(
              (0.7 * (c2 + 0.5)) / (u1.c1 + 0.5 * v) +
              ((1 - 0.7) * (u2.c1 + 0.5)) / (n + 0.5 * v)) * 1e6) AS BIGINT)
              AS lps
          FROM big JOIN uni u1 ON u1.tok = w1
                   JOIN uni u2 ON u2.tok = w2, tot)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(lps) AS BIGINT) AS sum_lp,
          -(CAST(SUM(lps) AS DOUBLE) / 1e6) / COUNT(*) AS xent
        FROM bg JOIN lp USING (w1, w2)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- DSIR hashed-unigram importance weights -------------------------
    "q123_dsir_weights" -> QueryDef(
      build = (spark, dir) =>
        graft.ops.TextOps.dsirLogWeights(t(spark, dir, "documents"),
            col("lang") === "en", buckets = 8192, addK = 0.5)
          .orderBy(col("doc_id")),
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, (lang = 'en') AS is_t,
            ${h32Sql("tok")} % 8192 AS b
          FROM (SELECT doc_id, lang, unnest($tokensSql) AS tok
                FROM documents)),
        bc AS (SELECT b, COUNT(*) AS c_raw,
            CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
          FROM tk GROUP BY b),
        tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
            CAST(SUM(c_t) AS BIGINT) AS n_t FROM bc),
        lp AS (SELECT b,
            CAST(ROUND(ln((c_t + 0.5) / (n_t + 0.5 * 8192)) * 1e6) AS BIGINT)
            - CAST(ROUND(ln((c_raw + 0.5) / (n_raw + 0.5 * 8192)) * 1e6)
                AS BIGINT) AS dlps
          FROM bc, tot)
        SELECT doc_id, COUNT(*) AS n_tok,
          CAST(SUM(dlps) AS BIGINT) AS sum_dlp,
          CAST(SUM(dlps) AS BIGINT) / 1e6 AS log_w
        FROM tk JOIN lp USING (b)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- CCNet per-language head/middle/tail perplexity buckets ---------
    // Composition query: the cross-entropy scorer feeding CCNet's
    // per-language tercile split, rolled up to bucket-level accounting.
    // The ntile window (per-lang sort) is the VERIFIABLE form; at corpus
    // scale the same split runs as filter-vs-threshold with cut points
    // from the percentile sketch (rank-error-bounded, q117) instead of a
    // per-language global sort.
    "q124_ccnet_buckets" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(spark, dir, "documents")
        val xent = graft.ops.TextOps.unigramCrossEntropy(docs, addK = 0.5)
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("xent").asc, col("doc_id").asc)
        docs.select(col("doc_id"), col("lang"))
          .join(xent, "doc_id")
          .withColumn("bucket", ntile(3).over(w).cast("long"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"),
            max(col("xent")).as("max_xent"))
          .orderBy(col("lang"), col("bucket"))
      },
      oracle = Some(raw"""
        WITH tk AS (SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
        vc AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vc),
        lp AS (SELECT tok,
            CAST(ROUND(ln((c + 0.5) / (n + 0.5 * v)) * 1e6) AS BIGINT)
              AS lps
          FROM vc, tot),
        x AS (SELECT doc_id, COUNT(*) AS n_tok,
            -(CAST(SUM(lps) AS BIGINT) / 1e6) / COUNT(*) AS xent
          FROM tk JOIN lp USING (tok) GROUP BY doc_id),
        b AS (SELECT d.lang, x.n_tok, x.xent,
            NTILE(3) OVER (PARTITION BY d.lang
                           ORDER BY x.xent, x.doc_id) AS bucket
          FROM x JOIN documents d USING (doc_id))
        SELECT lang, bucket, COUNT(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS n_tok, MAX(xent) AS max_xent
        FROM b GROUP BY lang, bucket ORDER BY lang, bucket""")),

    // ---- seeded weighted sampling without replacement (A-ES) -----------
    // Top-20 documents by Efraimidis–Spirakis rank key ln(u)/w with
    // w = n_chars: longer docs proportionally likelier, yet fully
    // deterministic — the hash-seeded uniform makes the "random" sample
    // engine-reproducible, so an oracle can check it exactly.
    "q139_weighted_sample" -> QueryDef(
      build = (spark, dir) =>
        Curation.weightedSample(t(spark, dir, "documents"),
            col("doc_id"), col("n_chars"), k = 20)
          .orderBy(col("key")),
      oracle = Some(s"""
        WITH s AS (SELECT doc_id AS key, CAST(n_chars AS BIGINT) AS w,
            (${h32Sql("CAST(doc_id AS VARCHAR) || '#42'")} + 1)
              / 4294967297.0 AS u
          FROM documents),
        top AS (SELECT key, w, ln(u) / w AS r_exact FROM s
                ORDER BY r_exact DESC, key LIMIT 20)
        SELECT key, w, round(r_exact, 6) AS r FROM top ORDER BY key""")),

    // ---- stratified weighted sampling (A-ES per group, k-bounded) -------
    // q139's A-ES composed with the TopKByScore aggregator: 3 winners
    // per source, weighted by n_chars — each map task forwards <= k
    // rows per group where the row_number window (the oracle) would
    // shuffle and sort the whole population
    "q170_group_weighted_sample" -> QueryDef(
      build = (spark, dir) =>
        Curation.weightedSamplePerGroup(t(spark, dir, "documents"),
            col("source"), col("doc_id"), col("n_chars"), k = 3)
          .orderBy(col("grp"), col("rnk")),
      oracle = Some(s"""
        WITH s AS (SELECT source AS grp, doc_id AS key,
            CAST(round(ln((${h32Sql("CAST(doc_id AS VARCHAR) || '#42'")} + 1)
                / 4294967297.0) / n_chars * 1000000.0) AS BIGINT) AS rs
          FROM documents WHERE n_chars > 0),
        r AS (SELECT grp, key, rs, row_number() OVER (
                PARTITION BY grp ORDER BY rs DESC, key) AS rnk FROM s)
        SELECT grp, CAST(rnk AS BIGINT) AS rnk, key,
               CAST(rs AS DOUBLE) / 1000000.0 AS r
        FROM r WHERE rnk <= 3 ORDER BY grp, rnk"""))
  )
}
