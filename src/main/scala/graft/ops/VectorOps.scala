package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Q.h32

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, and a random-
  * hyperplane LSH bucketing as the scale path.
  *
  * Numeric discipline: components are floor-quantized to int64
  * (`floor(x * 1e5)`) so dot products and norms are EXACT integer sums —
  * order-free, shuffle-safe, and bit-identical to the DuckDB oracle. The
  * only floating-point steps (sqrt, one division) are deterministic IEEE
  * ops on those exact integers.
  *
  * Scale design (100 TB of vectors):
  *  - brute force is one broadcast of the (small) query set against a
  *    partitioned candidate scan — no shuffle of the big side; per-pair
  *    work is a codegen'd array fold, top-k via per-query window;
  *  - LSH buckets reduce the candidate set to one bucket per query
  *    (multi-probe = adjacent buckets); bucket assignment is per-row map
  *    work and the join is an equi-join on the bucket id, AQE-skew-safe.
  */
object VectorOps {

  /** Spread a few-file input across all cores before per-row-heavy
    * stages (see DedupOps.spread). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** int64 floor-quantization of a float vector column (exact: float →
    * double is lossless and both engines floor the same double). */
  def quantized(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast("double") * lit(100000)).cast("long"))

  // fused native kernel (functions.LongVec): whole-stage-codegen'd
  // primitive loop, where aggregate(zip_with(...)) interprets its lambda
  // per element
  private def dot(a: Column, b: Column): Column =
    graft.functions.LongVec.dot(a, b)

  /** Brute-force cosine top-k: every query row against every candidate.
    * Returns (qid, cid, cosine, rank) with rank ≤ k. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      quantized(col("embedding")).as("qv"))
    val c = spread(candidates).select(col("vec_id").as("cid"),
      quantized(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")).cast("double") /
          (sqrt(dot(col("qv"), col("qv")).cast("double")) *
           sqrt(dot(col("cv"), col("cv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits). Plane
    * components are md5-derived ints in [-1000, 1000] — deterministic and
    * reproducible in any engine, no RNG state.
    *
    * ONE codegen'd map-side expression per row (functions.LshBucket):
    * the composed posexplode → broadcast-planes join → two aggregations
    * paid dims×nPlanes row inflation for what is a per-row integer dot
    * product; the kernel assigns buckets at scan width with zero
    * shuffles, bit-identical to the composed form and the oracle
    * (OpsSpec asserts). */
  def lshBuckets(vectors: DataFrame, nPlanes: Int = 8, dim: Int = 64): DataFrame =
    // NULL-embedding rows are dropped, matching the composed form (whose
    // posexplode produced no rows for them) and the oracle's unnest
    spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.LshBucket(quantized(col("embedding")), nPlanes, dim)
          .as("bucket"))

  /** One map-pass projection of (id, quantized vector, LSH bucket) —
    * the single source of truth for every fused bucket consumer
    * (annTopK, cosineNearDups, semanticContamination): the bucket
    * kernel is per-row arithmetic, so joining a separate [[lshBuckets]]
    * frame back on vec_id paid a corpus shuffle for nothing. Null
    * embeddings drop, matching lshBuckets' filter (and the old inner
    * join against it). Same dim default as lshBuckets. */
  private def withBucket(df: DataFrame, idName: String, vecName: String,
      nPlanes: Int, dim: Int = 64): DataFrame =
    df.filter(col("embedding").isNotNull)
      .select(col("vec_id").as(idName),
        quantized(col("embedding")).as(vecName),
        graft.functions.LshBucket(quantized(col("embedding")), nPlanes, dim)
          .as("bucket"))

  /** Bucketed ANN: top-k within the query's LSH bucket only. Bucket and
    * quantized vector come from ONE map-pass projection per side (the
    * fused ivfAssign lesson). */
  def annTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8): DataFrame = {
    val qb = withBucket(queries, "qid", "qv", nPlanes)
    val cb = withBucket(spread(vectors), "cid", "cv", nPlanes)
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")).cast("double") /
          (sqrt(dot(col("qv"), col("qv")).cast("double")) *
           sqrt(dot(col("cv"), col("cv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  // IVF-style cell assignment: the coarse quantizer is a deterministic
  // seed set (the nCells lowest-id vectors — no RNG, no iterative
  // k-means whose floating-point mean updates would be shuffle-order
  // dependent); each vector goes to its nearest seed by EXACT integer
  // squared distance on the quantized components, ties broken by cell
  // id. Returns (vec_id, cell_id, dist2). Shape: see assignedWithSeeds.
  /** The nCells seed centroids (lowest vec_ids — deterministic), as
    * BOUNDED DRIVER STATE: nCells·dim quantized longs, the k-means
    * centroid pattern [[kCenterSelect]] already uses. The pick plans as
    * TakeOrderedAndProject (bounded per-partition top-k), never a
    * global sort.
    *
    * NOTE this collect makes every fused-assignment entry point
    * (ivfAssign/ivfTopK/ivfWrite/semanticDedup/kmeansRefine) run one
    * BOUNDED Spark job eagerly at call time — the deliberate price of
    * literal-center codegen (zero joins on the corpus-sized pass). An
    * empty corpus yields zero seeds, which assignFused maps to an empty
    * assignment frame, not an error. */
  private def ivfSeeds(vectors: DataFrame,
      nCells: Int): Array[(Long, Seq[Long])] =
    vectors.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id"), quantized(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))

  /** Fused single-pass nearest-center assignment against driver-held
    * centers: the per-row argmin is a `least` fold over codegen'd
    * distance-kernel evals against LITERAL center arrays — struct
    * comparison gives the (dist2, cell_id) lexicographic tiebreak the
    * old min_by form used. ZERO joins, ZERO shuffles: the previous
    * shape paid a centers× row explosion through a broadcast join plus
    * a corpus-wide min_by hash aggregation for what is per-row
    * arithmetic (the LshBucket/randomProjection lesson applied to the
    * quantizers). Carries qv so consumers need no join-back. The ONE
    * shared implementation for both the exact-int IVF seeds and the
    * double-valued Lloyd centroids — `dists` maps each center id to
    * its kernel expression over the qv column. */
  private def assignFused(withQv: DataFrame,
      dists: Array[(Long, Column)], emptyDistType: String): DataFrame = {
    if (dists.isEmpty)
      // Zero centers means an EMPTY corpus (seeds/centroids come from the
      // corpus itself): return an empty assignment with the real schema,
      // matching the pre-fusion broadcast-join shape — a require here made
      // first-run-on-empty-input pipelines crash (r9 advisor, medium).
      withQv.filter(lit(false)).select(col("vec_id"), col("qv"),
        lit(0L).as("cell_id"), lit(0L).cast(emptyDistType).as("dist2"))
    else {
      val cands = dists.map { case (id, d) =>
        struct(d.as("dist2"), lit(id).as("cell_id"))
      }
      val best = if (cands.length == 1) cands.head else least(cands.toSeq: _*)
      withQv.select(col("vec_id"), col("qv"), best.as("b"))
        .select(col("vec_id"), col("qv"),
          col("b.cell_id").as("cell_id"), col("b.dist2").as("dist2"))
    }
  }

  /** The √N cell-count law (see [[semanticDedup]]'s scaladoc), clamped
    * to [16, 1024]. `ceil(sqrt(n))` is IEEE-exact and matches the
    * oracle SQL's `CEIL(SQRT(COUNT(*)))` bit-for-bit. */
  private[graft] def cellLaw(n: Long): Int =
    math.min(1024L, math.max(16L,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Corpus size AND the `maxSeeds` lowest-id quantized seed vectors in
    * ONE corpus pass (r10 verdict task 5: the √N law's dedicated
    * `count()` job made three passes where two suffice — on parquet the
    * count is footer-cheap, but on computed/filtered inputs it re-ran
    * the whole upstream pipeline). The count rides the seed job as an
    * `observe` metric: CollectMetrics sits below the TakeOrdered, so
    * every corpus row increments it during the SAME scan, while the
    * plan keeps TakeOrderedAndProject's shape — per-partition bounded
    * top-k, quantization projected onto only the k winners, whole-stage
    * codegen intact (a treeAggregate draft paid Row deserialization +
    * full-corpus quantization for the same answer: 0.84 s vs 0.60 s on
    * the q132 bench).
    *
    * Exactness: the seed path is literally [[ivfSeeds]]'s plan, so
    * `countAndSeeds(v, m)._2.take(c)` equals `ivfSeeds(v, c)` for any
    * c ≤ m (OpsSpec asserts both the equality and the single-job
    * count). */
  private[graft] def countAndSeeds(vectors: DataFrame, maxSeeds: Int)
      : (Long, Array[(Long, Seq[Long])]) = {
    val obs = org.apache.spark.sql.Observation()
    val seeds = vectors.observe(obs, count(lit(1)).as("n"))
      .orderBy(col("vec_id")).limit(maxSeeds)
      .select(col("vec_id"), quantized(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    (obs.get("n").asInstanceOf[Long], seeds)
  }

  private def assignedWithSeeds(frame: DataFrame,
      seeds: Array[(Long, Seq[Long])]): DataFrame =
    assignFused(
      frame.select(col("vec_id"), quantized(col("embedding")).as("qv")),
      seeds.map { case (id, cv) =>
        (id, graft.functions.LongVec.dist2(col("qv"), typedLit(cv)))
      }, emptyDistType = "long")

  def ivfAssign(vectors: DataFrame, nCells: Int = 16): DataFrame =
    assignedWithSeeds(spread(vectors), ivfSeeds(vectors, nCells))
      .select(col("vec_id"), col("cell_id"), col("dist2"))

  /** IVF ANN (nprobe = 1): top-k within the query's cell only. Corpus
    * cost is ONE fused map pass (assignment + quantization together,
    * qv carried — no corpus join-back); queries assign through the
    * identical literal-seed expression, so their cells match the
    * corpus assignment bit-for-bit. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16): DataFrame = {
    val seeds = ivfSeeds(vectors, nCells)
    val cb = assignedWithSeeds(spread(vectors), seeds)
      .select(col("vec_id").as("cid"), col("cell_id"), col("qv").as("cv"))
    val qb = assignedWithSeeds(queries, seeds)
      .select(col("vec_id").as("qid"), col("cell_id"), col("qv"))
    val scored = cb.join(broadcast(qb), Seq("cell_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")).cast("double") /
          (sqrt(dot(col("qv"), col("qv")).cast("double")) *
           sqrt(dot(col("cv"), col("cv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact embedding-dimension covariance matrix — the embedding-space
    * QA screen (dead dimensions: cov(g,g) ≈ 0; redundant dimensions:
    * high off-diagonal mass) and the input to whitening. One row per
    * unordered dimension pair (g1 ≤ g2, 1-based like the per-dim stats
    * op): (g1, g2, n, sxy, cov) with cov = Sxy/n − (Sx/n)(Sy/n) — IEEE
    * ops in a fixed written order over EXACT integer sums (pair
    * products summed in DECIMAL: at 1e9 vectors the Σx·y sum overflows
    * int64, the same rule as money sums).
    *
    * Shape at scale: the d²/2 pair stream assembles map-side from each
    * vector's array and combines map-side onto d²/2 keys — the
    * exchange carries one row per (partition, pair), never per vector;
    * per-dim sums and the count ride the d-keyed and 1-row frames. The
    * d² row inflation is CPU paid at scan width (any covariance
    * computation does these multiplies); for very high d use a fused
    * accumulator kernel instead. */
  def dimCovariance(vectors: DataFrame): DataFrame = {
    val v = spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
    val n1 = v.agg(count(lit(1)).as("n"))
    val dims = v.select(posexplode(col("qv")).as(Seq("p", "x")))
      .groupBy((col("p") + 1).cast("long").as("g"))
      .agg(sum(col("x")).as("sx"))
    val pairs = v
      .select(posexplode(col("qv")).as(Seq("p1", "x1")), col("qv"))
      .select(col("p1"), col("x1"),
        posexplode(col("qv")).as(Seq("p2", "x2")))
      .where(col("p1") <= col("p2"))
      // g1/g2 as BIGINT: posexplode positions are int32, but the
      // dialect's integer literals (and the q160 oracle) are int64 —
      // strict dtype parity (scripts/strict_check.py flagged the gap)
      .groupBy((col("p1") + 1).cast("long").as("g1"),
        (col("p2") + 1).cast("long").as("g2"))
      .agg(sum((col("x1") * col("x2")).cast("decimal(38,0)")).as("sxyd"))
      .select(col("g1"), col("g2"), col("sxyd").cast("long").as("sxy"))
    pairs
      .join(dims.select(col("g").as("g1"), col("sx").as("sx1")), "g1")
      .join(dims.select(col("g").as("g2"), col("sx").as("sx2")), "g2")
      .crossJoin(broadcast(n1))
      .select(col("g1"), col("g2"), col("n"), col("sxy"),
        (col("sxy").cast("double") / col("n") -
          (col("sx1").cast("double") / col("n")) *
          (col("sx2").cast("double") / col("n"))).as("cov"))
  }

  /** Persist the IVF structure as a bucketed, cell-sorted table:
    * (vec_id, cell_id, qv) bucketed by cell_id — the ingest-time
    * amortization for repeated ANN queries ([[buildBandIndex]] /
    * [[graft.ops.TextOps.buildTermIndex]]'s pattern on the vector
    * side). Query-time cost drops to a bucket-local scan of the probed
    * cells: no corpus-side assignment recompute, no corpus exchange
    * (the cell join reads the bucketed layout pre-partitioned). */
  def buildIvfIndex(vectors: DataFrame, db: String, table: String,
      nCells: Int = 16, numBuckets: Int = 8): Unit = {
    val spark = vectors.sparkSession
    // same identifier guard as DedupOps' band index: db goes into DDL text
    require(db.matches("[A-Za-z0-9_]+") && table.matches("[A-Za-z0-9_]+"),
      s"IVF index names must match [A-Za-z0-9_]+: '$db'.'$table'")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    assignedWithSeeds(
        spread(vectors).filter(col("embedding").isNotNull),
        ivfSeeds(vectors, nCells))
      .select(col("vec_id"), col("cell_id"), col("qv"))
      .write
      .bucketBy(numBuckets, "cell_id")
      .sortBy("cell_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"$db.$table")
  }

  /** [[ivfTopK]] against a persisted [[buildIvfIndex]] table: identical
    * output for the same corpus (OpsSpec-proven), with the corpus-side
    * quantization + assignment replaced by an index scan. The seed
    * quantizer is recovered deterministically from the index itself
    * (the `nCells` lowest vec_ids — exactly [[ivfAssign]]'s seeds), so
    * the index is self-contained. */
  def ivfTopKIndexed(index: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16): DataFrame = {
    val seeds = index.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell_id"), col("qv").as("cv"))
    val qcell = queries
      .select(col("vec_id").as("qid"), quantized(col("embedding")).as("qv"))
      .join(broadcast(seeds))
      .select(col("qid"), col("qv"), col("cell_id"),
        graft.functions.LongVec.dist2(col("qv"), col("cv")).as("dist2"))
      .groupBy(col("qid"))
      .agg(min_by(struct(col("cell_id")),
          struct(col("dist2"), col("cell_id"))).as("m"),
        first(col("qv")).as("qv"))
      .select(col("qid"), col("m.cell_id").as("cell_id"), col("qv"))
    val scored = index
      .select(col("vec_id").as("cid"), col("cell_id"), col("qv").as("cv"))
      .join(broadcast(qcell), Seq("cell_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")).cast("double") /
          (sqrt(dot(col("qv"), col("qv")).cast("double")) *
           sqrt(dot(col("cv"), col("cv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Seeded random projection (Johnson–Lindenstrauss) to `outDim`
    * integer components: proj_j(v) = Σ_g v_g·p(j,g) with the SAME
    * md5-derived plane constants the LSH bucket kernel uses (ints in
    * [-1000, 1000] — no RNG state, reproducible in any engine), but
    * keeping the full dot product instead of just its sign — the
    * magnitude-preserving dimension reduction that speeds downstream
    * ANN/clustering while JL-preserving relative distances.
    *
    * Plane constants are j,g-indexed CONSTANTS, so they inline as
    * literal arrays and each component is one codegen'd exact-int dot
    * kernel at scan width — zero shuffles, zero plane joins (the
    * composed posexplode/broadcast-join form pays dims×outDim row
    * inflation for what is per-row arithmetic). Returns one
    * (vec_id, j, s) row per component. */
  def randomProjection(vectors: DataFrame, outDim: Int = 16,
      dim: Int = 64): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32s(s: String): Long = {
      md.reset()
      val h = md.digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        h.take(4).map("%02x".format(_)).mkString, 16)
    }
    val planes = (0 until outDim).map { j =>
      (1 to dim).map(g => h32s(s"$j,$g") % 2001L - 1000L)
    }
    val projCols = planes.zipWithIndex.map { case (p, j) =>
      struct(lit(j.toLong).as("j"),
        graft.functions.LongVec.dot(col("qv"), typedLit(p)).as("s"))
    }
    spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
      .select(col("vec_id"), explode(array(projCols: _*)).as("pr"))
      .select(col("vec_id"), col("pr.j").as("j"), col("pr.s").as("s"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal —
    * Gonzalez 1985's classic 2-approximation to the k-center cover, the
    * diversity-sampling step of embedding-based data pruning): starting from the
    * smallest vec_id, repeatedly select the vector FARTHEST (exact
    * int64 squared distance on quantized embeddings) from everything
    * selected so far. Returns one row per selected center:
    * (rank, vec_id, d2) where d2 is its min-distance to the previously
    * selected set at selection time (0 for the seed) — d2 decreasing
    * in rank is the coverage-radius curve.
    *
    * Shape at scale: the k−1 iterations each run ONE corpus pass — the
    * selected centers are bounded driver state inlined as literal
    * arrays (the k-means centroid pattern), the per-row min-distance is
    * a `least` fold over k codegen'd dist2 kernels, and the argmax
    * plans as TakeOrderedAndProject (per-partition top-1, no corpus
    * sort). The corpus frame is persisted once across iterations.
    *
    * Degenerate corner: once every remaining vector duplicates a
    * selected center (coverage radius 0), the argmax tie-break
    * re-selects the lowest id — rows after that carry d2 = 0, the
    * signal that k exceeds the corpus's distinct-point count. */
  def kCenterSelect(vectors: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k-center selection needs k >= 1")
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = v.orderBy(col("vec_id").asc).limit(1).collect()(0)
      var centers = List((0, seed.getLong(0),
        seed.getSeq[Long](1).toArray, 0L))
      while (centers.size < k) {
        val minDist = centers.map { case (_, _, cv, _) =>
          graft.functions.LongVec.dist2(col("qv"), typedLit(cv.toSeq))
        }.reduce(least(_, _))
        val best = v.select(col("vec_id"), col("qv"), minDist.as("d2"))
          .orderBy(col("d2").desc, col("vec_id").asc)
          .limit(1).collect()(0)
        centers = centers :+ (centers.size, best.getLong(0),
          best.getSeq[Long](1).toArray, best.getLong(2))
      }
      centers.map { case (r, id, _, d2) => (r.toLong, id, d2) }
        .toDF("rank", "vec_id", "d2")
    } finally v.unpersist()
  }

  /** Hard-negative mining for contrastive training: per query vector,
    * the top-k most-cosine-similar vectors whose LABEL DIFFERS from the
    * query's — the near-miss examples an embedding model trains
    * against (in-batch negatives are easy; these are the hard ones).
    *
    * Returns (qid, q_label, cid, c_label, cosine, rank), rank ≤ k.
    *
    * Shape at scale: the sampled query frame broadcasts (hard-negative
    * mining always runs per training batch, not per corpus); the
    * label-inequality predicate prunes INSIDE the broadcast join before
    * scoring; per-query top-k is a key-partitioned window. Corpus-wide
    * mining swaps the broadcast for [[lshBuckets]] collisions — same
    * downstream shape. */
  def hardNegatives(vectors: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      col("label").cast("long").as("q_label"),
      quantized(col("embedding")).as("qv"))
    val c = spread(vectors).select(col("vec_id").as("cid"),
      col("label").cast("long").as("c_label"),
      quantized(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("q_label") =!= col("c_label"))
      .select(col("qid"), col("q_label"), col("cid"), col("c_label"),
        (dot(col("qv"), col("cv")).cast("double") /
          (sqrt(dot(col("qv"), col("qv")).cast("double")) *
           sqrt(dot(col("cv"), col("cv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ANN recall@k evaluation: per query, how much of the brute-force
    * cosine top-k the IVF index actually returns — the accuracy side of
    * the speed/accuracy trade every ANN deployment must measure before
    * trusting the index (tune nCells/nProbe against this).
    *
    * Output per query id: exact-top-k size, hit count, recall
    * (IEEE division of exact counts). A query whose cell contains no
    * other vectors scores 0, not absent.
    *
    * Scale shape: ground truth is the brute-force pass — inherent to
    * recall measurement — so run it on a SAMPLED query set (the
    * standard protocol; `queries` is the sample), against which both
    * sides broadcast. The hit join is (qid, cid)-keyed on two k-row
    * frames per query. */
  def recallAtK(vectors: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16): DataFrame = {
    val truth = cosineTopK(queries, vectors, k)
      .select(col("qid"), col("cid"))
    val approx = ivfTopK(vectors, queries, k, nCells)
      .select(col("qid"), col("cid"))
    val nTruth = truth.groupBy(col("qid")).agg(count(lit(1)).as("n_truth"))
    val hits = truth.join(approx, Seq("qid", "cid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    nTruth.join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("hits"))
      .select(col("qid"), col("n_truth"), col("hits"),
        (col("hits").cast("double") / col("n_truth")).as("recall"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * restricted to LSH-bucket collisions (the scale path for near-dup
    * detection over embeddings).
    *
    * nPlanes is a SCALE knob, same law as [[semanticDedup]]'s nCells:
    * 2^nPlanes buckets bound the within-bucket quadratic at ~N²/2^p
    * expected pair work, so p must grow with the corpus — and the
    * default (`nPlanes = 0`) now SELF-SCALES to
    * max(6, ceil(log₂N / 2)) clamped to 16, i.e. 2^p ≈ √N, the same
    * balance point as semanticDedup's √N cells. Measured
    * (ProfileQ48Scale, permutation-scaled fixtures): at 200k vectors a
    * FIXED p=6 costs 140.9 s — ×204 for 10× data, the within-bucket
    * quadratic reclaiming everything, exactly the q132 pathology in
    * LSH form — while the law's p=9 runs 14.6 s (×32 vs the
    * law-scaled 20k point, inside the N^1.5 budget). The law floors
    * at p=6 for every driver fixture (N ≤ 2000), so gate results are
    * unchanged; OpsSpec pins the law's values. Each added plane also
    * halves recall at a given angular distance — the standard LSH
    * tradeoff; band multiple runs for recall at large p, or pass an
    * explicit nPlanes to pin recall. Auto mode derives N from one
    * `vectors.count()` — footer-cheap on parquet-backed frames;
    * persist an expensive computed input first (the [[semanticDedup]]
    * autoCells contract). */
  def cosineNearDups(vectors: DataFrame, threshold: Double,
      nPlanes: Int = 0): DataFrame = {
    require(nPlanes >= 0,
      s"nPlanes must be >= 0 (0 = auto-scale); got $nPlanes")
    val p = if (nPlanes > 0) nPlanes else autoPlanes(vectors.count())
    // bucket + quantized vector in one map pass (no vec_id join-back)
    val v = withBucket(spread(vectors), "vec_id", "qv", p)
    v.as("x").join(v.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (dot(col("x.qv"), col("y.qv")).cast("double") /
          (sqrt(dot(col("x.qv"), col("x.qv")).cast("double")) *
           sqrt(dot(col("y.qv"), col("y.qv")).cast("double")))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[cosineNearDups]]' auto plane count: 2^p ≈ √N (see its scaladoc),
    * floored at 6 (every driver fixture), capped at 16. */
  private[graft] def autoPlanes(n: Long): Int =
    math.min(16, math.max(6,
      math.ceil(math.log(math.max(n, 2L).toDouble) /
        math.log(2.0) / 2.0).toInt))

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings with the deterministic IVF
    * coarse quantizer, compare pairs WITHIN each cell only, and drop any
    * vector whose cell holds a lower-id neighbor at cosine ≥ `threshold`
    * (the paper keeps one representative per within-cluster duplicate
    * group; lowest-id is the deterministic stand-in for its random
    * pick). Returns every vector as (vec_id, cell_id, is_kept).
    *
    * Shape at scale: this is the whole point of the paper's design — the
    * quadratic comparison is bounded per cell, never corpus-wide. The
    * cell assignment is one broadcast-seed map pass ([[ivfAssign]]); the
    * self-join shuffles each side once keyed by cell_id; survivors come
    * from one more vec_id-keyed left join.
    *
    * nCells MUST grow with the corpus, or the within-cell quadratic
    * silently reclaims the cost the clustering was bounding: with c
    * cells the compare does ~N²/c pair work and the fused assignment
    * does N·c kernel evals, so c = √N balances them at ~2·N^1.5 total
    * (measured: the sf10 growth anchor went ×253 for 10× data on a
    * FIXED c=16, vs the ~×31 the √N law gives). `nCells = 0` (the
    * default) self-scales to ceil(√N) clamped to [16, 1024] — the upper
    * clamp bounds the literal-centroid codegen; corpora past ~1M
    * vectors should pre-partition (or [[kmeansRefine]] for balance) and
    * dedup shards. A skewed giant cell is the other known failure mode
    * — refine the quantizer with [[kmeansRefine]] before deduping if
    * assignment stats show one. */
  def semanticDedup(vectors: DataFrame, threshold: Double = 0.9,
      nCells: Int = 0): DataFrame = {
    // driver-side preparation is ONE corpus job: the count rides the
    // seed TakeOrdered as an observe metric (countAndSeeds), feeds the
    // √N cell law, and the seed prefix is bit-identical to ivfSeeds'
    // TakeOrdered pick
    val seeds =
      if (nCells > 0) ivfSeeds(vectors, nCells)
      else {
        val (n, top) = countAndSeeds(vectors, maxSeeds = 1024)
        top.take(cellLaw(n))
      }
    // one fused map pass assigns cells AND carries qv — the previous
    // shape joined the quantized corpus back onto the assignment.
    // spread() like every other corpus-scale assignment caller: the
    // per-row nCells×dist2 work must not run at input-file parallelism
    val v = assignedWithSeeds(spread(vectors), seeds)
      .select(col("vec_id"), col("qv"), col("cell_id"))
    val cells = v.select(col("vec_id"), col("cell_id"))
    val losers = v.as("x").join(v.as("y"),
        col("x.cell_id") === col("y.cell_id") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id").as("vec_id"),
        (dot(col("x.qv"), col("y.qv")).cast("double") /
          (sqrt(dot(col("x.qv"), col("x.qv")).cast("double")) *
           sqrt(dot(col("y.qv"), col("y.qv")).cast("double")))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    cells.join(losers, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        col("is_dup").isNull.as("is_kept"))
  }

  /** Lloyd (k-means) refinement of the IVF coarse quantizer: start from
    * the deterministic seed centroids (`ivfAssign`'s quantizer), then
    * alternate assignment and centroid recomputation for `iters` rounds.
    * Returns the final (vec_id, cell_id, dist2) assignment.
    *
    * Scale shape per round: centroids are nCells·dim doubles — broadcast
    * to the assignment map stage (no shuffle of the vectors); the
    * recompute is a posexplode + two-level hash aggregation keyed by
    * (cell, dim), i.e. one shuffle of nCells·dim partial sums per task,
    * never the raw vectors.
    *
    * Determinism: per-dimension sums are EXACT int64 sums of the
    * quantized components (order-free); means divide those exact sums
    * (IEEE division, deterministic); per-vector distances fold the
    * 64 dimensions in fixed array order; argmin ties break by cell_id.
    * The result is bit-identical across partitionings, retries and
    * cluster sizes. Empty cells keep their previous centroid. */
  /** Seed centroids for the Lloyd loop: the nCells lowest-id vectors as
    * double arrays, renumbered 1..n in id order. The pick is a bounded
    * top-k (TakeOrderedAndProject), never a global sort; the renumbering
    * window runs over nCells rows only. */
  private def seedCentroids(v: DataFrame, nCells: Int): DataFrame =
    v.orderBy(col("vec_id")).limit(nCells)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))).cast("long").as("cell_id"),
        transform(col("qv"), x => x.cast("double")).as("cm"))

  /** Centroids as BOUNDED DRIVER STATE: nCells·dim doubles — the same
    * budget class as [[ivfSeeds]]. */
  private def collectCentroids(cents: DataFrame): Array[(Long, Seq[Double])] =
    cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Lloyd-centroid variant of [[assignFused]]: `v` already carries qv;
    * the kernel is dist2d (double centroids). Bit-identical to the old
    * broadcast+min_by form (strict-order kernel folds, same ties). */
  private def assignWithCentroids(v: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame =
    assignFused(v, cents.map { case (id, cm) =>
      (id, graft.functions.LongVec.dist2d(col("qv"), typedLit(cm)))
    }, emptyDistType = "double")

  private def assignToCentroids(v: DataFrame, cents: DataFrame): DataFrame =
    assignWithCentroids(v, collectCentroids(cents))
      .select(col("vec_id"), col("cell_id"), col("dist2"))

  /** Per-(cell, dim) statistics of an assignment: exact int64 component
    * sums, member counts, and the double means the next Lloyd round uses.
    * Returns (cell_id, g, s, c, cm) with g 1-based. */
  private def centroidStats(v: DataFrame, asg: DataFrame): DataFrame =
    // rows stay whole through the member-scale pass (vec_moments buffers
    // the per-cell element-wise sums map-side); only the cells-sized
    // moment frame is exploded back to the per-(cell, dim) layout
    asg.join(v, "vec_id")
      .groupBy(col("cell_id"))
      .agg(graft.functions.VecMoments(col("qv")).as("m"))
      .select(col("cell_id"), col("m.n").as("c"),
        posexplode(col("m.s")).as(Seq("pos", "s")))
      .select(col("cell_id"), (col("pos") + 1).cast("long").as("g"),
        col("s"), col("c"), (col("s").cast("double") / col("c")).as("cm"))

  /** ONE exact Lloyd step, exposed for oracle verification
    * (q73b_kmeans_iter1): assignment against the seed centroids — all
    * integer-valued doubles, so the distance sums are exact and
    * order-free — then the refreshed per-(cell, dim) statistics. Every
    * value is engine-exact (int64 sums, counts, one IEEE division), so a
    * SQL oracle hash-matches the full first iteration of the otherwise
    * un-oracle-able iterative loop; it runs through the same
    * seedCentroids/assignToCentroids/centroidStats code `kmeansRefine`
    * iterates. */
  def kmeansStep(vectors: DataFrame, nCells: Int = 8): DataFrame = {
    val v = spread(vectors)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
    centroidStats(v, assignToCentroids(v, seedCentroids(v, nCells)))
  }

  def kmeansRefine(vectors: DataFrame, nCells: Int = 16,
      iters: Int = 2): DataFrame = {
    val v = spread(vectors)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // finally-unpersist: a failed refinement round (Stage materializes
    // eagerly) must not pin the quantized corpus in the session cache
    try {
      // seed centroids: the first nCells vectors, as exact-int means.
      // Centroids live on the DRIVER between rounds (nCells·dim
      // doubles): each Lloyd round is then ONE fused map pass
      // (assignment, qv carried — no corpus join-back, no min_by
      // shuffle) plus a map-side-combined cells-sized aggregation whose
      // k rows come back to the driver. No Stage needed — every round's
      // plan derives from the cached v and literals only, so lineage
      // never grows.
      var cents = collectCentroids(seedCentroids(v, nCells))
      (1 to iters).foreach { _ =>
        // exact per-cell int64 component sums -> double means, directly
        // as dimension-ordered arrays: vec_moments keeps rows whole
        // through the member pass (same values as centroidStats —
        // kmeansStep's oracle pins that code path — without the
        // posexplode + collect_list/array_sort regroup)
        val fresh = assignWithCentroids(v, cents)
          .groupBy(col("cell_id"))
          .agg(graft.functions.VecMoments(col("qv")).as("m"))
          .select(col("cell_id"),
            transform(col("m.s"), s => s.cast("double") / col("m.n"))
              .as("cm"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        // empty cells keep the previous centroid
        cents = cents.map { case (id, old) => (id, fresh.getOrElse(id, old)) }
      }
      // the final assignment CONSUMES v lazily — it is a map pass over
      // the (re-readable) quantized projection, safe after unpersist
      assignWithCentroids(v, cents)
        .select(col("vec_id"), col("cell_id"), col("dist2"))
    } finally v.unpersist()
  }

  /** Symmetric int8 scalar-quantization QA (embedding compression):
    * per vector, the max-magnitude scale, the saturated-code count, and
    * the exact reconstruction MSE of `code = floor(x·127 / amax)` codes
    * dequantized as `code·amax/127`.
    *
    * Exactness: amax and the codes derive from the exact int64-quantized
    * components (`quantized`); the only floating steps are one IEEE
    * division per element and the error fold, both in strict array order
    * — bit-identical across engines. Zero vectors take amax=1 so codes
    * and error are exactly 0 (documented convention, not a div-by-zero).
    *
    * Scale: pure per-row map work over the vector column — no shuffle,
    * no state; runs at scan width on any corpus size. */
  def int8QuantQA(vectors: DataFrame): DataFrame = {
    vectors
      .select(col("vec_id"), quantized(col("embedding")).as("xq"))
      .select(col("vec_id"), col("xq"), greatest(
        array_max(transform(col("xq"), x => abs(x))), lit(1L)).as("amax"))
      .select(col("vec_id"), col("amax"),
        size(filter(transform(col("xq"), x =>
            floor((x * 127).cast("double") / col("amax"))),
          c => abs(c) === 127)).cast("long").as("n_sat"),
        (aggregate(transform(col("xq"), x => {
            val err = x.cast("double") -
              floor((x * 127).cast("double") / col("amax")) *
                col("amax").cast("double") / 127.0d
            err * err
          }), lit(0.0), (acc, e) => acc + e) /
          size(col("xq")).cast("double")).as("mse"))
  }

  /** Label-consistency check by exact nearest-centroid classification:
    * build the per-label centroid of the quantized embeddings, assign
    * every vector to its nearest centroid, and report per-label
    * (n, n_correct, accuracy). Low accuracy for a label flags noisy or
    * overlapping labels — the standard embedding-space QA pass before
    * training on labeled data.
    *
    * Exactness: comparing ||x − s/n||² across labels multiplies through
    * by n² — argmin of Σ_g (n·x_g − s_g)² / n²,  with n, s, x all exact
    * int64. The per-dim term and its square are computed in DECIMAL(38,0)
    * (HUGEINT in the oracle): |n·x − s| ≤ 2·n·10⁵, so an int64 square
    * would overflow once a label exceeds ~15k members — the decimal
    * widening keeps the distance exact at any corpus size (squares stay
    * under 10³⁸ for n up to ~10¹⁶ rows). Ties break by label id. The n²
    * denominators differ per label, so the comparison divides exactly:
    * d2·(n'²) vs d2'·(n²) — again decimal-exact.
    *
    * Scale shape: centroids are a labels-sized vec_moments aggregation
    * (whole rows map-side, no dims-fold explode) — tiny shuffle — then
    * broadcast; assignment is one codegen'd 128-bit kernel eval per
    * (vector, label) pair (functions.LongVec.nscaledDist2) in a single
    * map-side pass; the argmin is a sort-free min_by hash aggregation
    * keyed by vector. */
  def nearestCentroid(vectors: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = spread(vectors)
      .select(col("vec_id"), col("label").cast("long").as("true_label"),
        quantized(col("embedding")).as("qv"))
    // per-label centroid moments: whole rows through vec_moments (no
    // dims-fold explode); the frame is labels-sized and broadcasts
    val cent = v.groupBy(col("true_label").as("label"))
      .agg(graft.functions.VecMoments(col("qv")).as("m"))
      .select(col("label"), col("m.s").as("s"), col("m.n").as("nl"))
    // distance of every vector to every label centroid, scaled by nl²;
    // cross-label comparison multiplies through by the other nl². ONE
    // codegen'd 128-bit kernel eval per (vector, label) pair — the
    // exploded form paid dims× rows into a per-pair DECIMAL aggregation
    // for the same exact integer (LongVecSpec asserts equality)
    val wide = DecimalType(38, 0)
    val d = v.join(broadcast(cent))
      .select(col("vec_id"), col("true_label"), col("label"), col("nl"),
        graft.functions.LongVec.nscaledDist2(col("qv"), col("s"), col("nl"))
          .as("d2"))
    // sort key divides out this label's nl²: d2/nl² as DOUBLE. Both casts
    // are correctly-rounded (BigDecimal.doubleValue / HUGEINT→DOUBLE) and
    // the IEEE division is then identical in both engines; exact-decimal
    // division would instead round at an engine-chosen scale. Residual
    // double ties break by label id, deterministically.
    val pred = d
      .select(col("vec_id"), col("true_label"), col("label"),
        // nl² through the SAME decimal widening as the numerator: an
        // int64 nl*nl would wrap once a label holds >~3e9 members,
        // poisoning the sort key while d2 stayed exact
        (col("d2").cast("double") /
          (col("nl").cast(wide) * col("nl")).cast("double")).as("key"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("true_label"), col("label")),
        struct(col("key"), col("label"))).as("m"))
      .select(col("vec_id"), col("m.true_label").as("true_label"),
        col("m.label").as("pred_label"))
    pred.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_label") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy", col("n_correct").cast("double") / col("n"))
  }

  /** Embedding cluster-quality QA (Davies-Bouldin-style, exact): per
    * label, the mean squared distance of members to their own centroid
    * (intra) and the squared distance to the NEAREST other centroid
    * (inter), plus their ratio — separation < 1 means the nearest foreign
    * centroid is closer than the label's own spread.
    *
    * Exactness: centroids are rationals s/nl; both metrics are computed
    * as exact DECIMAL(38,0) integer numerators over exact denominators
    * and only the final divisions are IEEE doubles, so results are
    * bit-identical across engines and partitionings:
    *   intra(L)  = Σ_{v∈L,g} (nl·x − s)² / nl³
    *   inter(i,j) = Σ_g (s_i·n_j − s_j·n_i)² / (n_i·n_j)²
    * The intra numerator uses the algebraic expansion
    *   Σ_v,g (nl·x − s)² = nl·(nl·Σq − Σs²)   (per label; Σ_v x_g = s_g)
    * — an identity over exact integers, so the result is bit-identical
    * to the direct form while needing only per-label moment aggregates
    * (element-wise Σx, Σx², count) instead of a second member-scale
    * pass joining every row back to its centroid. DECIMAL(38,0) bounds:
    * both forms sum nl³·1e10-scale terms, holding to ~1e9 members per
    * label at |x|≤1e5 quantization; the int64 moment buffers themselves
    * fail loudly past ~10⁸ members per label (vec_moments uses addExact).
    *
    * Scale: ONE member-scale pass with rows kept WHOLE — the per-label
    * `vec_moments` aggregate (functions/VecMoments) folds each vector
    * into a labels-sized Array[Long] buffer map-side, so the dims×
    * row inflation a posexplode + (label, dim)-keyed aggregation pays is
    * gone and only labels × dims longs reach the exchange — plus a
    * labels²-sized centroid self-join that never touches the big side.
    * The member scan is NOT pre-repartitioned: a real embedding table is
    * multi-file parquet that splits natively across the cluster, so an
    * up-front exchange would shuffle the whole vector table once for
    * nothing. */
  def clusterQuality(vectors: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val wide = DecimalType(38, 0)
    val decZero = lit(0).cast(wide)
    // NULL-label rows are excluded up front: a row with no cluster label
    // has no centroid (the reference semantics — a null-rejecting join on
    // label — drop it from both metrics).
    // The per-label moment frame feeds three consumers (intra, both
    // self-join sides); persisting the (tiny, labels-bounded) frame pins
    // the member pass to exactly one evaluation at any scale. Like the
    // other operators that persist an internal frame (nearDuplicates,
    // shingleNovelty), the cache lives until the session clears it —
    // labels×dims-bounded, so the footprint is constant per evaluation;
    // long-lived sessions running many evaluations clear between them
    // (Bench does).
    // raw float arrays stream straight into the aggregate (it quantizes
    // inline, bit-identically to `quantized`) — no interpreted transform
    // lambda between the scan and the buffer
    val m = vectors
      .filter(col("label").isNotNull)
      .select(col("label").cast("long").as("label"), col("embedding"))
      .groupBy(col("label"))
      .agg(graft.functions.VecMoments(col("embedding")).as("m"))
      .select(col("label"), col("m.n").as("nl"), col("m.s").as("s"),
        col("m.q").as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // intra via the expansion above: Σ_g folds run over labels × dims
    // array elements (tiny), in exact decimal
    val nlW = col("nl").cast(wide)
    val sumQ = aggregate(col("q"), decZero,
      (acc, x) => (acc + x.cast(wide)).cast(wide))
    val sumS2 = aggregate(col("s"), decZero,
      (acc, x) => (acc + x.cast(wide) * x.cast(wide)).cast(wide))
    val intra = m.select(col("label"), col("nl"),
      ((nlW * (nlW * sumQ - sumS2)).cast("double") /
        (nlW * col("nl") * col("nl")).cast("double")).as("intra"))
    // inter: centroid-pair distances on the labels² self-join; the
    // per-dimension cross terms fold over the two moment arrays in exact
    // decimal (labels² × dims lambda evaluations — interpreted, but the
    // frame is labels-bounded, never corpus-scale)
    val ci = m.select(col("label").as("li"), col("s").as("si"),
      col("nl").as("ni"))
    val cj = m.select(col("label").as("lj"), col("s").as("sj"),
      col("nl").as("nj"))
    val num = aggregate(
      zip_with(col("si"), col("sj"), (a, b) =>
        (a.cast(wide) * col("nj") - b.cast(wide) * col("ni")).cast(wide)),
      decZero, (acc, t) => (acc + t * t).cast(wide))
    val pairD2 = ci.join(cj, col("li") =!= col("lj"))
      .select(col("li"), col("lj"),
        (num.cast("double") /
          (col("ni").cast(wide) * col("nj") * col("ni") * col("nj"))
            .cast("double")).as("inter"))
    val nearest = pairD2.groupBy(col("li").as("label"))
      .agg(min_by(struct(col("lj"), col("inter")),
        struct(col("inter"), col("lj"))).as("m"))
      .select(col("label"), col("m.lj").as("nearest_label"),
        col("m.inter").as("inter"))
    // LEFT join: a single-label input has no centroid pairs, but its
    // intra spread is still the QA result (nearest/inter/separation null)
    intra.join(nearest, Seq("label"), "left")
      .select(col("label"), col("nl"), col("intra"), col("nearest_label"),
        col("inter"), (col("inter") / col("intra")).as("separation"))
  }

  // ---- product quantization (the memory-scale path for ANN) -----------

  /** PQ codebook from the first `ks` vectors by vec_id (the engine's
    * deterministic seed convention, cf. [[ivfAssign]]/`seedCentroids`):
    * `codebook(sub)(code-1)` is the exact int64-quantized subvector of
    * seed `code` in subspace `sub`. A real deployment k-means-trains the
    * codebook on a bounded sample; either way it is m×ks×(d/m) longs —
    * here 1 KiB — so collecting it to the driver and inlining it into
    * codegen'd expressions is the bounded-probe pattern, not a
    * driver-side loop over data. */
  def pqCodebook(vectors: DataFrame, m: Int = 8,
      ks: Int = 16): Array[Array[Array[Long]]] = {
    val seeds = vectors.orderBy(col("vec_id")).limit(ks)
      .select(quantized(col("embedding")).as("qv"))
      .collect().map(_.getSeq[Long](0).toArray)
    require(seeds.nonEmpty, "pqCodebook: empty vector table")
    val d = seeds.head.length
    require(d % m == 0, s"pqCodebook: dims $d not divisible by m=$m")
    val dsub = d / m
    Array.tabulate(m)(s => seeds.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  /** PQ encode: each vector → `m` codebook indices (1-based), the
    * nearest codeword per subspace by exact int64 L2², ties to the
    * lowest code. 100 TB rationale: the encoded corpus is m small ints
    * per vector instead of d floats (here 8 bytes vs 256) — the index
    * that lets ANN hold a trillion vectors in cluster memory. The
    * argmin unrolls as a `least(struct(dist2, code)…)` chain over
    * codegen'd [[graft.functions.LongVec.dist2]] kernels against literal
    * codewords: a pure map pass, no shuffle, no per-row regroup. */
  def pqEncode(vectors: DataFrame,
      codebook: Array[Array[Array[Long]]]): DataFrame = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    val qv = quantized(col("embedding"))
    val codes = (0 until m).map { s =>
      val sv = slice(qv, lit(s * dsub + 1), lit(dsub))
      least(codebook(s).zipWithIndex.map { case (cw, i) =>
        struct(graft.functions.LongVec.dist2(sv, typedLit(cw.toSeq)).as("d"),
          lit((i + 1).toLong).as("code"))
      }: _*).getField("code")
    }
    vectors.select(col("vec_id"), array(codes: _*).as("codes"))
  }

  /** PQ asymmetric-distance top-k: score every encoded vector against
    * each query through the query's per-subspace distance table instead
    * of its raw vector. Exact int64 throughout, so the ranking is
    * reproducible (the APPROXIMATION is PQ itself — codeword distance
    * stands in for vector distance; [[pqEncode]]'s oracle pins the codes
    * and this operator's oracle pins the table lookup + sum).
    *
    * Scale shape: the query side carries one m×ks int table per query,
    * broadcast; the corpus side streams the pre-encoded (vec_id, codes)
    * index — the scan reads NO embedding column. Per (query, vector) the distance is m
    * element_at lookups + adds, statically unrolled (no lambda, stays in
    * whole-stage codegen); the global top-k per query plans as a
    * TakeOrderedAndProject-style windowed heap, never a full sort of the
    * corpus. */
  def pqAdcTopK(encoded: DataFrame, queries: DataFrame, k: Int,
      codebook: Array[Array[Array[Long]]]): DataFrame = {
    val m = codebook.length
    val ks = codebook(0).length
    val dsub = codebook(0)(0).length
    val qv = quantized(col("embedding"))
    // flat distance table, subspace-major: tab(s*ks + code-1)
    val tab = array((0 until m).flatMap { s =>
      val sv = slice(qv, lit(s * dsub + 1), lit(dsub))
      codebook(s).map(cw =>
        graft.functions.LongVec.dist2(sv, typedLit(cw.toSeq)))
    }: _*)
    val q = queries.select(col("vec_id").as("qid"), tab.as("tab"))
    val enc = encoded.select(col("vec_id").as("cid"), col("codes"))
    val adist2 = (0 until m).map { s =>
      element_at(col("tab"), (lit(s * ks) + element_at(col("codes"), s + 1))
        .cast("int"))
    }.reduce(_ + _)
    val scored = enc.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adist2.as("adist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adist2"), col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One-way ANOVA F-statistic per embedding dimension against a label
    * column — the classic filter-method feature selector: which
    * dimensions separate the classes (high F) and which are noise
    * (F ≈ 1). Returns (g, ssb, ssw, f): scaled between-/within-class
    * sums of squares and F = (ssb/(k−1)) / (ssw/(N−k)).
    *
    * Determinism: group sums and sums-of-squares are exact int64 over
    * the quantized components; the two division-bearing reductions
    * (Σ_l s_l²/n_l and S²/N) round each term ONCE to an integer before
    * the exact sum (the q122 contract — a plain float Σ over labels
    * would be merge-order-dependent), so ssb/ssw are exact int64 and F
    * is one IEEE expression over them.
    *
    * Shape at scale: ONE (label, dim)-keyed aggregation (map-side
    * combined; k·d rows out), re-aggregated to d rows — the label
    * dimension is bounded, nothing corpus-sized crosses the wire
    * twice. Overflow: Σx² reaches ~5e13 per (label, dim) at these
    * magnitudes; at ≥1e9 rows per label widen the ss sums to
    * DECIMAL(38,0) as in [[dimCovariance]]. */
  def anovaFPerDim(vectors: DataFrame, labelCol: String = "label")
      : DataFrame = {
    val xv = spread(vectors)
      .filter(col("embedding").isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("long").as("lbl"),
        posexplode(quantized(col("embedding"))).as(Seq("p", "x")))
      .select(col("lbl"), (col("p") + 1).cast("long").as("g"), col("x"))
    val perLbl = xv.groupBy(col("g"), col("lbl"))
      .agg(count(lit(1)).as("nl"), sum(col("x")).as("sl"),
        sum(col("x") * col("x")).as("ssl"))
    perLbl
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("nl")).as("n"),
        sum(col("sl")).as("s"),
        sum(col("ssl")).as("ss"),
        // Σ_l round(s_l²/n_l): per-label term rounded once, exact sum
        sum(round(col("sl").cast("double") * col("sl") / col("nl"))
          .cast("long")).as("a"))
      .select(col("g"), col("k"), col("n"),
        (col("a") - round(col("s").cast("double") * col("s") / col("n"))
          .cast("long")).as("ssb"),
        (col("ss") - col("a")).as("ssw"))
      .select(col("g"), col("ssb"), col("ssw"),
        ((col("ssb").cast("double") / (col("k") - 1))
          / (col("ssw").cast("double") / (col("n") - col("k")))).as("f"))
  }

  /** Embedding-level benchmark contamination screen — the SEMANTIC face
    * of the contamination family (q65 exact n-grams, q115 bloom, q126
    * text near-dups): flag corpus vectors whose nearest same-bucket
    * benchmark vector reaches `threshold` cosine. Paraphrased benchmark
    * leakage carries no shared n-grams — the embedding screen is what
    * catches it.
    *
    * Returns one row per corpus vector with ≥ 1 same-bucket benchmark
    * candidate: (vec_id, best_match, cosine, contaminated).
    *
    * Shape at scale: the benchmark side is eval-set-sized by contract —
    * its bucketed quantized vectors BROADCAST; the corpus streams
    * map-side through its own bucket hash and an equi-join on the
    * bucket key. Candidates are bucket-restricted (the q46 recall
    * contract: single-table LSH — recall rises with nPlanes tables in
    * [[ivfTopK]]-style variants); cosines are exact-int dot/norm
    * rationals, so the screen is deterministic cross-engine. */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.35, nPlanes: Int = 8): DataFrame = {
    // bucket + quantized vector per side in one map pass each (no
    // vec_id join-backs — the fused ivfAssign lesson)
    val cb = withBucket(spread(corpus), "vec_id", "cv", nPlanes)
    val bb = withBucket(benchmark, "bid", "bv", nPlanes)
    val scored = cb.join(broadcast(bb), Seq("bucket"))
      .select(col("vec_id"), col("bid"),
        (dot(col("cv"), col("bv")).cast("double") /
          (sqrt(dot(col("cv"), col("cv")).cast("double")) *
           sqrt(dot(col("bv"), col("bv")).cast("double")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("bid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bid").as("best_match"), col("cosine"),
        (col("cosine") >= threshold).as("contaminated"))
  }

  /** Z-score standardization of every embedding component against the
    * corpus per-dimension mean/variance — the preprocessing step ahead
    * of cosine/k-means work when dimensions carry wildly different
    * scales. Returns (vec_id, g, z) with z rounded to 6 decimals.
    *
    * Determinism: μ_g = S/N and σ²_g = SS/N − μ² are fixed-order IEEE
    * expressions over exact int64 sums (the [[dimCovariance]]
    * discipline); z rounds once. Dimensions with σ² ≤ 0 (constant
    * columns) emit z = 0 rather than NaN.
    *
    * Shape at scale: ONE d-keyed stats aggregation (map-side combined,
    * d rows out) broadcast back onto the component stream — the corpus
    * is touched twice map-side, shuffled never (beyond the d-row
    * frame). */
  def standardized(vectors: DataFrame): DataFrame = {
    val xv = spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(quantized(col("embedding"))).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("g"), col("x"))
    val stats = xv.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .select(col("g"),
        (col("s").cast("double") / col("n")).as("mu"),
        (col("ss").cast("double") / col("n") -
          (col("s").cast("double") / col("n")) *
          (col("s").cast("double") / col("n"))).as("var"))
    xv.join(broadcast(stats), "g")
      .select(col("vec_id"), col("g"),
        when(col("var") > 0,
          round((col("x") - col("mu")) / sqrt(col("var")) * 1e6)
            .cast("long").cast("double") / 1e6)
          .otherwise(0.0).as("z"))
  }

  /** Robust per-dimension scaling — (x − median) / IQR — the
    * outlier-resistant cousin of [[standardized]] (a handful of
    * corrupt extreme components move the mean/variance but not the
    * quartiles). Returns (vec_id, g, r) rounded to 6 decimals;
    * zero-IQR dimensions emit 0.
    *
    * Cross-engine exactness: Spark's `percentile` and DuckDB's
    * `quantile_cont` share the linear-interpolation definition over
    * exact int64 components (hash-match precedent: q95), and the scale
    * expression rounds once.
    *
    * Scale note: EXACT per-group percentiles buffer the group's values
    * (this is the QA/audit face, like q95); at corpus scale swap the
    * quartile frame for `percentile_approx` — rank-error bounded as
    * q117 proves — and the apply pass is unchanged (the quartile frame
    * stays d rows either way, broadcast back onto a map-side pass). */
  def robustScaled(vectors: DataFrame): DataFrame = {
    val xv = spread(vectors).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(quantized(col("embedding"))).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("g"), col("x"))
    val q = xv.groupBy(col("g"))
      .agg(expr("percentile(x, 0.5)").as("med"),
        (expr("percentile(x, 0.75)") - expr("percentile(x, 0.25)"))
          .as("iqr"))
    xv.join(broadcast(q), "g")
      .select(col("vec_id"), col("g"),
        when(col("iqr") > 0,
          round((col("x") - col("med")) / col("iqr") * 1e6)
            .cast("long").cast("double") / 1e6)
          .otherwise(0.0).as("r"))
  }

  /** Round-half-away-from-zero on the EXACT binary value of a double —
    * the semantics Spark's SQL `round` (BigDecimal HALF_UP) and
    * DuckDB's `round` share. `math.round` (floor(x+0.5)) double-rounds
    * near halves, so it cannot be used where a SQL oracle must
    * reproduce the result. */
  private def rhu(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Top principal component by power iteration over the EXACT
    * dimension covariance ([[dimCovariance]]) — embedding-space QA's
    * next step after the covariance screen: the dominant variance
    * direction and its eigenvalue (whitening, drift tracking, dead-dim
    * analysis all start here).
    *
    * Returns one row per dimension: (g, loading, eigenvalue) with the
    * final iterate's unit-norm loading and the Rayleigh-quotient
    * eigenvalue (same value on every row).
    *
    * Distribution boundary (the k-center/k-means-seed pattern): the
    * corpus-sized work is the covariance pass — distributed, exact,
    * one shuffle; the iteration itself runs on the driver over the
    * d²-bounded matrix, which is the correct side of the boundary for
    * d in the thousands and below.
    *
    * Determinism (cross-engine, the q122 contract taken to a fixpoint
    * loop): the iterate v is an EXACT ×10⁶-scaled int64 vector at every
    * step. One step: term_ij = round(C_ij·v_j) (HALF_UP — [[rhu]]),
    * w_i = Σ_j term_ij (exact int64), ‖w‖² = Σ w_i² (exact BigInt —
    * w_i reaches ~6e17, its square overflows int64), and
    * v'_i = round(w_i/√‖w‖²·10⁶). Every float op is a single IEEE
    * operation on exactly-agreed inputs, every sum is integer, so an
    * unrolled SQL replica (the q174 oracle) reproduces the ENTIRE
    * trajectory bit-for-bit — no float-summation-order hazard at any
    * step. C itself hash-matches cross-engine already (q160). */
  def pcaTopComponent(vectors: DataFrame, iters: Int = 8): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val covRows = dimCovariance(vectors)
      .select(col("g1"), col("g2"), col("cov")).collect()
    require(covRows.nonEmpty,
      "pcaTopComponent needs a non-empty embedding column")
    val d = covRows.map(_.getLong(1).toInt).max
    val C = Array.ofDim[Double](d + 1, d + 1)
    covRows.foreach { r =>
      val (a, b, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      C(a)(b) = c
      C(b)(a) = c
    }
    def step(v: Array[Long]): Array[Long] =
      Array.tabulate(d + 1) { i =>
        if (i == 0) 0L
        else {
          var s = 0L
          var j = 1
          while (j <= d) { s += rhu(C(i)(j) * v(j)); j += 1 }
          s
        }
      }
    var v = Array.tabulate(d + 1)(i =>
      if (i == 0) 0L else rhu(1e6 / math.sqrt(d.toDouble)))
    var live = true
    (1 to iters).foreach { _ =>
      if (live) {
        val w = step(v)
        val norm2 = w.map(x => BigInt(x) * BigInt(x)).sum
        // degenerate (all-zero covariance, e.g. constant embeddings):
        // C·v = 0 — stop at the current iterate rather than divide by 0
        // and feed NaN into the rounding
        if (norm2 == 0) live = false
        else {
          val nrm = math.sqrt(norm2.toDouble)
          v = w.map(wi => rhu(wi.toDouble / nrm * 1e6))
        }
      }
    }
    val wf = step(v)
    val num = (1 to d).map(i => BigInt(wf(i)) * BigInt(v(i))).sum
    val den = (1 to d).map(i => v(i) * v(i)).sum
    val lam = num.toDouble / den.toDouble
    (1 to d).map(g => (g.toLong, v(g).toDouble / 1e6, lam))
      .toDF("g", "loading", "eigenvalue")
  }
}
