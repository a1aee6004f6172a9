package graft.silver

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

import graft.sources.Tables

/** Bucketed silver tables: the co-located-join layout for upsert-heavy
  * tables at scale.
  *
  * The merge's probe ("which target rows match a source key?") is a join
  * on the primary key. On an unbucketed table every merge shuffles the
  * ENTIRE target — O(table) network per micro-batch, the dominant cost at
  * 100 TB. Persisting silver bucketed by the PK (`bucketBy(n, pks)` +
  * `sortBy`) makes the target side exchange-free: Spark reads each bucket
  * as a pre-partitioned, pre-sorted input and only the (small) incoming
  * batch shuffles to match. The test suite asserts the plan property
  * (exactly one Exchange — the source side).
  *
  * Bucket count is fixed at table creation; production sizing is
  * ceil(projected table size / target partition size) rounded to a
  * multiple of the cluster's parallelism.
  */
object BucketedTables {

  /** Create-or-merge `source` into the bucketed table `db.table`,
    * keyed by `keys`. Same semantics as `Upsert.merge` (source wins on
    * key collision). Tables are EXTERNAL with per-write generation
    * directories and a metadata-only swap, same protocol and same
    * torn-read rationale as the layout path below (a managed
    * DROP+RENAME lets a stale-metadata reader successfully read an
    * EMPTY table — BucketRefreshSoakSpec caught it on layouts); the
    * replaced generation is retained until the next merge retires it.
    *
    * BUCKET-SCOPED: a merge only changes the key-hash buckets that
    * contain source keys (the target's bucket law is the SAME
    * pmod(murmur3(keys), n) the changed-set probe evaluates), so the
    * merge reads ONLY the changed buckets' files, merges them with the
    * batch, stages their replacements, and carries every other bucket's
    * file across as a hard link — merge cost is O(batch + touched
    * buckets), not O(table), the per-batch cost law the incremental
    * session store established (r10 verdict task 2) applied to the
    * general silver merge. A staged-file `require` re-checks per merge
    * that no staged file escaped the changed set. Falls back to the
    * full rewrite when the batch would change the table's SCHEMA (a
    * carried file must stay byte-identical to its full-rebuild
    * content), when the live bucket spec doesn't match `(numBuckets,
    * keys)` (the rewrite repairs the spec), or when every bucket is
    * touched.
    *
    * Cost note: `source` is evaluated twice — once by the changed-set
    * probe, once by the staged write (the same double-evaluation the
    * bucketed state fold accepts for its delta). Persist an expensive
    * computed source before calling; parquet-backed batches re-scan
    * cheaply. */
  def writeMerged(spark: SparkSession, db: String, table: String,
      source: DataFrame, keys: Seq[String], numBuckets: Int = 8): Unit = {
    // names go into DDL text (CREATE/DROP/RENAME) and `__merge_tmp` is
    // reserved for the swap staging table — validate up front
    require(db.matches("[A-Za-z0-9_]+") && table.matches("[A-Za-z0-9_]+")
        && !table.endsWith("__merge_tmp"),
      s"bucketed table names must match [A-Za-z0-9_]+ and not end in " +
        s"the reserved __merge_tmp suffix: '$db'.'$table'")
    val qualified = s"$db.$table"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    healCatalogSwap(spark, qualified, s"$db.${table}__merge_tmp")
    if (!spark.catalog.tableExists(qualified)) {
      // create path, under the table monitor: two concurrent creators
      // would otherwise race saveAsTable on the in-memory catalog —
      // the loser of the monitor re-checks and falls through to the
      // merge path against the winner's table
      val created = graft.core.Fence.withMonitor("table:" + qualified) {
        if (!spark.catalog.tableExists(qualified)) {
          // no live entry → nothing on disk for this table is
          // referenced; clear a previous JVM's generations
          sweepStaleGenerations(spark, qualified)
          bucketWrite(source, qualified, keys, numBuckets,
            newGenLocation(spark, qualified))
          true
        } else false
      }
      if (created) return
    }
    // fence token: the CURRENT generation location, captured before any
    // read of the target — a concurrent swap moves the location, and
    // the swap below rejects instead of committing a stale merge
    val loc0 = tableLocation(spark, qualified)
    val target = spark.table(qualified)
    val tmp = s"$db.${table}__merge_tmp"
    // staging uses a SHARED tmp table name per target: concurrent
    // merges must serialize the whole stage+swap under the table
    // monitor or they collide on the tmp DDL (FencingSpec race)
    def fullRewrite(df: DataFrame): Unit =
      graft.core.Fence.withMonitor("table:" + qualified) {
        if (spark.catalog.tableExists(tmp)) spark.sql(s"DROP TABLE $tmp")
        bucketWrite(df, tmp, keys, numBuckets,
          newGenLocation(spark, qualified))
        swapAndRetire(spark, qualified, tmp, Some(loc0))
      }
    // schema gate: plan-time only (no job) — unionByName evolution makes
    // the merged schema a superset of either input's; a carried file is
    // only byte-identical to the full rebuild when the field set (and
    // types) stay EXACTLY the target's. The SORT spec is part of the
    // law-match gate too (r11 advisor): the staged files are sorted by
    // `keys` only, so a live table declaring a richer bucket-sort must
    // take the full rewrite (which re-declares keys-only sort) rather
    // than silently downgrading the declared order under carried files.
    def sig(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name.toLowerCase, f.dataType)).toSet
    val full = Upsert.merge(target, source, keys)
    if (!bucketSpecOf(spark, qualified).contains(
          (numBuckets, keys.map(_.toLowerCase), keys.map(_.toLowerCase)))
        || sig(full.schema) != sig(target.schema))
      return fullRewrite(full)
    // The batch ALIGNED to the merged (== target, per the gate above)
    // schema: merging against an empty target slice restores any
    // column the batch omitted (as NULLs) and applies unionByName's
    // type widening to the KEYS. Both the bucket probe below and the
    // staged content must hash the target-typed key — murmur3 of an
    // INT batch key differs from murmur3 of the table's BIGINT, and a
    // raw-`source` stage would also install the BATCH's narrower
    // schema on the swapped-in table, silently dropping target-only
    // columns from the carried files' reads.
    val aligned = Upsert.merge(target.limit(0), source, keys)
    // the bucket ids the batch touches: bounded collect (≤ numBuckets)
    val bucketOf = pmod(hash(keys.map(col): _*), lit(numBuckets)).cast("int")
    val changed = aligned.select(bucketOf.as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    if (changed.isEmpty) return // empty batch: no-op
    if (changed.size >= numBuckets) return fullRewrite(full)
    // merge ONLY the changed buckets' files with the batch (file-level
    // pruning by the bucket law; the explicit schema skips inference;
    // the listing is bound once, not re-listed per bucket)
    val files = bucketFiles(spark, qualified)
    val touchedFiles = changed.toSeq.sorted
      .flatMap(files.getOrElse(_, Nil))
      .map(_.getPath.toString)
    val merged =
      if (touchedFiles.isEmpty) aligned // batch keys hash to empty buckets
      else Upsert.merge(
        spark.read.schema(target.schema).parquet(touchedFiles: _*),
        source, keys)
    stagedSwapCore(spark, qualified, tmp, keys, sortCols = keys,
      numBuckets, changed, merged, expectedLoc = Some(loc0))
  }

  /** The live bucket spec of `qualified`, as (numBuckets, lower-cased
    * bucket columns, lower-cased sort columns) — the bucket-scoped
    * merge's law-match precondition. */
  private def bucketSpecOf(spark: SparkSession,
      qualified: String): Option[(Int, Seq[String], Seq[String])] = {
    val parts = qualified.split('.')
    spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          parts(1), Some(parts(0)))).bucketSpec
      .map(bs => (bs.numBuckets, bs.bucketColumnNames.map(_.toLowerCase),
        bs.sortColumnNames.map(_.toLowerCase)))
  }

  /** Roll an interrupted catalog swap forward: a crash between DROP and
    * RENAME leaves the fully-staged tmp table live and the target
    * absent — the staged content IS the committed next state, so the
    * heal completes the RENAME (readers in the window failed cleanly on
    * a missing table; nothing was lost). Without this, the next
    * writeMerged would see "table absent", sweep every generation —
    * including the staged one — and bootstrap from the new batch alone:
    * total silent loss (found building the r11 crash matrix). */
  private def healCatalogSwap(spark: SparkSession, qualified: String,
      tmp: String): Unit =
    graft.core.Fence.withMonitor("table:" + qualified) {
      if (spark.catalog.tableExists(tmp)
          && !spark.catalog.tableExists(qualified))
        spark.sql(s"ALTER TABLE $tmp RENAME TO $qualified")
    }

  private def bucketWrite(df: DataFrame, qualified: String,
      keys: Seq[String], numBuckets: Int, location: String): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", location) // external: swaps never touch files
      .mode(SaveMode.Overwrite)
      .saveAsTable(qualified)

  /** The merge probe plan against a bucketed target — exposed so callers
    * (and tests) can verify the exchange-free property. */
  def mergePlan(spark: SparkSession, db: String, table: String,
      source: DataFrame, keys: Seq[String]): DataFrame =
    spark.table(s"$db.$table")
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")

  // --------------------------------------------------------------------
  // Query-optimized silver layouts (bucket + sort), keyed to a source dir.
  //
  // A lake engine does not query raw ingest files: the silver layer is
  // maintained bucketed on the hot join/group keys so joins and
  // aggregations on those keys read pre-partitioned (and pre-sorted)
  // input with NO exchange — at 100 TB the fact-side exchange IS the
  // query cost, and this layout removes it once at write time instead of
  // once per query. `ensureLayout` materializes such a table from the
  // driver's parquet (idempotent per (session, dir)); `tableOr` lets a
  // query transparently prefer the layout when this session maintains
  // one for the SAME source dir, falling back to the raw parquet scan
  // otherwise (the correctness harness never builds layouts, so Verify
  // always exercises the fallback and the results are provably equal).
  //
  // The pre-write `repartition(numBuckets, keys)` uses the same
  // murmur3-pmod hash as the bucket spec, so every task holds exactly
  // one bucket and each bucket lands in ONE file — the condition under
  // which the scan also reports the per-bucket sort order, letting
  // windows/sort-merge-joins on the sort prefix skip their Sort as well.
  // --------------------------------------------------------------------

  // --------------------------------------------------------------------
  // Layout tables are EXTERNAL, each write landing in a fresh
  // GENERATION directory (`<table>__g<nanos>`), and the swap is pure
  // metadata (DROP external + RENAME external — neither touches
  // files). The PREVIOUS generation's files are retained until the
  // NEXT swap retires them.
  //
  // Why: with managed tables the old DROP+RENAME swap had a torn-read
  // window the BucketRefreshSoakSpec race actually caught — DROP
  // deletes the managed directory, so a reader that resolved the
  // table's metadata just before the drop would LIST a vanished
  // directory and successfully return 0 rows: an empty table that
  // never logically existed (a query's tableOr could serve it
  // mid-maintenance). With generation retention a ≤1-swap-stale reader
  // scans the retired generation's intact files (a consistent previous
  // state); only the missing-table instant between the two catalog ops
  // remains, and that fails cleanly. This is the table-format pattern
  // (snapshot dirs + a metadata pointer) expressed in the in-memory
  // catalog; an object-store deployment gets it from Iceberg/Delta
  // commits for free.
  // --------------------------------------------------------------------

  /** What the registry remembers about a live layout: the source dir it
    * was derived from, and — for layouts maintained by a bucket-scoped
    * incremental refresher — the WRITER identity (the refresher's state
    * path). The bucket-scoped carry-across is only sound when the live
    * layout holds the previous output of the SAME derivation; a layout
    * registered by a different writer (e.g. ensureDerivedLayout's
    * full-history build) must take the full rewrite instead of silently
    * carrying its unrelated buckets alongside state-fold content (r10
    * advisor). */
  private[graft] final case class LayoutInfo(dir: String,
      writer: Option[String])

  private val layouts =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      LayoutInfo]

  /** The generation directory RETIRED by the last swap of each layout —
    * kept on disk so in-flight readers of the pre-swap state keep
    * reading consistent files; deleted when the next swap retires its
    * successor (2-generation retention). */
  private val retired =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      org.apache.hadoop.fs.Path]

  private def layoutName(table: String, keys: Seq[String]): String =
    s"graft_bench.${table}_by_${keys.mkString("_")}"

  /** Materialize (once per session+dir) a bucketed, bucket-sorted copy of
    * a driver table; returns the qualified catalog name. */
  def ensureLayout(spark: SparkSession, dir: String, table: String,
      keys: Seq[String], sortCols: Seq[String] = Nil,
      numBuckets: Int = 32): String =
    ensureDerivedLayout(spark, dir, table, keys, sortCols, numBuckets)(
      Tables.load(spark, dir, table))

  /** [[ensureLayout]] for a DERIVED silver frame (sessionized events,
    * pre-aggregated facts): materialize `build` — lazily, only when the
    * layout is absent — bucketed and bucket-sorted under `name`. A real
    * lake maintains such derived tables at ingest time (the
    * incremental-gold pattern, see gold.IncrementalAgg); benchmarks
    * build them in the untimed maintenance phase. Callers share the
    * SAME build code between the layout and the query's inline
    * fallback, so the two paths are equal by construction. */
  def ensureDerivedLayout(spark: SparkSession, dir: String, name: String,
      keys: Seq[String], sortCols: Seq[String] = Nil,
      numBuckets: Int = 32)(build: => DataFrame): String = {
    layouts.keys.filter(_._1.sparkContext.isStopped).foreach(layouts.remove)
    retired.keys.filter(_._1.sparkContext.isStopped).foreach(retired.remove)
    val qualified = layoutName(name, keys)
    val current = layouts.get((spark, qualified))
    if (!current.map(_.dir).contains(dir)
        || !spark.catalog.tableExists(qualified)) {
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_bench")
      healCatalogSwap(spark, qualified, s"${qualified}__refresh_tmp")
      val oldLoc =
        if (spark.catalog.tableExists(qualified))
          Some(tableLocation(spark, qualified))
        else { sweepStaleGenerations(spark, qualified); None }
      layoutWrite(build, qualified, keys, sortCols, numBuckets,
        newGenLocation(spark, qualified))
      oldLoc.foreach(retire(spark, qualified, _))
      layouts((spark, qualified)) = LayoutInfo(dir, writer = None)
    }
    qualified
  }

  /** Rewrite a derived layout in place from an incrementally refreshed
    * state frame (see silver.IncrementalSessions: the state FOLD is
    * O(batch + affected keys); this bucketed rewrite refreshes what the
    * query read path resolves). Unlike [[ensureDerivedLayout]], always
    * writes. */
  def refreshDerivedLayout(spark: SparkSession, dir: String, name: String,
      keys: Seq[String], sortCols: Seq[String] = Nil,
      numBuckets: Int = 32, writerTag: Option[String] = None)(
      refreshed: DataFrame): String = {
    val qualified = layoutName(name, keys)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bench")
    healCatalogSwap(spark, qualified, s"${qualified}__refresh_tmp")
    // Stage to a tmp table at a FRESH generation location, then swap
    // via metadata-only DROP+RENAME (both external: no file is deleted
    // or moved by either op): readers resolve the OLD table — and its
    // still-intact old generation — for the whole rewrite, racing only
    // the missing-table instant between the two catalog ops.
    val tmp = s"${qualified}__refresh_tmp"
    graft.core.Fence.withMonitor("table:" + qualified) {
      if (spark.catalog.tableExists(tmp)) spark.sql(s"DROP TABLE $tmp")
      if (!spark.catalog.tableExists(qualified))
        sweepStaleGenerations(spark, qualified)
      layoutWrite(refreshed, tmp, keys, sortCols, numBuckets,
        newGenLocation(spark, qualified))
      swapAndRetire(spark, qualified, tmp)
    }
    layouts((spark, qualified)) = LayoutInfo(dir, writerTag)
    qualified
  }

  /** BUCKET-SCOPED [[refreshDerivedLayout]]: rewrite only the hash
    * buckets that contain `changedKeys`, carrying every other bucket's
    * file across untouched — refresh cost scales with TOUCHED BUCKETS,
    * not table size (the last O(history)-per-refresh cost on the
    * incremental-maintenance path, r9 verdict task 2).
    *
    * Safety argument: bucket files are hash-disjoint by key — bucket b
    * holds exactly the rows with pmod(murmur3(keys), n) = b, and
    * `repartition(n, keys)` + `bucketBy(n, keys)` use that SAME mapping
    * (asserted below per staged file), so a key absent from
    * `changedKeys` cannot have moved a row into or out of an untouched
    * bucket. The staged write therefore only needs the changed buckets'
    * FULL content (all rows hashing there, changed or not — the filter
    * is bucket-valued, never key-valued), and untouched buckets' files
    * are byte-identical to a full rebuild's content by construction.
    * IncrementalSessionsSpec proves per-bucket content equality against
    * the full rebuild across random append splits, and that untouched
    * buckets keep their exact files (names unchanged).
    *
    * The carry-across is a hard link per file (metadata-only, falling
    * back to a copy across devices); the swap stays the metadata-only
    * DROP+RENAME, so readers race two catalog ops exactly as in the
    * full rewrite. An object-store deployment would commit the same
    * mixed file list through its table format's manifest instead.
    *
    * CONTRACT: the live layout must hold the PREVIOUS state of the same
    * derivation (i.e. this refresher is the layout's only writer, as in
    * [[IncrementalSessions.maintainClickSessionsLayout]]) — carrying a
    * bucket across asserts its old content already equals the refreshed
    * frame's content for that bucket. The contract is ENFORCED via
    * `writerTag` (r10 advisor): the registry records who wrote the live
    * layout, and a tag mismatch — ensureDerivedLayout's full-history
    * build, or a refresher folding a different state path — takes the
    * full [[refreshDerivedLayout]] instead of carrying unrelated
    * buckets across.
    *
    * Falls back to the full [[refreshDerivedLayout]] when no live
    * layout exists for this (session, dir, writer) or when every bucket
    * is touched. */
  def refreshDerivedLayoutBuckets(spark: SparkSession, dir: String,
      name: String, keys: Seq[String], sortCols: Seq[String] = Nil,
      numBuckets: Int = 32, writerTag: Option[String] = None)(
      refreshed: DataFrame, changedKeys: DataFrame): String = {
    val qualified = layoutName(name, keys)
    if (!liveFor(spark, qualified, dir, writerTag))
      return refreshDerivedLayout(spark, dir, name, keys, sortCols,
        numBuckets, writerTag)(refreshed)
    val loc0 = tableLocation(spark, qualified) // fence token (task 2)
    // the bucket ids the batch touches: bounded collect (≤ numBuckets)
    val bucketOf = pmod(hash(keys.map(col): _*), lit(numBuckets))
    val changed = changedKeys.select(bucketOf.cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    if (changed.isEmpty) return qualified // nothing to refresh
    if (changed.size >= numBuckets)
      return refreshDerivedLayout(spark, dir, name, keys, sortCols,
        numBuckets, writerTag)(refreshed)
    // stage ONLY the changed buckets' rows (empty write tasks emit no
    // file, so the staging dir holds exactly the changed buckets)
    stagedBucketSwap(spark, qualified, dir, keys, sortCols, numBuckets,
      changed, refreshed.filter(bucketOf.isin(changed.toSeq: _*)),
      writerTag, Some(loc0))
  }

  /** [[refreshDerivedLayoutBuckets]] for a caller that already holds
    * the changed buckets' FULL content (the bucketed state fold,
    * [[IncrementalSessions.updateTouched]]): skips the table-sized
    * `refreshed.filter(...)` scan — the last O(history) read on the
    * incremental maintenance path (r10 verdict task 2). `touched`
    * must be computed with the SAME pmod(hash(keys), numBuckets) law
    * (the staged-file sanity `require` still catches a mismatch), and
    * `touchedContent` must hold every row of exactly those buckets.
    * `fullState` is evaluated only on the fallback paths (layout not
    * live for this writer, or every bucket touched). */
  def refreshDerivedLayoutTouched(spark: SparkSession, dir: String,
      name: String, keys: Seq[String], sortCols: Seq[String] = Nil,
      numBuckets: Int = 32, writerTag: Option[String] = None)(
      touchedContent: DataFrame, touched: Set[Int])(
      fullState: => DataFrame): String = {
    val qualified = layoutName(name, keys)
    if (!liveFor(spark, qualified, dir, writerTag)
        || touched.size >= numBuckets)
      return refreshDerivedLayout(spark, dir, name, keys, sortCols,
        numBuckets, writerTag)(fullState)
    if (touched.isEmpty) return qualified // nothing to refresh
    stagedBucketSwap(spark, qualified, dir, keys, sortCols, numBuckets,
      touched, touchedContent, writerTag,
      Some(tableLocation(spark, qualified)))
  }

  /** True when the live layout was derived from `dir` AND written by
    * `writerTag`'s owner — the bucket-scoped carry-across precondition. */
  private def liveFor(spark: SparkSession, qualified: String,
      dir: String, writerTag: Option[String]): Boolean =
    layouts.get((spark, qualified)).contains(LayoutInfo(dir, writerTag)) &&
      spark.catalog.tableExists(qualified)

  /** The bucket-scoped swap core: stage `stagedContent` (the changed
    * buckets' full content) as a bucketed table at a fresh generation
    * location, assert the staged files stayed inside `changed`,
    * hard-link every untouched bucket's file(s) across from the live
    * generation, then swap via the metadata-only DROP+RENAME (the old
    * generation stays on disk for in-flight readers; see the
    * generation-retention note at the top of this section). */
  private def stagedBucketSwap(spark: SparkSession, qualified: String,
      dir: String, keys: Seq[String], sortCols: Seq[String],
      numBuckets: Int, changed: Set[Int], stagedContent: DataFrame,
      writerTag: Option[String],
      expectedLoc: Option[org.apache.hadoop.fs.Path]): String = {
    stagedSwapCore(spark, qualified, s"${qualified}__refresh_tmp", keys,
      sortCols, numBuckets, changed, stagedContent, expectedLoc)
    layouts((spark, qualified)) = LayoutInfo(dir, writerTag)
    qualified
  }

  /** The registry-free swap core shared by the layout refresher and the
    * bucket-scoped merge: stage, sanity-check, carry, swap. The carry
    * and swap run under the table's monitor with an expected-location
    * check first (r11 verdict task 2): if another writer swapped the
    * table since `expectedLoc` was captured, this merge derives from a
    * replaced state — reject loudly, discard the staged generation. */
  private def stagedSwapCore(spark: SparkSession, qualified: String,
      tmp: String, keys: Seq[String], sortCols: Seq[String],
      numBuckets: Int, changed: Set[Int], stagedContent: DataFrame,
      expectedLoc: Option[org.apache.hadoop.fs.Path]): Unit =
      graft.core.Fence.withMonitor("table:" + qualified) {
    // the WHOLE stage+swap holds the table monitor: the tmp table name
    // is shared per target, so concurrent merges would collide on its
    // DDL; losers re-check the fence after the winner's swap and reject
    if (spark.catalog.tableExists(tmp)) spark.sql(s"DROP TABLE $tmp")
    expectedLoc.foreach(requireLocation(spark, qualified, tmp, _))
    layoutWrite(stagedContent, tmp, keys, sortCols, numBuckets,
      newGenLocation(spark, qualified))
    // staged-file sanity: every staged file must be a changed bucket
    // (a repartition/bucketBy hash mismatch would corrupt silently)
    val stagedIds = bucketFiles(spark, tmp).keySet
    require(stagedIds.subsetOf(changed),
      s"staged bucket ids $stagedIds escaped the changed set $changed")
    // carry every untouched bucket's file(s) across, metadata-only
    // (hard links: the retired generation and the new one share
    // inodes) — under the monitor, AFTER the fence check, so the
    // carried files are provably the generation this merge read
    val toDir = tableLocation(spark, tmp)
    bucketFiles(spark, qualified).foreach { case (b, sts) =>
      if (!changed.contains(b)) sts.foreach { st =>
        graft.core.Fs.linkOrCopy(
          java.nio.file.Paths.get(st.getPath.toUri.getPath),
          java.nio.file.Paths.get(toDir.toUri.getPath)
            .resolve(st.getPath.getName))
      }
    }
    swapAndRetire(spark, qualified, tmp)
  }

  /** Fence check (under the monitor): the live table must still sit at
    * the generation the writer read; otherwise discard the staged tmp
    * and reject. */
  private def requireLocation(spark: SparkSession, qualified: String,
      tmp: String, expected: org.apache.hadoop.fs.Path): Unit = {
    val moved = !spark.catalog.tableExists(qualified) ||
      tableLocation(spark, qualified) != expected
    if (moved) {
      if (spark.catalog.tableExists(tmp)) {
        val stagedLoc = tableLocation(spark, tmp)
        spark.sql(s"DROP TABLE $tmp")
        val fs = stagedLoc.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (fs.exists(stagedLoc)) fs.delete(stagedLoc, true)
      }
      throw new graft.core.ConcurrentWriteException(
        s"$qualified was swapped by another writer while this merge " +
          "was being staged — merge rejected; re-read and retry")
    }
  }

  /** DROP the live (external) table, RENAME the staged one in — both
    * metadata-only — then retire the replaced generation: the one
    * retired by the PREVIOUS swap is deleted now, the just-replaced
    * directory is kept for in-flight readers until the next swap.
    * Runs under the table's monitor (reentrant from stagedSwapCore);
    * `expectedLoc` fences direct callers the same way. */
  private def swapAndRetire(spark: SparkSession, qualified: String,
      tmp: String,
      expectedLoc: Option[org.apache.hadoop.fs.Path] = None): Unit =
    graft.core.Fence.withMonitor("table:" + qualified) {
      expectedLoc.foreach(requireLocation(spark, qualified, tmp, _))
      graft.core.CrashPoints.hit("buckets.staged")
      val oldLoc =
        if (spark.catalog.tableExists(qualified)) {
          val loc = tableLocation(spark, qualified)
          spark.sql(s"DROP TABLE $qualified")
          Some(loc)
        } else None
      graft.core.CrashPoints.hit("buckets.dropped")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $qualified")
      graft.core.CrashPoints.hit("buckets.renamed")
      oldLoc.foreach(retire(spark, qualified, _))
    }

  private def retire(spark: SparkSession, qualified: String,
      loc: org.apache.hadoop.fs.Path): Unit = {
    retired.put((spark, qualified), loc).foreach { older =>
      val fs = older.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(older)) fs.delete(older, true)
    }
  }

  /** The data files of a managed graft_bench table, grouped by the
    * bucket id encoded in their names (Spark's `..._NNNNN.ext`
    * bucketed-file convention; a Seq per bucket so a multi-file bucket
    * can never silently lose files). Package-visible so the spec can
    * assert which files a bucket-scoped refresh carried across. */
  private[graft] def bucketFiles(spark: SparkSession, qualified: String)
      : Map[Int, Seq[org.apache.hadoop.fs.FileStatus]] = {
    val loc = tableLocation(spark, qualified)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) Map.empty
    else {
      val bucketRe = """.*_(\d+)(?:\..*)?$""".r // BucketingUtils' pattern
      fs.listStatus(loc).toSeq.filter(_.isFile).flatMap { st =>
        st.getPath.getName match {
          case bucketRe(b) => Some(b.toInt -> st)
          case _ => None // _SUCCESS etc.
        }
      }.groupBy(_._1).map { case (b, kvs) => b -> kvs.map(_._2) }
    }
  }

  /** The table's CURRENT location, from the catalog (layouts are
    * external with per-write generation dirs, so the location is data,
    * not convention). */
  private def tableLocation(spark: SparkSession,
      qualified: String): org.apache.hadoop.fs.Path = {
    val parts = qualified.split('.')
    new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        parts(1), Some(parts(0)))).location)
  }

  private def dbDir(spark: SparkSession,
      db: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.db")

  /** A fresh generation directory for the next write of `qualified`. */
  private def newGenLocation(spark: SparkSession,
      qualified: String): String = {
    val parts = qualified.split('.')
    s"${dbDir(spark, parts(0))}/${parts(1)}__g${System.nanoTime()}"
  }

  /** Delete every directory a previous JVM left for this table (old
    * generations, conventional-location leftovers, staged tmp dirs) —
    * called only when the in-memory catalog has no live entry, so
    * nothing listed can be referenced. */
  private def sweepStaleGenerations(spark: SparkSession,
      qualified: String): Unit = {
    val Array(db, table) = qualified.split('.')
    val dir = dbDir(spark, db)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n == table || n.startsWith(s"${table}__"))
        fs.delete(st.getPath, true)
    }
  }

  private def layoutWrite(df: DataFrame, qualified: String,
      keys: Seq[String], sortCols: Seq[String], numBuckets: Int,
      location: String): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else keys
    df.repartition(numBuckets, keys.map(col): _*)
      .write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .option("path", location) // external: swaps never touch files
      .mode(SaveMode.Overwrite)
      .saveAsTable(qualified)
  }

  // Bench-only escape hatch: run `body` with layout resolution disabled
  // so every tableOr takes its inline fallback — used to time the
  // no-layout path of a query whose headline number rides a maintained
  // layout (the bench emits both so the artifact discloses the layout's
  // contribution). Sequential harness use only (plain var, not
  // per-thread).
  @volatile private var suppressed = false
  def withoutLayouts[T](body: => T): T = {
    suppressed = true
    try body finally suppressed = false
  }

  /** The bucketed layout for (table, keys) if THIS session maintains one
    * derived from THIS source dir. */
  def layout(spark: SparkSession, dir: String, table: String,
      keys: Seq[String]): Option[DataFrame] = {
    val qualified = layoutName(table, keys)
    if (!suppressed
        && layouts.get((spark, qualified)).exists(_.dir == dir)
        && spark.catalog.tableExists(qualified)) Some(spark.table(qualified))
    else None
  }

  /** The bucketed layout for (table, keys) if THIS session maintains one
    * derived from THIS source dir; otherwise the fallback frame. */
  def tableOr(spark: SparkSession, dir: String, table: String,
      keys: Seq[String])(fallback: => DataFrame): DataFrame =
    layout(spark, dir, table, keys).getOrElse(fallback)
}
