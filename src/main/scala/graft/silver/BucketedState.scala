package graft.silver

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Generic bucketed persisted state: ONE parquet file per key-hash
  * bucket (pmod(murmur3(keys), numBuckets) — the exact law
  * `repartition(n, keys)` mints as its partition id, carried in the
  * `part-NNNNN-` file name), so a FOLD reads only the buckets its
  * delta touches and writes only their replacements; every untouched
  * bucket's file hard-links into the next state generation. Extracted
  * from the click-session store (r10 verdict task 2) so the incremental
  * GOLD aggregate ([[graft.gold.IncrementalAgg]]) gets the same
  * O(touched) cost law: a gold aggregate keyed by a high-cardinality
  * key (per-user rollups at 100 TB) is itself key-count-sized, and
  * rewriting it whole per batch is the anti-pattern one level up.
  *
  * Durability is unchanged from the session store: the next generation
  * stages as a sibling `.tmp-` directory (fresh files + links) and
  * commits with the ONE atomic swap every swapped table uses;
  * [[Upsert.healSwap]] repairs an interrupted swap. A staged-file
  * `require` re-checks per fold that no data row escaped the touched
  * set (a repartition/hash-law mismatch would corrupt silently — the
  * zero-row partition-0 artifact of SPARK-21435 is dropped, any other
  * escapee must fail). A non-empty state dir without the bucket marker
  * predates the bucketed layout and upgrades (one full merge + rewrite)
  * on its next fold.
  */
object BucketedState {

  /** Marker naming the bucket law a state dir was written under. */
  private def markerName(numBuckets: Int) = s"_graft_state_buckets_$numBuckets"

  private val markerRe = """_graft_state_buckets_(\d+)""".r

  /** The bucket count the live store was written under (None = legacy
    * or empty dir). */
  private[graft] def markerBuckets(statePath: String): Option[Int] =
    graft.core.Fs.children(Paths.get(statePath))
      .map(_.getFileName.toString)
      .collectFirst { case markerRe(n) => n.toInt }

  /** Total data bytes of the live store (driver-side listing). Runs
    * WITHOUT the table monitor (it's a sizing pass, not a commit), so a
    * concurrent fenced commit can retire a listed file between the
    * listing and the stat — surface that as the one retryable failure
    * type the fence already gives callers, not a raw
    * NoSuchFileException (r12 advisor). */
  private[graft] def storeBytes(statePath: String): Long =
    try bucketFiles(statePath).values.flatten
      .map(p => Files.size(p)).sum
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new graft.core.ConcurrentWriteException(
          s"$statePath was committed by another writer during the " +
            "sizing pass — re-read the state and retry")
    }

  private val partIdxRe = """part-(\d+)-.*""".r

  /** Footer-only parquet row count (no Spark job). */
  private[graft] def parquetRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** The state dir's data files grouped by bucket id (part index). */
  private[graft] def bucketFiles(statePath: String): Map[Int, Seq[Path]] =
    graft.core.Fs.children(Paths.get(statePath))
      .flatMap { p =>
        p.getFileName.toString match {
          case partIdxRe(idx) => Some(idx.toInt -> p)
          case _ => None // _SUCCESS, marker
        }
      }
      .groupBy(_._1).map { case (b, kvs) => b -> kvs.map(_._2).toSeq }

  // ------------------------------------------------------------------
  // Touched-bucket staged writes (r13 verdict task 1): the staged write
  // used to repartition the merged frame to the FULL bucket count, so a
  // one-bucket merge on a 4096-bucket store paid ~4096 write tasks per
  // batch (almost all empty) — per-merge BYTES were flat across the
  // r13 ladder but WALL grew 0.9→17.5 s with the cap. The staged frame
  // is now shuffled to |touched| partitions, placed EXACTLY (partition
  // r = rank-r touched bucket) via probe ints, and the staged files are
  // renamed so their part index is the bucket id the store's filename
  // law expects. Wall is then O(touched), matching the bytes law.
  // ------------------------------------------------------------------

  /** For each rank r in [0, n), an int probe j with
    * pmod(murmur3(j), n) == r. Spark's `repartition(n, expr)` is
    * HashPartitioning: partition = pmod(Murmur3Hash(expr, seed=42), n)
    * — the exact law `functions.hash` exposes and
    * `Murmur3_x86_32.hashInt` computes for an int column — so shuffling
    * on a probe column places rank r's rows in partition r exactly.
    * Coupon-collector search (~n·ln n hashInt calls, ≤4096 ranks);
    * cached per n. Pinned against Spark's own placement in
    * SilverBucketedSpec. */
  private val probeCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Int]]

  private[graft] def partitionProbes(n: Int): Array[Int] =
    probeCache.getOrElseUpdate(n, {
      val probes = new Array[Int](n)
      val found = new Array[Boolean](n)
      var remaining = n
      var j = 0
      while (remaining > 0) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, 42)
        val r = ((h % n) + n) % n
        if (!found(r)) { found(r) = true; probes(r) = j; remaining -= 1 }
        j += 1
      }
      probes
    })

  /** Stage ONLY the touched buckets of `merged` into `dir`: |touched|
    * write tasks (not the full bucket count), rank r's partition holding
    * exactly bucket touchedSorted(r), then each staged file renamed so
    * its part index IS the bucket id. A merged row hashing OUTSIDE the
    * touched set fails the write loudly (`assert_true` inside the
    * shuffle key — the repartition/hash-law guard, evaluated where the
    * old staged-file sweep checked filenames); a rank file with zero
    * rows (SPARK-21435's partition-0 artifact, or a bucket the fold
    * emptied) is dropped — an empty bucket holds no file. */
  private[graft] def writeTouchedBuckets(merged: DataFrame, dir: Path,
      keyCols: Seq[String], numBuckets: Int, touched: Set[Int]): Unit = {
    import org.apache.spark.sql.functions.{assert_true, concat, element_at,
      lit, typedLit, when}
    val touchedSorted = touched.toSeq.sorted
    val n = touchedSorted.size
    val probes = partitionProbes(n)
    val bucketToProbe = Array.fill(numBuckets)(-1)
    touchedSorted.zipWithIndex.foreach { case (b, r) =>
      bucketToProbe(b) = probes(r) }
    val bucketOf =
      pmod(hash(keyCols.map(col): _*), lit(numBuckets)).cast("int")
    val probe = element_at(typedLit(bucketToProbe.toSeq), bucketOf + lit(1))
    // the guard is a FILTER, not part of the shuffle key: a 1-bucket
    // merge plans `Exchange SinglePartition`, which never evaluates the
    // partitioning expression at all. assert_true returns NULL when the
    // predicate holds (so the filter keeps every row) and kills the
    // task otherwise — evaluated per row wherever the plan runs it.
    val guarded = merged.filter(
      assert_true(probe >= 0,
        concat(lit("staged row escaped the touched buckets "),
          lit(touchedSorted.mkString("{", ",", "}")), lit(" (bucket "),
          bucketOf.cast("string"),
          lit(") — repartition/hash law mismatch"))).isNull)
    guarded.repartition(n, probe)
      .write.mode("errorifexists").parquet(dir.toString)
    // a crash anywhere in the rename pass leaves a staging dir with
    // MIXED rank/bucket names — benign by construction: the stage was
    // never swapped in, its liveness marker clears with the process,
    // and the next writer's healSwap sweeps the whole dir
    // (CrashMatrixSpec pins the kill-mid-rename replay)
    graft.core.CrashPoints.hit("state.touched-rename")
    // DESCENDING rank order: one write job shares one uuid across its
    // files, so rank r's target name `part-<bucket>` can collide with
    // rank `bucket`'s not-yet-renamed file — but touchedSorted is
    // strictly increasing, hence bucket ≥ rank, and processing high
    // ranks first vacates every target slot before a lower rank claims
    // it (bucket == rank needs no rename at all)
    bucketFiles(dir.toString).toSeq.sortBy(-_._1).foreach { case (rank, ps) =>
      require(rank < n,
        s"staged file with part index $rank beyond $n rank partitions")
      val bucket = touchedSorted(rank)
      ps.foreach { p =>
        val name = p.getFileName.toString
        // Hadoop's ChecksumFileSystem keeps a `.<name>.crc` sidecar —
        // it must travel with (or die with) its data file, or the next
        // read fails with a ChecksumException against the wrong file's
        // checksum
        val crc = dir.resolve("." + name + ".crc")
        // only partition 0 writes a file when it holds no rows
        // (SPARK-21435) — every other rank's file is non-empty by
        // construction, so the footer read is skipped (it was ~10 ms
        // of driver time PER FILE on an all-buckets merge)
        if (rank == 0 && parquetRowCount(p) == 0L) {
          Files.delete(p); Files.deleteIfExists(crc)
        } else if (bucket != rank) {
          val digits = name.drop(5).takeWhile(_.isDigit) // after "part-"
          val rest = name.drop(5 + digits.length)
          Files.move(p, dir.resolve(f"part-$bucket%05d$rest"))
          if (Files.exists(crc))
            Files.move(crc, dir.resolve(f".part-$bucket%05d$rest.crc"))
        }
      }
    }
  }

  /** Fold `delta` into the bucketed state at `statePath`, touching only
    * the delta's key-hash buckets. `mergeTouched(stateSlice, delta)`
    * produces the touched buckets' NEW content — `stateSlice` is None
    * when those buckets hold no rows yet (then the delta alone is the
    * content, which `mergeTouched(None, delta)` must return). Returns
    * (touched bucket ids, the new state restricted to exactly those
    * buckets) with no full-state scan anywhere on the path.
    *
    * The delta is consumed TWICE (touched-set probe + staged write) —
    * persist an expensive computed delta around the call and unpersist
    * after (IncrementalAgg does; the session fold's delta is one
    * window over the in-memory batch and recomputes cheaper than it
    * caches). fold does not persist internally: cache reads count as
    * task input bytes, which would double-bill the bytes-read budget
    * its callers' specs assert. */
  def fold(spark: SparkSession, statePath: String, delta: DataFrame,
      keyCols: Seq[String], numBuckets: Int = 32,
      expectedGen: Option[Long] = None)(
      mergeTouched: (Option[DataFrame], DataFrame) => DataFrame)
      : (Set[Int], DataFrame) = {
    val path = Paths.get(statePath)
    Upsert.healSwap(path)
    // fence token: captured here (or earlier, by a caller that already
    // read the state) — the swap below rejects if another writer
    // committed in between (r11 verdict task 2)
    val gen0 = expectedGen.getOrElse(graft.core.Fence.generation(path))
    val hasState = graft.core.Fs.nonEmpty(path)
    val legacy =
      hasState && !Files.exists(path.resolve(markerName(numBuckets)))
    val existing = if (hasState && !legacy) bucketFiles(statePath)
      else Map.empty[Int, Seq[Path]]
    // Key-dtype alignment (r11 advisor): the probe below hashes the
    // DELTA's key dtype, but the persisted buckets were laid out under
    // the STATE's — murmur3(INT) != murmur3(BIGINT), so a drifted delta
    // key would probe the wrong buckets and commit the same logical key
    // into two of them. Widen the delta's keys to the state's dtypes
    // up front (plan-time; one driver-side footer read for the schema);
    // a narrowing mismatch is a caller bug and fails loud. The LEGACY
    // branch aligns too (r12 advisor): its full rewrite repartitions
    // with the merged — possibly widened — dtype, so the touched set a
    // derived-layout caller gets back must be probed under that same
    // dtype, not the delta's.
    val aligned =
      if (!hasState) delta
      else {
        val stateSchema = spark.read.parquet(statePath).schema
        keyCols.foldLeft(delta) { (d, k) =>
          (d.schema.fields.find(_.name.equalsIgnoreCase(k)),
            stateSchema.fields.find(_.name.equalsIgnoreCase(k))) match {
            case (Some(from), Some(to)) if from.dataType != to.dataType =>
              require(org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(from.dataType, to.dataType),
                s"delta key '$k' has dtype ${from.dataType} but the " +
                  s"state at $statePath holds ${to.dataType} — not a " +
                  "lossless widening; align the delta before folding")
              d.withColumn(from.name, col(from.name).cast(to.dataType))
            case _ => d
          }
        }
      }
    val bucketOf =
      pmod(hash(keyCols.map(col): _*), lit(numBuckets)).cast("int")
    // bounded collect: ≤ numBuckets distinct ids
    val touched = aligned.select(bucketOf.as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return (Set.empty, delta.limit(0)) // empty: no-op
    val touchedFiles =
      touched.toSeq.sorted.flatMap(existing.getOrElse(_, Nil))
    val merged =
      if (legacy) // one-time upgrade: the last full-state read+rewrite
        mergeTouched(Some(spark.read.parquet(statePath)), aligned)
      else if (touchedFiles.nonEmpty)
        mergeTouched(
          Some(spark.read.parquet(touchedFiles.map(_.toString): _*)), aligned)
      else mergeTouched(None, aligned)
    // stage the next generation: fresh files for written buckets, a
    // hard link per untouched bucket file, then ONE atomic swap
    val tmp = Paths.get(statePath + ".tmp-" + System.nanoTime())
    graft.core.Fence.withStage(tmp) {
      if (legacy)
        // one-time upgrade writes the FULL state: every bucket is live,
        // so the full-count repartition is the honest cost here
        merged.repartition(numBuckets, keyCols.map(col): _*)
          .write.mode("overwrite").parquet(tmp.toString)
      else
        // O(touched) write tasks — the r13 ladder's wall fix
        writeTouchedBuckets(merged, tmp, keyCols, numBuckets, touched)
      // carry + swap under the monitor AND the cross-process file
      // lock, AFTER the fence check: the link sources are `existing`'s
      // files, which a CONCURRENT writer's swap would retire (delete)
      // — checking first means a stale fold rejects before touching
      // them, and holding the monitor/lock means nobody (in this JVM
      // or another process) retires them mid-carry (the FencingSpec
      // race caught the unfenced carry dying on vanished sources)
      graft.core.Fence.withMonitor(path) {
       graft.core.Fence.withFileLock(path) {
        try graft.core.Fence.check(path, gen0)
        catch {
          case e: graft.core.ConcurrentWriteException =>
            Upsert.deleteRecursively(tmp); throw e
        }
        if (!legacy) existing.foreach { case (b, ps) =>
          if (!touched(b)) ps.foreach(p =>
            graft.core.Fs.linkOrCopy(p, tmp.resolve(p.getFileName)))
        }
        Files.writeString(tmp.resolve(markerName(numBuckets)),
          numBuckets.toString)
        Upsert.atomicSwap(tmp, path, Some(gen0))
       }
      }
    }
    spark.catalog.refreshByPath(statePath)
    // one listing, getOrElse: a mergeTouched that deletes every row of
    // a touched bucket (expiry folds) legitimately leaves it file-less
    // — the fold committed, so the caller must not see a throw
    val committed = bucketFiles(statePath)
    val newTouched =
      touched.toSeq.sorted.flatMap(committed.getOrElse(_, Nil))
    val newContent =
      if (newTouched.isEmpty) delta.limit(0)
      else spark.read.parquet(newTouched.map(_.toString): _*)
    (touched, newContent)
  }

  /** Replace the ENTIRE store with `full`, laid out under the bucket
    * law (marker included) so the NEXT fold is bucket-scoped again —
    * the schema-evolution / layout-repair fallback of the incremental
    * paths. Fenced like [[fold]]: pass the token captured when `full`'s
    * inputs were read. */
  def rewriteAll(statePath: String, full: DataFrame, keyCols: Seq[String],
      numBuckets: Int = 32, expectedGen: Option[Long] = None): Unit = {
    val path = Paths.get(statePath)
    Upsert.healSwap(path)
    val gen0 = expectedGen.getOrElse(graft.core.Fence.generation(path))
    val tmp = Paths.get(statePath + ".tmp-" + System.nanoTime())
    graft.core.Fence.withStage(tmp) {
      full.repartition(numBuckets, keyCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.writeString(tmp.resolve(markerName(numBuckets)),
        numBuckets.toString)
      Upsert.atomicSwap(tmp, path, Some(gen0))
    }
    full.sparkSession.catalog.refreshByPath(statePath)
  }
}
