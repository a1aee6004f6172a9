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

  // ------------------------------------------------------------------
  // Per-generation manifest (r14 verdict tasks 2+6): every committed
  // generation carries a `_graft_manifest` JSON file (underscore name —
  // invisible to Spark's file index, like _SUCCESS) naming each
  // bucket's data files WITH their byte sizes plus the store's read
  // schema. A fold then needs NO full-store directory listing (the r14
  // ladder attributed part of the residual concentrated-regime constant
  // to 4,096-file listings ×2–3 per merge), NO per-file stat sweep for
  // the growth-law sizing pass, and NO footer read for key-dtype
  // alignment. The manifest is staged INSIDE the next generation's
  // `.tmp-` dir after the rename pass and commits with the same atomic
  // swap as the data — a crash between manifest write and swap leaves
  // an unswapped stage that healSwap sweeps whole, so a committed store
  // and its manifest can never diverge. Stores written before the
  // manifest existed (no `_graft_manifest`) fall back to the listing
  // path once and upgrade on their next fold.
  // ------------------------------------------------------------------

  private[graft] val ManifestName = "_graft_manifest"

  /** One committed generation's self-description. `schemaJson` records
    * the READ schema (all-nullable, as Spark's file sources report), so
    * schema-gate comparisons against it match `spark.read.parquet`
    * exactly without touching a footer. */
  private[graft] final case class Manifest(numBuckets: Int,
      schemaJson: String, buckets: Map[Int, Seq[(String, Long)]]) {
    def schema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    def totalBytes: Long = buckets.values.flatten.map(_._2).sum
    def files(dir: Path): Map[Int, Seq[Path]] =
      buckets.map { case (b, es) => b -> es.map(e => dir.resolve(e._1)) }
  }

  /** Spark's file sources report every column nullable
    * (`HadoopFsRelation` applies `asNullable` to the data schema) — the
    * manifest must record that READ-side shape, not the writer frame's,
    * or nested nullability flags would trip the schema gate spuriously. */
  private[graft] def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: ArrayType =>
        a.copy(elementType = asNullable(a.elementType), containsNull = true)
      case m: MapType => m.copy(keyType = asNullable(m.keyType),
        valueType = asNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private[graft] def readSchemaOf(df: DataFrame)
      : org.apache.spark.sql.types.StructType =
    asNullable(df.schema).asInstanceOf[org.apache.spark.sql.types.StructType]

  private val json = new com.fasterxml.jackson.databind.ObjectMapper()

  private[graft] def writeManifest(dir: Path, m: Manifest): Unit = {
    val root = json.createObjectNode()
    root.put("num_buckets", m.numBuckets)
    root.put("schema", m.schemaJson)
    val bs = root.putObject("buckets")
    m.buckets.toSeq.sortBy(_._1).foreach { case (b, es) =>
      val arr = bs.putArray(b.toString)
      es.foreach { case (n, sz) =>
        val e = arr.addObject(); e.put("name", n); e.put("bytes", sz) }
    }
    Files.writeString(dir.resolve(ManifestName), root.toString)
  }

  /** The live generation's manifest (None = pre-manifest store; callers
    * fall back to the listing path). A manifest that vanishes MID-READ
    * was retired by a concurrent swap — the new generation's manifest
    * (or its absence) is already in place, so retry the read. */
  private[graft] def readManifest(statePath: String): Option[Manifest] = {
    val f = Paths.get(statePath).resolve(ManifestName)
    var attempts = 3
    while (true) {
      try {
        if (!Files.exists(f)) return None
        val root = json.readTree(Files.readString(f))
        val buckets = Map.newBuilder[Int, Seq[(String, Long)]]
        val it = root.get("buckets").properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val es = Seq.newBuilder[(String, Long)]
          e.getValue.forEach(n =>
            es += ((n.get("name").asText, n.get("bytes").asLong)))
          buckets += e.getKey.toInt -> es.result()
        }
        return Some(Manifest(root.get("num_buckets").asInt,
          root.get("schema").asText, buckets.result()))
      } catch {
        case _: java.nio.file.NoSuchFileException =>
          attempts -= 1
          if (attempts <= 0)
            throw new graft.core.ConcurrentWriteException(
              s"$statePath's manifest kept vanishing mid-read — " +
                "concurrent commits are racing this reader; retry")
      }
    }
    None // unreachable
  }

  /** True when `e`'s cause chain (or embedded task-failure text) is a
    * missing-file failure — the shapes a concurrent writer's swap
    * retiring files mid-read produces, depending on WHERE the race
    * lands: AnalysisException PATH_NOT_FOUND (relation resolution of
    * explicit file names), FileNotFoundException (the schema-inference
    * footer job), FAILED_READ_FILE sub-codes (scan tasks). */
  private[graft] def isRetiredGenRace(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
      .exists { t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
        t.isInstanceOf[java.nio.file.NoSuchFileException] ||
        Option(t.getMessage).exists(m => m.contains("PATH_NOT_FOUND") ||
          m.contains("FAILED_READ_FILE") ||
          m.contains("FileNotFoundException"))
      }

  /** Within the fenced merge protocol a missing state file DURING a
    * fold/rewrite means exactly one thing: a concurrent writer's
    * commit retired the generation this merge was reading. Map every
    * such shape to the ONE retryable failure type the fence gives
    * callers (a genuinely corrupt store re-surfaces identically on
    * every retry and starves the caller's bounded loop loudly). */
  private[graft] def retiredGenGuard[T](statePath: String)(body: => T): T =
    try body catch {
      case e: Exception if isRetiredGenRace(e) =>
        throw new graft.core.ConcurrentWriteException(
          s"$statePath was committed by another writer while this " +
            "merge was reading it — re-read the state and retry")
    }

  /** Manifest built by listing a freshly STAGED dir (full writes:
    * rewriteAll and the legacy upgrade, where every file was just
    * written and a one-time stat sweep is the honest cost). */
  private[graft] def manifestFromListing(dir: Path, numBuckets: Int,
      schema: org.apache.spark.sql.types.StructType): Manifest =
    Manifest(numBuckets, schema.json,
      bucketFiles(dir.toString).map { case (b, ps) =>
        b -> ps.map(p => (p.getFileName.toString, Files.size(p)))
      })

  /** Total data bytes of the live store — manifest-backed (zero I/O
    * beyond one small file read) for the growth-law sizing pass; the
    * pre-manifest fallback lists and stats. Runs WITHOUT the table
    * monitor (it's a sizing pass, not a commit), so a concurrent fenced
    * commit can retire a listed file between the listing and the stat —
    * surface that as the one retryable failure type the fence already
    * gives callers, not a raw NoSuchFileException (r12 advisor). */
  private[graft] def storeBytes(statePath: String): Long =
    readManifest(statePath).map(_.totalBytes).getOrElse {
      try bucketFiles(statePath).values.flatten
        .map(p => Files.size(p)).sum
      catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new graft.core.ConcurrentWriteException(
            s"$statePath was committed by another writer during the " +
              "sizing pass — re-read the state and retry")
      }
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
    * emptied) is dropped — an empty bucket holds no file.
    *
    * Returns the staged bucket → (file name, bytes) entries — the
    * touched half of the next generation's [[Manifest]], collected here
    * because the rename pass already has every final name and a stat of
    * a just-written local file is free (no later listing needed). */
  private[graft] def writeTouchedBuckets(merged: DataFrame, dir: Path,
      keyCols: Seq[String], numBuckets: Int, touched: Set[Int])
      : Map[Int, Seq[(String, Long)]] = {
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
    val entries = Map.newBuilder[Int, Seq[(String, Long)]]
    bucketFiles(dir.toString).toSeq.sortBy(-_._1).foreach { case (rank, ps) =>
      require(rank < n,
        s"staged file with part index $rank beyond $n rank partitions")
      val bucket = touchedSorted(rank)
      val kept = ps.flatMap { p =>
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
          Files.delete(p); Files.deleteIfExists(crc); None
        } else if (bucket != rank) {
          val bytes = Files.size(p)
          val digits = name.drop(5).takeWhile(_.isDigit) // after "part-"
          val rest = name.drop(5 + digits.length)
          val target = f"part-$bucket%05d$rest"
          Files.move(p, dir.resolve(target))
          if (Files.exists(crc))
            Files.move(crc, dir.resolve(s".$target.crc"))
          Some((target, bytes))
        } else Some((name, Files.size(p)))
      }
      if (kept.nonEmpty) entries += bucket -> kept
    }
    entries.result()
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
    // manifest-backed layout: no full-store listing on the steady path
    // (pre-manifest stores list once and upgrade on this fold's commit)
    val manifest0 = if (hasState && !legacy)
      readManifest(statePath).filter(_.numBuckets == numBuckets) else None
    val existing = if (hasState && !legacy)
      manifest0.map(_.files(path)).getOrElse(bucketFiles(statePath))
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
        val stateSchema = manifest0.map(_.schema)
          .getOrElse(spark.read.parquet(statePath).schema)
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
      else if (touchedFiles.nonEmpty) {
        // explicit schema when the manifest has it: skips the slice
        // read's footer-based inference pass
        val reader = manifest0.map(m => spark.read.schema(m.schema))
          .getOrElse(spark.read)
        val slice = retiredGenGuard(statePath)(
          reader.parquet(touchedFiles.map(_.toString): _*))
        mergeTouched(Some(slice), aligned)
      } else mergeTouched(None, aligned)
    // stage the next generation: fresh files for written buckets, a
    // hard link per untouched bucket file, then ONE atomic swap
    val tmp = Paths.get(statePath + ".tmp-" + System.nanoTime())
    var newManifest: Manifest = null
    graft.core.Fence.withStage(tmp) {
      val touchedEntries: Map[Int, Seq[(String, Long)]] =
        if (legacy) {
          // one-time upgrade writes the FULL state: every bucket is
          // live, so the full-count repartition is the honest cost here
          merged.repartition(numBuckets, keyCols.map(col): _*)
            .write.mode("overwrite").parquet(tmp.toString)
          Map.empty
        } else
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
        // the next generation's manifest: untouched entries carried
        // from the previous manifest (or a one-time stat of the link
        // sources — safe here, under the lock nobody retires them),
        // touched entries straight from the rename pass. Written
        // INSIDE the stage so it commits with the data or not at all.
        newManifest =
          if (legacy)
            manifestFromListing(tmp, numBuckets, readSchemaOf(merged))
          else {
            val untouched = existing.collect {
              case (b, ps) if !touched(b) =>
                b -> manifest0.map(_.buckets(b)).getOrElse(
                  ps.map(p => (p.getFileName.toString, Files.size(p))))
            }
            Manifest(numBuckets, readSchemaOf(merged).json,
              untouched ++ touchedEntries)
          }
        writeManifest(tmp, newManifest)
        graft.core.CrashPoints.hit("state.manifest")
        Files.writeString(tmp.resolve(markerName(numBuckets)),
          numBuckets.toString)
        Upsert.atomicSwap(tmp, path, Some(gen0))
       }
      }
    }
    spark.catalog.refreshByPath(statePath)
    // manifest, not listing: the staged entries ARE the committed files
    // (the swap was atomic and fence-checked). getOrElse: a mergeTouched
    // that deletes every row of a touched bucket (expiry folds)
    // legitimately leaves it file-less — the fold committed, so the
    // caller must not see a throw
    val committed = newManifest.files(path)
    val newTouched =
      touched.toSeq.sorted.flatMap(committed.getOrElse(_, Nil))
    val newContent =
      if (newTouched.isEmpty) delta.limit(0)
      else retiredGenGuard(statePath)(
        // THIS fold committed; a concurrent writer can still retire its
        // files before the returned frame resolves — the replay a
        // rejected caller runs is idempotent
        spark.read.schema(newManifest.schema)
          .parquet(newTouched.map(_.toString): _*))
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
      // manifest from the freshly staged listing: a full rewrite is
      // the one place a stat sweep is the honest cost
      writeManifest(tmp,
        manifestFromListing(tmp, numBuckets, readSchemaOf(full)))
      Files.writeString(tmp.resolve(markerName(numBuckets)),
        numBuckets.toString)
      Upsert.atomicSwap(tmp, path, Some(gen0))
    }
    full.sparkSession.catalog.refreshByPath(statePath)
  }
}
