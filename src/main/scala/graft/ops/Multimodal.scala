package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake metadata from the byte content.
  * Everything around it — the binary schema, the `mapPartitions` batch
  * shape (one decoder instance per partition, streamed rows), the typed
  * output — is the real production plumbing a codec would drop into.
  *
  * Scale notes: binaries stay in executors end-to-end (no driver
  * collection); a real decoder is expensive per row, so the operator is
  * partition-wise with decoder reuse, and upstream `repartition(byteSize)`
  * can balance skewed blob sizes.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, frames: Long)

  /** Attach an opaque binary payload column (here: utf-8 bytes of `text`;
    * in production: the image/audio blob read from object storage). */
  def withBinary(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** STUB decoder: deterministic fake dimensions from byte length. A real
    * implementation would replace ONLY the body of `decodeOne` with a
    * codec call; the partition-wise streaming shape stays identical. */
  private def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n, width = n % 640, height = (n * 7) % 480,
      frames = n % 30 + 1)
  }

  /** Partition-wise "decode": one decoder per partition, rows streamed. */
  def decode(docsWithBinary: DataFrame): Dataset[MediaMeta] = {
    val spark = docsWithBinary.sparkSession
    import spark.implicits._
    docsWithBinary.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real code: val decoder = Codec.open() — reused across the partition
        rows.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** End-to-end: attach binary, decode partition-wise, return metadata. */
  def mediaMetadata(docs: DataFrame): DataFrame =
    decode(withBinary(docs)).toDF()

  final case class Frame(doc_id: Long, frame_idx: Long, offset: Long,
      n_bytes: Long, checksum: String)

  /** Frame sampling: slice each payload into fixed-size "frames" and keep
    * every `stride`-th one — the video-pipeline shape (seek + decode only
    * sampled frames). Partition-wise; emits one row per sampled frame with
    * offset/length/checksum so downstream stages can fetch lazily instead
    * of materializing every frame. A real codec replaces the byte slicing
    * with keyframe-indexed seeks; the distributed shape is identical. */
  def frameSample(docsWithBinary: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    val spark = docsWithBinary.sparkSession
    import spark.implicits._
    docsWithBinary.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          (0 until nFrames).filter(_ % stride == 0).map { i =>
            val off = i * frameBytes
            val slice = bytes.slice(off, math.min(off + frameBytes, bytes.length))
            Frame(id, i.toLong, off.toLong, slice.length.toLong,
              toHex(java.security.MessageDigest.getInstance("MD5").digest(slice)))
          }
        }
      }
  }

  final case class Resized(doc_id: Long, n_bytes: Long, resized_bytes: Long,
      checksum: String)

  /** Resize: downsample each payload by keeping every `stride`-th byte —
    * the image-resize pipeline shape (decode → scale → re-encode) with the
    * codec stubbed as deterministic byte striding. Partition-wise with the
    * same one-resizer-per-partition reuse a real scaler needs; emits the
    * resized size + checksum so downstream stages can verify content
    * without re-fetching. */
  def resize(docsWithBinary: DataFrame, stride: Int = 4): Dataset[Resized] = {
    val spark = docsWithBinary.sparkSession
    import spark.implicits._
    docsWithBinary.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real code: val scaler = Codec.openScaler() — reused per partition
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val resized = new Array[Byte]((bytes.length + stride - 1) / stride)
          var i = 0
          while (i < resized.length) { resized(i) = bytes(i * stride); i += 1 }
          md.reset()
          Resized(id, bytes.length.toLong, resized.length.toLong,
            toHex(md.digest(resized)))
        }
      }
  }

  final case class Features(doc_id: Long, n_bytes: Long, mean_byte: Double,
      n_upper: Long, n_digit: Long, n_space: Long, entropy_proxy: Double)

  /** Feature extraction: per-payload byte statistics as a typed feature
    * row — the embed-the-blob stage shape (one model instance per
    * partition, streamed inputs). The statistics are deterministic byte
    * math so the distributed result is oracle-checkable; a real extractor
    * swaps the body for a model forward pass. */
  def featureExtract(docsWithBinary: DataFrame): Dataset[Features] = {
    val spark = docsWithBinary.sparkSession
    import spark.implicits._
    docsWithBinary.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real code: val model = Model.load() — reused across the partition
        rows.map { case (id, bytes) =>
          val n = bytes.length.toLong
          var sum = 0L; var upper = 0L; var digit = 0L; var space = 0L
          val seen = new Array[Boolean](256)
          bytes.foreach { b =>
            val u = b & 0xff
            sum += u
            if (u >= 'A' && u <= 'Z') upper += 1
            if (u >= '0' && u <= '9') digit += 1
            if (u == ' ') space += 1
            seen(u) = true
          }
          Features(id, n, if (n == 0) 0.0 else sum.toDouble / n,
            upper, digit, space, seen.count(identity).toDouble / 256)
        }
      }
  }

  final case class PHash(doc_id: Long, phash: Long)

  /** Perceptual-hash stub for media near-dup detection — the image-dedup
    * pipeline shape (pHash/aHash over decoded pixels) with the decode
    * stubbed as raw payload bytes. 64 stripes by byte position mod 64;
    * bit j set iff stripe j's mean exceeds the payload mean, compared by
    * EXACT integer cross-multiplication (stripe_sum·n > total_sum·n_j) so
    * the hash is bit-reproducible on any engine with no float compare.
    * Similar payloads flip few stripe bits → small Hamming distance, the
    * property real pHash gives decoded images. Partition-wise like the
    * other media ops; a real implementation replaces byte stripes with
    * DCT coefficients and nothing else changes.
    *
    * Oracle note: the DuckDB check recomputes the hash from CHARACTER
    * codes (`ascii(substr(text, p, 1))`), which equals the utf-8 byte at
    * the same position for this ASCII corpus — the hash-match pins the
    * byte/char correspondence along with the math. */
  def pHash(docsWithBinary: DataFrame, stripes: Int = 64): Dataset[PHash] = {
    val spark = docsWithBinary.sparkSession
    import spark.implicits._
    docsWithBinary.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val sSum = new Array[Long](stripes)
          val sCnt = new Array[Long](stripes)
          var tot = 0L
          var i = 0
          while (i < bytes.length) {
            val u = (bytes(i) & 0xff).toLong
            sSum(i % stripes) += u
            sCnt(i % stripes) += 1
            tot += u
            i += 1
          }
          var h = 0L
          var j = 0
          while (j < stripes) {
            // stripe mean > overall mean, exact: ss/sn > tot/n  ⇔  ss·n > tot·sn
            if (sCnt(j) > 0 && sSum(j) * bytes.length > tot * sCnt(j))
              h |= 1L << j
            j += 1
          }
          PHash(id, h)
        }
      }
  }

  /** Media near-dup pairs within a Hamming radius over [[pHash]]:
    * OR-banded candidates — each asset enters FOUR 16-bit buckets, pairs
    * colliding in ANY band are candidates, exact Hamming verifies. Same
    * recall contract as DedupOps.simhashPairs (full recall at radius h
    * needs h+1 bands by pigeonhole; 4×16 over 64 bits guarantees h ≤ 3
    * and degrades gracefully above). Equi-join on (band, bucket), never
    * all-pairs. */
  def pHashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    // persisted: both sides of the banded self-join read it, and
    // without the barrier the whole upstream — including the DECODE,
    // the expensive stage once real codecs replace the stub — runs
    // twice (the simhashPairs lesson, ProfileQ47: 0 ReusedExchange on
    // this join shape). One 16-byte row per doc.
    val ph = pHash(withBinary(docs)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = ph.select(col("doc_id"), col("phash"),
      posexplode(array(
        expr("shiftright(phash, 48) & 65535"),
        expr("shiftright(phash, 32) & 65535"),
        expr("shiftright(phash, 16) & 65535"),
        expr("phash & 65535"))).as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("CAST(bit_count(x.phash ^ y.phash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString
}
