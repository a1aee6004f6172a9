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
}
