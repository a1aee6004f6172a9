package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.Lake
import graft.core.Validation

/** Ingestion path: validated JSON records → buffered JSONL micro-batch
  * files in bronze — the engine equivalent of
  * `POST /ingest/{domain}/{name}` + Firehose buffering
  * (lambdas/serverless_ingestion/main.py:179-293, buffer hints 5 MB / 60 s
  * at layers/shared/python/shared/infrastructure.py:100-103).
  *
  * Mirrored semantics:
  *  - registry lookup, error if endpoint absent;
  *  - per-record soft validation (coerce-or-pass-through) or strict
  *    (reject with per-field errors);
  *  - metadata injection `_insert_date` (ISO micros), `_domain`,
  *    `_endpoint` (main.py:222-225);
  *  - buffered append: records accumulate and flush as one bronze object
  *    per (domain, endpoint) when the buffer hits `maxBufferBytes` or on
  *    explicit `flush()` (the Firehose 60 s timer's deterministic stand-in).
  *
  * Scale note: ingestion is a driver-side service writing row-oriented
  * JSONL; the heavy lifting (schema application, dedup, columnarization)
  * happens in the distributed silver pass. At 100 TB the bronze writer
  * shards by (domain, endpoint) prefix exactly like Firehose does, so
  * silver processing parallelizes per table directory.
  */
final class IngestService(lake: Lake, maxBufferBytes: Long = 5L * 1024 * 1024) {
  private val mapper = new ObjectMapper()
  private val isoMicros = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  final case class IngestResult(accepted: Int, rejected: Int,
      errors: Seq[(Int, Seq[Validation.FieldError])])

  private val buffers =
    scala.collection.mutable.Map.empty[(String, String), StringBuilder]
  // deterministic, monotonically increasing _insert_date for test parity;
  // real deployments would use Instant.now()
  private var seq = 0L
  private[graft] var clock: () => Instant = () => Instant.now()

  def ingest(domain: String, name: String, jsonRecords: Seq[String],
      strict: Boolean = false): IngestResult = synchronized {
    val schema = lake.registry.get(domain, name).getOrElse(
      throw new NoSuchElementException(s"endpoint $domain/$name not found"))
    var accepted, rejected = 0
    val errs = Seq.newBuilder[(Int, Seq[Validation.FieldError])]
    jsonRecords.zipWithIndex.foreach { case (raw, i) =>
      val node = mapper.readTree(raw)
      val res = Validation.validate(schema, node)
      if (!res.isValid && strict) { rejected += 1; errs += i -> res.errors }
      else {
        // soft mode forwards the original payload on error (main.py:204-219)
        val rec = res.record.deepCopy[ObjectNode]()
        seq += 1
        rec.put("_insert_date", isoMicros.format(clock().plusNanos(seq * 1000)))
        rec.put("_domain", domain)
        rec.put("_endpoint", name)
        append(domain, name, mapper.writeValueAsString(rec))
        accepted += 1
      }
    }
    IngestResult(accepted, rejected, errs.result())
  }

  private def append(domain: String, name: String, line: String): Unit = {
    val buf = buffers.getOrElseUpdate((domain, name), new StringBuilder)
    buf.append(line).append('\n')
    if (buf.length >= maxBufferBytes) flush(domain, name)
  }

  /** Flush one endpoint's buffer to a new bronze JSONL object. Returns the
    * written file path, if anything was buffered. Write failures retry 5
    * times with exponential backoff capped at 16 s — the reference's
    * put_record policy (serverless_ingestion/main.py:141,157-176). */
  def flush(domain: String, name: String): Option[String] = synchronized {
    buffers.remove((domain, name)).filter(_.nonEmpty).map { buf =>
      val dir = Paths.get(lake.bronzePath(domain, name))
      Files.createDirectories(dir)
      val file = dir.resolve(f"part-${System.nanoTime()}%020d.jsonl")
      retry(attempts = 5) {
        Files.write(file, buf.toString.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
      file.toString
    }
  }

  /** Exponential backoff 1,2,4,8,16 s (capped); `sleepFn` injectable so
    * tests don't sleep. */
  private[graft] var sleepFn: Long => Unit = millis => Thread.sleep(millis)

  private[graft] def retry[A](attempts: Int)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= attempts) throw e
          sleepFn(math.min(1000L << (attempt - 1), 16000L))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def flushAll(): Seq[String] = synchronized {
    buffers.keys.toSeq.flatMap { case (d, n) => flush(d, n) }
  }
}
