package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.DedupOps

/** Streaming near-duplicate candidate detection: the batch MinHash+LSH
  * pipeline (DedupOps.lshCandidates) re-expressed over keyed streaming
  * state, so an ingest stream can flag each arriving document against
  * everything already seen — without re-scanning the corpus per batch.
  *
  * Shape: signatures are computed map-side per document (the exact same
  * kernel as the batch path, so batch and stream agree bit-for-bit),
  * each document fans out to its `k/rowsPerBand` band keys, and a
  * `flatMapGroupsWithState` keyed by band bucket remembers the bucket's
  * member signatures. A new arrival emits one candidate row per existing
  * member whose full-signature agreement reaches `minEst`.
  *
  * Scale notes (100 TB ingest):
  *  - state is partitioned by band bucket — the SAME key the batch LSH
  *    shuffle uses, so hot buckets distribute identically and the state
  *    store scales horizontally with executors;
  *  - per-bucket state is CAPPED at `maxBucket` signatures (k int64s
  *    each, not documents): a pathological bucket (boilerplate shingle
  *    profile) stops absorbing new members but keeps matching against
  *    the ones it holds, so state stays bounded while recall degrades
  *    gracefully exactly where LSH recall is degenerate anyway;
  *  - `stateTtl` evicts idle buckets (processing-time timeout) for
  *    unbounded streams — the same bounded-state tradeoff as
  *    [[StatefulDedup.firstSeen]];
  *  - a pair colliding in several bands emits once per band (same as
  *    the batch `rawPairsFromBands` contract) — dedup downstream where
  *    the candidate volume is already tiny.
  *
  * In batch mode (Spark runs flatMapGroupsWithState over a batch frame
  * with empty initial state) each bucket's members arrive as one group;
  * rows are processed in ascending doc_id order, so the emitted pair set
  * equals the batch `lshCandidates` pairs at the same `minEst` — the
  * equivalence StreamingSpec checks.
  */
object NearDupStream {

  /** @param docs     streaming (or batch) frame with doc_id: long,
    *                  text: string
    * @param n        shingle width (chars)
    * @param k        signature length
    * @param rowsPerBand signature rows per LSH band
    * @param minEst   minimum fraction of agreeing signature positions
    *                  for an emitted candidate
    * @param maxBucket max member signatures retained per band bucket
    * @param stateTtl  optional idle-bucket eviction TTL (e.g. "24 hours")
    * @return (a, b, est_sim) candidate rows, a < b
    */
  def nearDupCandidates(docs: DataFrame, n: Int = 8, k: Int = 12,
      rowsPerBand: Int = 3, minEst: Double = 0.5, maxBucket: Int = 64,
      stateTtl: Option[String] = None): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    implicit val inEnc: Encoder[(Long, String)] = ExpressionEncoder()
    implicit val bandEnc: Encoder[(String, Long, Array[Long])] =
      ExpressionEncoder()
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[(Long, Long, Double)] = ExpressionEncoder()
    implicit val stateEnc: Encoder[List[(Long, Array[Long])]] =
      Encoders.kryo[List[(Long, Array[Long])]]

    val nBands = k / rowsPerBand
    val bands = docs.selectExpr("doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, text) =>
          val sig = DedupOps.signatureFor(text, n, k, md)
          (0 until nBands).map { b =>
            val key = b + ":" + sig.slice(b * rowsPerBand,
              (b + 1) * rowsPerBand).mkString(",")
            (key, id, sig)
          }
        }
      }

    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    bands.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String, rows: Iterator[(String, Long, Array[Long])],
            state: GroupState[List[(Long, Array[Long])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[(Long, Long, Double)]
            def compareToMembers(id: Long, sig: Array[Long]): Unit =
              members.foreach { case (mid, msig) =>
                if (mid != id) {
                  var same = 0
                  var i = 0
                  while (i < k) {
                    if (sig(i) == msig(i)) same += 1
                    i += 1
                  }
                  val est = same.toDouble / k
                  if (est >= minEst)
                    out += ((math.min(id, mid), math.max(id, mid), est))
                }
              }
            // Bounded intake: only the maxBucket smallest doc_ids of this
            // batch are BUFFERED (and eligible to join the carried member
            // list). A hot (boilerplate) bucket would otherwise buffer the
            // whole group's arrivals — O(batch-rows-per-bucket) tuples
            // each holding a k-long signature; the carried-state cap alone
            // only bounds *members*. Overflow arrivals are NOT dropped:
            // each is compared STREAMING, at the moment it is rejected or
            // evicted, against the carried members AND the current intake
            // buffer (≤ 2·maxBucket comparisons, no storage), so its pairs
            // with established members and with every same-batch arrival
            // seen so far still emit. What the cap sacrifices — inside one
            // degenerate bucket — is only an overflow arrival's pairs with
            // items that ARRIVE AFTER its rejection/eviction; nothing
            // buffered at or before that moment is lost. Memory stays
            // O(maxBucket); batches within the cap process identically to
            // the unbounded path.
            val intake = new scala.collection.mutable
              .PriorityQueue[(Long, Array[Long])]()(Ordering.by(_._1))
            def compareToIntake(id: Long, sig: Array[Long]): Unit =
              intake.foreach { case (bid, bsig) =>
                if (bid != id) {
                  var same = 0
                  var i = 0
                  while (i < k) {
                    if (sig(i) == bsig(i)) same += 1
                    i += 1
                  }
                  val est = same.toDouble / k
                  if (est >= minEst)
                    out += ((math.min(id, bid), math.max(id, bid), est))
                }
              }
            rows.foreach { case (_, id, sig) =>
              if (intake.size < maxBucket) intake.enqueue((id, sig))
              else if (intake.head._1 > id) {
                val evicted = intake.dequeue()
                intake.enqueue((id, sig))
                compareToMembers(evicted._1, evicted._2)
                compareToIntake(evicted._1, evicted._2)
              } else {
                compareToMembers(id, sig)
                compareToIntake(id, sig)
              }
            }
            // ascending doc_id gives batch mode (one group = the whole
            // bucket) the same i<j pair orientation as the batch LSH path
            val ordered: Seq[(Long, Array[Long])] = intake.dequeueAll
            ordered.reverseIterator.foreach { case (id, sig) =>
              compareToMembers(id, sig)
              if (members.size < maxBucket && !members.exists(_._1 == id))
                members = (id, sig) :: members
            }
            state.update(members)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
      .toDF("a", "b", "est_sim")
  }
}
