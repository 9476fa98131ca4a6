package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{Dedup, TextFunctions}

/** One banded document as the stateful dedup operator sees it. */
final case class BandedDoc(band: Int, bucket: Long, docId: Long,
                           sig: Seq[Long])

/** Per-bucket membership state: the documents (id + signature) this LSH
  * bucket has accepted so far. */
final case class BucketMembers(docs: Seq[(Long, Seq[Long])])

/** A near-duplicate candidate: a new document colliding with a previously
  * seen one in at least one LSH band, with the signature-agreement Jaccard
  * estimate. `docA < docB` always; the same pair may emit from several
  * bands (at-least-once per colliding band) — consumers take the distinct
  * set, which equals the batch operator's output. */
final case class StreamDupCandidate(docA: Long, docB: Long,
                                    estJaccard: Double)

/** Incremental MinHash-LSH near-duplicate detection over a DOCUMENT STREAM —
  * the dedup-at-ingest shape: each arriving document is checked against
  * everything already ingested, without ever rescanning the corpus.
  *
  * The batch operator ([[graft.functions.Dedup.minhashCandidates]]) joins a
  * static corpus against itself; at ingest time that would mean re-running
  * the join per batch over 100 TB of history. Here history lives WHERE the
  * join key is: keyed state per (band, bucket) holds the members of that
  * bucket (id + k-long signature — the full text never enters state), and a
  * new document pairs only against members of ITS OWN buckets. Per-document
  * work is O(bands × bucket occupancy), independent of corpus size; state
  * is the corpus's banded signatures — k longs × bands per doc — the same
  * memory an LSH index would hold, sharded by Spark's state store and
  * restart-safe via the checkpoint.
  *
  * Signatures are computed per-row — no streaming aggregation, so the only
  * stateful operator is the bucket membership itself — through the native
  * codegen'd [[graft.functions.expressions.MinHashSignature]] expression
  * (bit-identical to the column/bulk forms; one hashLong + k hashInt per
  * shingle instead of k interpreted HOF passes).
  *
  * `maxBucketSize` bounds boilerplate mega-buckets: a bucket at the cap
  * stops ADMITTING members, but every arrival still probes the stored
  * members (O(cap) work), so pairs against already-admitted documents keep
  * surfacing; only pairs among the unadmitted overflow are lost from this
  * bucket — the streaming analogue of the batch cap's
  * drop-oversized-buckets rule, with multi-band redundancy as the recall
  * cushion for those. Pass 0 for unbounded (exact equality with the
  * uncapped batch operator).
  *
  * `stateTtlMs` bounds state AGE: a bucket untouched for the TTL is
  * evicted wholesale, turning "dedup against all history" into "dedup
  * against the last TTL of history" — the other axis a truly unbounded
  * feed needs bounded (maxBucketSize bounds per-key width; the TTL bounds
  * key count, which otherwise grows with every distinct bucket ever
  * seen). The horizon is per BUCKET and refreshed by any arrival that
  * probes it, so hot buckets — the ones near-dups actually live in — stay
  * resident indefinitely; only cold buckets age out. 0 keeps state
  * forever (exact parity with the batch operator).
  *
  * A TTL'd query needs a CONTINUOUS trigger (Trigger.ProcessingTime —
  * CdcPipeline's default shape): wall-clock timeouts make the engine
  * request a batch every trigger to check for expirations, which is
  * exactly the periodic cadence a continuous ingest job runs at anyway —
  * but it means Trigger.AvailableNow can never drain-and-stop (there is
  * always "another batch" to run) and `processAllAvailable` never
  * latches. Bounded replays should leave the TTL at 0: a drained run has
  * no wall clock for state to age against.
  */
object StreamingDedup {

  /** Banded per-row projection of a (doc_id, text) stream: one output row
    * per (band, bucket) of the document's MinHash signature. */
  def banded(docs: DataFrame, shingleN: Int, k: Int, bands: Int,
             idCol: String = "doc_id",
             textCol: String = "text"): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs
      // null id/text rows are EXCLUDED (same stated policy as
      // StreamingQuota): without the guard one poison row either NPEs the
      // signature comparison or hits the non-nullable encoder field, and
      // the restart loop replays the same batch and dies forever
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("docId"),
        graft.functions.expressions.TextExpressions.minhashSignatureNative(
          TextFunctions.shingleHashes(col(textCol), shingleN), k).as("sig"))
      .select(col("docId"), col("sig"),
        explode(Dedup.lshBandKeys(col("sig"), k, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("docId"), col("sig"))
      .as[BandedDoc]
  }

  /** Candidate pairs from bucket-keyed incremental state. Append-mode
    * stateful flatMap; each emitted pair is (earlier doc, later doc) by id
    * with the signature-agreement estimate, filtered at `threshold`. */
  def candidates(bandedDocs: Dataset[BandedDoc], k: Int,
                 threshold: Double,
                 maxBucketSize: Int = 0,
                 stateTtlMs: Long = 0L): Dataset[StreamDupCandidate] = {
    import bandedDocs.sparkSession.implicits._

    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / k

    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bandedDocs
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketMembers, StreamDupCandidate](
        OutputMode.Append(), timeoutConf) {
        (_: (Int, Long), incoming: Iterator[BandedDoc],
         state: GroupState[BucketMembers]) =>
          if (state.hasTimedOut) {
            // cold bucket past its TTL: drop the member list wholesale.
            // No arrivals ride this invocation (timeout calls come with an
            // empty iterator), so nothing can emit.
            state.remove()
            Iterator.empty
          } else {
          // Vector: effectively-constant append — a Seq default (List)
          // would copy O(m) per admitted member, O(m²) per mega-bucket
          var members = state.getOption.map(_.docs.toVector).getOrElse(Vector.empty)
          var admitted = false
          val out = Seq.newBuilder[StreamDupCandidate]
          // deterministic intra-batch order so same-batch pairs are stable
          incoming.toSeq.sortBy(_.docId).foreach { d =>
            // probe ALWAYS (O(cap) against stored members — pairs with
            // already-admitted docs still surface from a full bucket);
            // the cap only gates ADMISSION, bounding state
            members.foreach { case (otherId, otherSig) =>
              val e = est(d.sig, otherSig)
              if (e >= threshold && otherId != d.docId) {
                val (a, b) = if (otherId < d.docId) (otherId, d.docId)
                             else (d.docId, otherId)
                out += StreamDupCandidate(a, b, e)
              }
            }
            if (maxBucketSize <= 0 || members.size < maxBucketSize) {
              members = members :+ (d.docId, d.sig)
              admitted = true
            }
          }
          // a full bucket probed by a trigger's arrivals is byte-identical
          // state: skip the rewrite, or every hot bucket re-serializes its
          // whole member list into the checkpoint each trigger
          if (admitted) state.update(BucketMembers(members))
          // any probe refreshes the horizon — hot buckets never age out;
          // setTimeoutDuration needs existing state, which any probed
          // bucket has (first arrival always admits)
          if (stateTtlMs > 0L && state.exists)
            state.setTimeoutDuration(stateTtlMs)
          out.result().iterator
          }
      }
  }

  /** The full operator: text stream in, near-dup candidates out. */
  def minhashCandidates(docs: DataFrame, shingleN: Int = 3, k: Int = 32,
                        bands: Int = 8, threshold: Double = 0.5,
                        maxBucketSize: Int = 0,
                        stateTtlMs: Long = 0L): Dataset[StreamDupCandidate] =
    candidates(banded(docs, shingleN, k, bands), k, threshold, maxBucketSize,
      stateTtlMs)
}
