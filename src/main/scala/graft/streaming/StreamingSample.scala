package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The reservoir after a trigger: `version` counts triggers merged so
  * far; `docIds`/`keys` are aligned, ascending by (key, id). */
final case class ReservoirSnapshot(version: Long, size: Int,
                                   docIds: Seq[Long], keys: Seq[Double])

/** Reservoir state: the k current best (key, id) entries, ascending. */
final case class ReservoirState(version: Long, keys: Seq[Double],
                                ids: Seq[Long])

/** Streaming exact-k WEIGHTED reservoir — the at-ingest twin of
  * [[graft.functions.CorpusOps.sampleWeightedK]], completing the
  * batch/streaming symmetry the quota and dedup operators already have:
  * maintain the k best Efraimidis–Spirakis draws over an unbounded feed,
  * so "the 100k highest-leverage documents so far" is available after
  * EVERY trigger without ever rescanning what already arrived.
  *
  * Because the E-S key is CONTENT-derived (deterministic, not random),
  * the streaming reservoir after draining a feed equals the batch
  * operator's sample on the same rows EXACTLY — set equality, not
  * distribution equality — which puts the streaming leg under the same
  * DuckDB hash oracle as the batch leg (stream_sample_weighted_k), the
  * strongest gate a streaming operator can carry.
  *
  * Scale shape: the E-S key is computed SCAN-SIDE (narrow, parallel);
  * state is exactly k (key, id) pairs by construction — the reservoir
  * IS the state. The single constant-key merge task scans each trigger
  * once against a k-bounded heap (O(batch·log k)); k is sample-sized
  * (thousands), so the merge is bookkeeping, not compute. Emission is
  * one snapshot row per trigger (Update mode) — k-bounded, never
  * data-sized. Rows with NULL id/content or non-positive/NULL weight
  * are excluded — the batch twin's stated policy. */
object StreamingSample {

  def weightedK(docs: DataFrame, k: Int,
                weightCol: String,
                idCol: String = "doc_id",
                contentCol: String = "text"): Dataset[ReservoirSnapshot] = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    import docs.sparkSession.implicits._
    val u = (conv(substring(md5(col(contentCol)), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    docs
      .filter(col(idCol).isNotNull && col(contentCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol).cast("double") > 0)
      .select(col(idCol).cast("long").as("id"),
        (-log(u) / col(weightCol).cast("double")).as("key"))
      .as[(Long, Double)]
      .groupByKey(_ => 0) // ONE reservoir; its state is k rows by construction
      .mapGroupsWithState[ReservoirState, ReservoirSnapshot](
        GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          // max-heap on (key, id): the head is the current WORST entry,
          // so each incoming row is one comparison unless it improves
          implicit val worstFirst: Ordering[(Double, Long)] =
            Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
          val heap = scala.collection.mutable.PriorityQueue
            .empty[(Double, Long)](worstFirst)
          // the at-least-once guard: a re-delivered doc (same id ⇒ same
          // content hash ⇒ same E-S key) must not occupy two reservoir
          // slots and displace a distinct k-th document
          val present = scala.collection.mutable.Set.empty[Long]
          state.getOption.foreach(s =>
            s.keys.zip(s.ids).foreach { e =>
              heap.enqueue(e); present += e._2
            })
          rows.foreach { case (id, key) =>
            if (!present.contains(id)) {
              if (heap.size < k) { heap.enqueue((key, id)); present += id }
              else {
                val (wk, wid) = heap.head
                if (key < wk || (key == wk && id < wid)) {
                  heap.dequeue(); present -= wid
                  heap.enqueue((key, id)); present += id
                }
              }
            }
          }
          val kept = heap.toSeq.sorted
          val version = state.getOption.map(_.version).getOrElse(0L) + 1
          state.update(
            ReservoirState(version, kept.map(_._1), kept.map(_._2)))
          ReservoirSnapshot(version, kept.size,
            kept.map(_._2), kept.map(_._1))
      }
  }
}
