package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event as the batcher sees it (collection key + payload slice). */
final case class BatchInput(collection: String, eventId: Long, value: Double)

/** Per-collection accumulation state. Bounded O(1) per key: the batcher
  * keeps AGGREGATES of the open batch, never the buffered events
  * themselves (those are replayable from the checkpointed source), so
  * state size is independent of batch size — the property that lets
  * this run with millions of collections at 100 TB. `firstEventAtMs` is
  * the processing-time instant the open batch received its first event
  * (-1 while empty): max-wait is measured from it, not from the latest
  * trigger. The record outlives flushes (an empty buffer keeps
  * `nextSeq`) so the per-collection sequence stays dense forever. */
final case class BatcherBuffer(nEvents: Long, sumValue: Double,
                               minEventId: Long, maxEventId: Long,
                               nextSeq: Long, firstEventAtMs: Long)

/** A flushed batch with why it flushed: "count" (threshold reached) or
  * "timeout" (max-wait expired with a partial batch). */
final case class AssembledBatch(collection: String, batchSeq: Long,
                                nEvents: Long, sumValue: Double,
                                minEventId: Long, maxEventId: Long,
                                flushReason: String)

/** A1+A2 combined the way the reference actually runs them: count batching
  * WITH a max-wait flush (pipeline.rs:1200-1264 — a batch closes when it
  * reaches `max_events` OR when `max_wait` elapses since its first event,
  * whichever first). [[graft.operators.Batching]] expresses the bounded
  * forms; [[CdcPipeline]] maps the thresholds to micro-batch admission.
  * This operator is the third expression: explicit per-key state via
  * `flatMapGroupsWithState` + processing-time timeout, for consumers that
  * need batch ASSEMBLY (ids, boundaries, flush reasons) as first-class
  * streaming output rather than trigger-sized side effects.
  *
  * Semantics per collection:
  *  - events fold into the open batch; when it reaches `maxEvents` it is
  *    emitted with reason "count" and a fresh batch opens;
  *  - a partial batch arms a processing-time timeout for the REMAINDER
  *    of `maxWaitMs` since its FIRST event (later events never extend
  *    it — a steady trickle cannot starve the flush); when it fires the
  *    partial batch is emitted with reason "timeout";
  *  - batchSeq is a dense per-collection sequence, stable across
  *    micro-batch boundaries, restarts, AND flushes (the counter lives
  *    in checkpointed state and survives empty buffers).
  */
object CountTimeoutBatcher {

  private def empty(seq: Long): BatcherBuffer =
    BatcherBuffer(0L, 0.0, Long.MaxValue, Long.MinValue, seq, -1L)

  private def fold(b: BatcherBuffer, e: BatchInput, nowMs: Long): BatcherBuffer =
    BatcherBuffer(b.nEvents + 1, b.sumValue + e.value,
      math.min(b.minEventId, e.eventId), math.max(b.maxEventId, e.eventId),
      b.nextSeq, if (b.nEvents == 0L) nowMs else b.firstEventAtMs)

  private def toBatch(collection: String, b: BatcherBuffer,
                      reason: String): AssembledBatch =
    AssembledBatch(collection, b.nextSeq, b.nEvents, b.sumValue,
      b.minEventId, b.maxEventId, reason)

  def assemble(events: Dataset[BatchInput], maxEvents: Int,
               maxWaitMs: Long): Dataset[AssembledBatch] = {
    require(maxEvents >= 1, "maxEvents must be >= 1")
    require(maxWaitMs >= 1, "maxWaitMs must be >= 1")
    import events.sparkSession.implicits._

    events
      .groupByKey(_.collection)
      .flatMapGroupsWithState[BatcherBuffer, AssembledBatch](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (collection: String, incoming: Iterator[BatchInput],
         state: GroupState[BatcherBuffer]) =>
          if (state.hasTimedOut) {
            // max-wait expired: flush the partial batch; KEEP the state
            // record (empty buffer, advanced seq) so batchSeq stays dense
            val buf = state.get
            state.update(empty(buf.nextSeq + 1))
            if (buf.nEvents > 0) Iterator.single(toBatch(collection, buf, "timeout"))
            else Iterator.empty
          } else {
            val nowMs = state.getCurrentProcessingTimeMs()
            var buf = state.getOption.getOrElse(empty(0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[AssembledBatch]
            incoming.foreach { e =>
              buf = fold(buf, e, nowMs)
              if (buf.nEvents >= maxEvents) {
                out += toBatch(collection, buf, "count")
                buf = empty(buf.nextSeq + 1)
              }
            }
            state.update(buf)
            if (buf.nEvents > 0)
              // arm the REMAINDER of max-wait since the batch's first
              // event — re-arming the full duration every trigger would
              // let a trickle starve the flush forever
              state.setTimeoutDuration(
                math.max(1L, buf.firstEventAtMs + maxWaitMs - nowMs))
            out.iterator
          }
      }
  }
}
