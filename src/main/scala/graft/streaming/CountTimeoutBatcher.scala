package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event as the batcher sees it (collection key + payload slice). */
final case class BatchInput(collection: String, eventId: Long, value: Double)

/** Per-collection accumulation state. Bounded O(1) per key: the batcher
  * keeps AGGREGATES of the open batch, never the buffered events
  * themselves (those are replayable from the checkpointed source), so
  * state size is independent of batch size — the property that lets
  * this run with millions of collections at 100 TB. */
final case class BatcherBuffer(nEvents: Long, sumValue: Double,
                               minEventId: Long, maxEventId: Long,
                               nextSeq: Long)

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
  *  - a partial batch left at the end of a micro-batch arms a
  *    processing-time timeout of `maxWaitMs`; if no event arrives before
  *    it fires, the partial batch is emitted with reason "timeout";
  *  - batchSeq is a dense per-collection sequence, stable across
  *    micro-batch boundaries and restarts (it lives in checkpointed
  *    state).
  */
object CountTimeoutBatcher {

  private def empty(seq: Long): BatcherBuffer =
    BatcherBuffer(0L, 0.0, Long.MaxValue, Long.MinValue, seq)

  private def fold(b: BatcherBuffer, e: BatchInput): BatcherBuffer =
    BatcherBuffer(b.nEvents + 1, b.sumValue + e.value,
      math.min(b.minEventId, e.eventId), math.max(b.maxEventId, e.eventId),
      b.nextSeq)

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
            // max-wait expired: flush the partial batch, clear state
            val buf = state.get
            state.remove()
            if (buf.nEvents > 0) Iterator.single(toBatch(collection, buf, "timeout"))
            else Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(empty(0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[AssembledBatch]
            incoming.foreach { e =>
              buf = fold(buf, e)
              if (buf.nEvents >= maxEvents) {
                out += toBatch(collection, buf, "count")
                buf = empty(buf.nextSeq + 1)
              }
            }
            if (buf.nEvents > 0) {
              state.update(buf)
              state.setTimeoutDuration(maxWaitMs)
            } else {
              state.remove()
            }
            out.iterator
          }
      }
  }
}
