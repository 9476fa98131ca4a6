package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed change event (the typed slice of the envelope that table
  * materialization needs). */
final case class KeyedEvent(key: Long, clusterTime: java.sql.Timestamp,
                            eventId: Long, operation: String, value: Double)

/** CDC table materialization: fold a change stream into the CURRENT row
  * per document key — the "replicate into a queryable table" use the
  * reference's consumers build downstream of its S3 objects, expressed
  * with Spark's arbitrary-state operator.
  *
  * State per key = the latest (cluster_time, event_id) event seen; each
  * micro-batch emits only keys whose latest row CHANGED (update-mode
  * deltas). State survives micro-batches via the checkpoint — restart
  * resumes materialization where it left off, same as every other
  * pipeline in this package.
  *
  * Deletes: `dropOps` operations suppress the key (nothing is emitted) —
  * pass empty to treat every op as an upsert. The delete is kept in state
  * as a TOMBSTONE, not removed: clearing state would let a late-arriving
  * event OLDER than the delete win `maxBy` against nothing and resurrect
  * the deleted row — the exact out-of-order hazard the upsert path's
  * `maxBy(state ++ incoming)` already defends against. Tombstones hold
  * state per deleted key; at corpus scale bound them with a state TTL
  * (`GroupStateTimeout`) sized to the source's maximum replay lateness.
  */
object Materializer {

  def latestByKey(events: Dataset[KeyedEvent],
                  dropOps: Set[String] = Set.empty): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._

    def order(e: KeyedEvent): (Long, Int, Long) =
      (e.clusterTime.getTime, e.clusterTime.getNanos, e.eventId)

    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyedEvent, KeyedEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: Long, incoming: Iterator[KeyedEvent],
         state: GroupState[KeyedEvent]) =>
          val all = state.getOption.toSeq ++ incoming
          val latest = all.maxBy(order)
          if (state.getOption.contains(latest)) {
            Iterator.empty // no change this batch — no delta emitted
          } else {
            // tombstones ride the same state slot: a later batch's older
            // event loses maxBy against the stored delete and stays dead
            state.update(latest)
            if (dropOps.contains(latest.operation)) Iterator.empty
            else Iterator.single(latest.copy(key = key))
          }
      }
  }
}
