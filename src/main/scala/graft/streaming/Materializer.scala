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
  * Deletes: `dropOps` operations REMOVE the key (emit nothing, clear
  * state) — pass empty to treat every op as an upsert.
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
          if (dropOps.contains(latest.operation)) {
            state.remove()
            Iterator.empty
          } else if (state.getOption.contains(latest)) {
            Iterator.empty // no change this batch — no delta emitted
          } else {
            state.update(latest)
            Iterator.single(latest.copy(key = key))
          }
      }
  }
}
