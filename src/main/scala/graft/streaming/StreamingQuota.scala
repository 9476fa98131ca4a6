package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted document as the quota operator emits it. */
final case class AdmittedDoc(docId: Long, group: String, nTokens: Long,
                             spentBefore: Long)

/** Per-group admission state: tokens spent so far. */
final case class GroupBudget(spent: Long)

/** Streaming token-budget admission — the AT-INGEST twin of
  * [[graft.functions.CorpusOps.sampleTokenBudget]], completing the
  * "corpus ops run at ingest" trio (cleaning: PipelineConfig.transform;
  * dedup: [[StreamingDedup]]; mixing quota: here). A batch pipeline
  * re-decides the whole mix per run; at ingest time each source should
  * stop ADMITTING documents the moment its token budget is spent, without
  * ever rescanning what already landed.
  *
  * Semantics: a document is admitted iff the tokens admitted for its
  * group BEFORE it total less than the budget — the same overshoot-by-at-
  * most-one-document rule as the batch operator. Order differs by design:
  * the batch operator ranks by content hash (a corpus-wide decision);
  * ingest admits in ARRIVAL order (batch sequence, id-ordered within a
  * micro-batch for determinism under replay).
  *
  * Scale shape: state is ONE long per group (the spent counter) — keyed
  * state so small the state store is effectively free; per-document work
  * is O(1). Group count = source count, so a feed with few giant sources
  * concentrates its admission bookkeeping in few state keys — fine,
  * because the VALUE is a counter, not a member list. */
object StreamingQuota {

  def admitByTokenBudget(docs: DataFrame, tokensPerGroup: Long,
                         groupCol: String = "source",
                         textCol: String = "text",
                         idCol: String = "doc_id"): Dataset[AdmittedDoc] = {
    require(tokensPerGroup >= 1, s"budget must be >= 1 (got $tokensPerGroup)")
    import docs.sparkSession.implicits._
    docs
      // null id/group/text rows are EXCLUDED (stated policy, matching the
      // batch twin) — without the id guard a single null id would hit the
      // non-nullable tuple encoder and kill the whole query
      .filter(col(idCol).isNotNull && col(groupCol).isNotNull &&
        col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("docId"),
        col(groupCol).as("group"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
          .as("nTokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[GroupBudget, AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (group: String, incoming: Iterator[(Long, String, Long)],
         state: GroupState[GroupBudget]) =>
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          // saturated group: reject the whole trigger without buffering or
          // sorting it — the permanent steady state of an exhausted source
          // must be genuinely O(1), not O(batch log batch)
          if (spent >= tokensPerGroup) Iterator.empty
          else {
            val out = Seq.newBuilder[AdmittedDoc]
            // id order within the trigger: deterministic under replay
            incoming.toSeq.sortBy(_._1).foreach { case (id, _, tok) =>
              if (spent < tokensPerGroup) {
                out += AdmittedDoc(id, group, tok, spent)
                spent += tok
              }
            }
            state.update(GroupBudget(spent))
            out.result().iterator
          }
      }
  }
}
