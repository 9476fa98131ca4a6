package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, GreaterThan, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.streaming.BucketedStateTable

/** Materialized-view REWRITE — the optimizer tier on top of
  * [[graft.streaming.IncrementalAgg]]'s maintenance tier: a query that
  * aggregates the 100 TB base table is silently re-planned to read the
  * key-cardinality summary table instead. Maintenance without rewrite
  * only helps callers who KNOW the summary exists; with this
  * `Rule[LogicalPlan]` installed (`SparkSessionExtensions` /
  * `spark.experimental.extraOptimizations`), every dashboard `GROUP BY`
  * over the base — including `spark.sql` from users who never heard of
  * the state table — pays O(keys) instead of O(data). This is the
  * classic materialized-view answering problem restricted to the shapes
  * the summary can serve EXACTLY:
  *
  *  - grouping keys ⊆ the view's key columns (a coarser roll-up re-sums
  *    the summary — sums of sums are sums), or DETERMINISTIC grouping
  *    expressions whose references are all key columns
  *    (`date_trunc(key)`, `substring(key, …)`: the expression evaluates
  *    over the summary's key values to exactly its value over the base
  *    rows of that key, and every served aggregate composes across the
  *    key groups a coarser expression-group merges);
  *  - aggregates are plain `SUM(col)` over registered sum columns
  *    (no DISTINCT, no FILTER), `COUNT(*)`/`COUNT(1)` when the view
  *    maintains a count column (rewritten to `coalesce(SUM(n),0)`),
  *    `COUNT(col)` when the view maintains that column's non-null count,
  *    `AVG(col)` (double results) when it maintains BOTH the sum and
  *    the non-null count (rewritten to `SUM(sums)/SUM(counts)`), and
  *    `MIN(col)`/`MAX(col)` when it maintains per-key extrema
  *    (append-only pipelines only — extrema are not delete-invertible),
  *    and `COUNT(DISTINCT k…)` over KEY columns when the view maintains
  *    a count column (every live summary row is one distinct key
  *    combination);
  *  - an optional deterministic `WHERE` whose references are all key
  *    columns (pushed onto the summary scan — key predicates commute
  *    with the roll-up);
  *  - anything else (expressions over non-key columns, decimal AVG,
  *    DISTINCT/FILTER clauses, joins in between) leaves the plan
  *    untouched — the rule REFUSES rather than approximates.
  *
  * Liveness: when the view maintains a count column, the rewrite reads
  * only summary rows whose live count is POSITIVE. A group deleted down
  * to zero rows keeps a net-zero state row ([[graft.streaming
  * .IncrementalAgg.applyDelta]] never drops rows), and without the filter
  * that ghost would resurrect in the rewritten `GROUP BY` (and inflate
  * `COUNT(DISTINCT …)`) while the base query omits it. Filtering dead
  * rows is exact for every served shape — their net sums/counts are zero
  * — and for extrema the append-only contract means the filter never
  * bites. Register a count column on any view whose pipeline deletes.
  *
  * Staleness contract: the summary answers AS OF its last applied batch.
  * Register a view only where the [[graft.streaming.IncrementalAgg]]
  * pipeline owns every write to the base (the same contract any
  * incremental MV system imposes); results are then exact. For
  * float sums the rewrite changes accumulation ORDER (sums of partial
  * sums) — register integral/decimal sum columns where bit-exactness
  * matters.
  *
  * Output attribute identity: the rewritten Aggregate re-aliases summary
  * columns under the ORIGINAL output `exprId`s, so parent operators (and
  * the caller's `DataFrame`) never see the substitution.
  *
  * This is the SECOND of the library's three metadata tiers (README
  * "metadata tiers"): table-level count/min/max/null-count come cheaper
  * from the zone-map manifests ([[graft.sources.ZoneMap.metaProfile]] —
  * no maintenance pipeline needed), while approximate distincts,
  * quantiles and heavy hitters belong to the sketch tier
  * ([[graft.functions.Sketches]]) — neither composes from sums.
  */
object SummaryViews {

  /** `sumCols` are delta columns maintained by `IncrementalAgg` under the
    * SAME name as the base column they sum; `countCol` is a maintained
    * `SUM(1)` column enabling `COUNT(*)` rewrites; `nnCounts` maps a base
    * column name to a maintained per-column NON-NULL count column
    * (`SUM(IF(col IS NULL, 0, 1))`), enabling `COUNT(col)` rewrites and —
    * together with the column's entry in `sumCols` — `AVG(col)` as
    * `SUM(sums)/SUM(non-null counts)`; `minCols`/`maxCols` map a base
    * column to maintained per-key extrema columns, enabling
    * `MIN(col)`/`MAX(col)` rewrites (mins of mins are mins) — register
    * these ONLY for append-only pipelines
    * ([[graft.streaming.IncrementalAgg.applyDelta]]'s extrema caveat). */
  final case class View(basePath: String, statePath: String,
                        keyCols: Seq[String], sumCols: Set[String],
                        countCol: Option[String],
                        nnCounts: Map[String, String] = Map.empty,
                        minCols: Map[String, String] = Map.empty,
                        maxCols: Map[String, String] = Map.empty)

  /** Registrations per base path. A base may carry SEVERAL summaries
    * (a fine-keyed one for drill-downs, a coarse-keyed one for
    * dashboards); the rule picks, among the views that can serve a given
    * query exactly, the one with the FEWEST key columns — the smallest
    * summary to re-aggregate. Re-registering the same (basePath,
    * statePath) pair REPLACES that registration in place (the idempotent
    * "update my view's columns" path); a different statePath appends. */
  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, List[View]]()

  private def norm(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  def register(v: View): Unit =
    views.compute(norm(v.basePath), (_, cur) =>
      Option(cur).getOrElse(Nil)
        .filterNot(x => norm(x.statePath) == norm(v.statePath)) :+ v)
  def unregister(basePath: String): Unit = {
    Option(views.remove(norm(basePath)))
      .foreach(_.foreach(v => planCache.remove(norm(v.statePath))))
  }
  def clear(): Unit = { views.clear(); planCache.clear() }
  def isEmpty: Boolean = views.isEmpty

  /** Candidate views for a scanned base, coarsest (fewest keys) first. */
  private[plans] def forPaths(paths: Seq[String]): Seq[View] =
    paths.map(norm).flatMap(p => Option(views.get(p)).getOrElse(Nil))
      .distinct.sortBy(_.keyCols.size)

  /** Resolved summary-scan plan per registered view, keyed by state path and
    * stamped with [[BucketedStateTable.stateVersion]] at resolve time.
    * Optimization of the Nth query over a view costs a MEMORY version
    * compare, not a filesystem listing: the plan (and the `FileIndex`
    * inside its `HadoopFsRelation`) re-resolves only after an
    * `IncrementalAgg.applyDelta` fold actually rewrote state buckets.
    * Staleness contract (same one as the view registration itself): the
    * maintaining pipeline runs in THIS process; an out-of-process writer
    * does not bump the version, exactly as it could not keep the summary
    * current in the first place. */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, LogicalPlan)]()

  /** Test spy: how many times a state dir was actually resolved (listed +
    * analyzed) rather than served from [[planCache]]. Atomic — concurrent
    * query optimizations increment it from multiple threads. */
  private[graft] val stateResolves =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** The summary scan for `view`, from cache when current. Each USE gets
    * fresh expression ids (`MultiInstanceRelation.newInstance`) over the
    * shared `HadoopFsRelation`, so two rewrites landing in one plan tree
    * cannot collide on attribute identity while still sharing the cached
    * file listing. Only `MultiInstanceRelation` plans are cached at all —
    * anything else cannot mint fresh ids, so it is re-resolved per use
    * (fresh analysis = fresh exprIds) rather than served verbatim. */
  private[plans] def statePlan(spark: SparkSession,
                               view: View): Option[LogicalPlan] = {
    val dir = BucketedStateTable.stateDir(view.statePath)
    val key = norm(view.statePath)
    val ver = BucketedStateTable.stateVersion(view.statePath)
    val base = Option(planCache.get(key)) match {
      case Some((v, p)) if v == ver && p.isInstanceOf[MultiInstanceRelation] =>
        Some(p)
      case _ =>
        val resolved =
          try Some(spark.read.parquet(dir).queryExecution.analyzed)
          catch { case _: Exception => None } // state absent: refuse, retry next query
        resolved.foreach { p =>
          stateResolves.incrementAndGet()
          if (p.isInstanceOf[MultiInstanceRelation])
            planCache.put(key, (ver, p))
        }
        resolved
    }
    base.map {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
  }

  /** Install on an existing session (the extensions hook only runs at
    * construction). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RewriteToSummary]))
      spark.experimental.extraOptimizations = cur :+ RewriteToSummary(spark)
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[RewriteToSummary])
}

/** The rewrite rule. Runs in the user-provided-optimizer batch (after
  * column pruning), so the guarded pattern is
  * `Aggregate → [Project|Filter]* → LogicalRelation(parquet base)`. */
final case class RewriteToSummary(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import SummaryViews._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SummaryViews.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Strip Projects (attributes, plus Aliases — the analyzer extracts
    * grouping expressions into `… AS _groupingexpression#N` projections
    * below the Aggregate; their definitions are collected and inlined so
    * eligibility is judged on the REAL expressions over base columns),
    * collect Filters, and land on the base relation — anything else
    * refuses. Filter eligibility (key-only, deterministic) is judged per
    * candidate view by [[rewriteWith]]. */
  private def unwrap(plan: LogicalPlan, filters: List[Expression],
                     defs: Map[Long, Expression])
      : Option[(Seq[View], List[Expression], Map[Long, Expression])] =
    plan match {
      case Project(exprs, child)
          if exprs.forall(e => e.isInstanceOf[AttributeReference] ||
            e.isInstanceOf[Alias]) =>
        // outer defs may reference THIS project's aliases — resolve after
        // the recursion returns, substituting inner definitions upward
        val layer = exprs.collect {
          case al: Alias => al.exprId.id -> al.child
        }.toMap
        unwrap(child, filters, defs).map { case (cands, fs, inner) =>
          val resolved = layer.map { case (id, e) =>
            id -> e.transformUp {
              case a: AttributeReference if inner.contains(a.exprId.id) =>
                inner(a.exprId.id)
            }
          }
          (cands, fs, inner ++ resolved)
        }
      case Filter(cond, child) =>
        unwrap(child, cond :: filters, defs)
      case rel: LogicalRelation =>
        val cands = rel.relation match {
          case fs: HadoopFsRelation =>
            forPaths(fs.location.rootPaths.map(_.toString))
          case _ => Nil
        }
        if (cands.nonEmpty) Some((cands, filters, defs)) else None
      case _ => None
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    unwrap(agg.child, Nil, Map.empty).flatMap { case (cands, filters, defs) =>
      // candidates arrive coarsest-first ([[SummaryViews.forPaths]]): the
      // first view that serves the query exactly is the cheapest to read
      cands.iterator.map(v => rewriteWith(agg, v, filters, defs))
        .collectFirst { case Some(p) => p }
    }

  /** A grouping is servable from `view` iff it is a key attribute or a
    * DETERMINISTIC expression whose references are all key columns: such
    * an expression evaluates over the summary's key VALUES to exactly
    * what it evaluates to over the base rows of that key (the same
    * commuting argument as the key-only filter pushdown), and every
    * served aggregate composes across the key groups a coarser
    * f(key)-group merges. Non-deterministic groupings (rand() buckets —
    * which would bucket GROUPS instead of rows) and expressions touching
    * non-key columns refuse. */
  private def groupingServable(view: View, e: Expression): Boolean =
    e.deterministic &&
      e.references.forall(a => view.keyCols.contains(a.name))

  /** `groupBy(expr.as("x"))` leaves the Alias inside groupingExpressions;
    * SQL `GROUP BY expr` does not — compare modulo the outer alias. */
  private def stripAlias(e: Expression): Expression = e match {
    case Alias(child, _) => child
    case other => other
  }

  private def rewriteWith(agg: Aggregate, view: View,
                          filters: List[Expression],
                          defs: Map[Long, Expression]): Option[LogicalPlan] = {
    /** Substitute extracted-projection aliases with their definitions so
      * every eligibility check and every rewritten expression sees base
      * columns only. */
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId.id) =>
        defs(a.exprId.id)
    }
    val groupings = agg.groupingExpressions.map(inline)
    val aggExprs = agg.aggregateExpressions
    locally {
      // key-only AND deterministic: a non-deterministic predicate (e.g.
      // rand() < 0.5 — which also passes the reference check vacuously)
      // pushed onto the summary would sample GROUPS instead of base rows
      val filtersOk = filters.map(inline).forall(f => f.deterministic &&
        f.references.forall(a => view.keyCols.contains(a.name)))
      val groupAttrs = agg.groupingExpressions.collect {
        case a: AttributeReference if !defs.contains(a.exprId.id) => a
      }
      val eligibleKeys = groupings.forall(groupingServable(view, _))
      // the summary side: resolved parquet scan of the state dir, from the
      // version-stamped plan cache (the bucket/guard bookkeeping columns
      // prune away — nothing below references them)
      val stateOpt =
        if (!filtersOk || !eligibleKeys) None
        else SummaryViews.statePlan(spark, view)
      stateOpt.flatMap { state =>
        val stateAttr: Map[String, Attribute] =
          state.output.map(a => a.name -> a).toMap
        val covered =
          (view.keyCols ++ view.sumCols ++ view.countCol ++
            view.nnCounts.values ++ view.minCols.values ++
            view.maxCols.values).forall(stateAttr.contains)
        if (!covered) None
        else {
          // every output expression must map exactly, preserving both the
          // name and the exprId — parents never see the substitution
          val mapped: Seq[Option[NamedExpression]] = aggExprs.map {
            case a: AttributeReference
                if groupAttrs.exists(_.exprId == a.exprId) =>
              Some(Alias(stateAttr(a.name), a.name)(exprId = a.exprId))
            case a: AttributeReference
                if defs.contains(a.exprId.id) &&
                  groupings.exists(_.semanticEquals(inline(a))) =>
              // output referencing an EXTRACTED grouping expression by id
              // (the analyzer's _groupingexpression#N projection shape)
              Some(Alias(inline(a).transform {
                case ar: AttributeReference => stateAttr(ar.name)
              }, a.name)(exprId = a.exprId))
            case a: AttributeReference
                if agg.groupingExpressions.exists {
                  case al: Alias => al.exprId == a.exprId
                  case _ => false
                } =>
              // output referencing an ALIASED grouping expression by id
              // (the groupBy(expr.as("x")) shape): re-root the aliased
              // expression's key references onto the summary scan
              val src = agg.groupingExpressions.collectFirst {
                case al: Alias if al.exprId == a.exprId => inline(al.child)
              }.get
              Some(Alias(src.transform {
                case ar: AttributeReference => stateAttr(ar.name)
              }, a.name)(exprId = a.exprId))
            case al @ Alias(e, name)
                if groupings.exists(g =>
                  stripAlias(g).semanticEquals(inline(e))) =>
              // a key-derived grouping EXPRESSION (date_trunc(key),
              // substring(key, …)) surfacing in the output: re-root its
              // key references onto the summary scan. groupingServable
              // already held for every grouping, and groupings never
              // contain aggregates, so the transform is total.
              Some(Alias(inline(e).transform {
                case a: AttributeReference => stateAttr(a.name)
              }, name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Sum(c: AttributeReference, _), _, false, None, _), name)
                if view.sumCols.contains(c.name) =>
              // re-summing the summary can WIDEN the type (decimal Sum adds
              // 10 precision again: state holds decimal(p+10,s), Sum over it
              // yields decimal(p+20,s)); parents recorded the ORIGINAL type
              // for this exprId, so cast back. The cast is exact whenever
              // the true total fits the original Sum type — the same
              // condition under which the un-rewritten query succeeds.
              val reSum: Expression =
                ae.copy(aggregateFunction = Sum(stateAttr(c.name)))
              val typed =
                if (reSum.dataType == ae.dataType) reSum
                else Cast(reSum, ae.dataType)
              Some(Alias(typed, name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Count(Seq(Literal(_, _))), _, false, None, _), name)
                if view.countCol.isDefined =>
              val n = stateAttr(view.countCol.get)
              val summed: Expression = ae.copy(aggregateFunction = Sum(n))
              // post-analysis plans get no implicit coercion: pin the summed
              // count back to COUNT's own LongType before the coalesce
              val typed =
                if (summed.dataType == ae.dataType) summed
                else Cast(summed, ae.dataType)
              Some(Alias(
                Coalesce(Seq(typed, Literal(0L))),
                name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Count(Seq(c: AttributeReference)), _, false, None, _), name)
                if view.nnCounts.contains(c.name) =>
              // COUNT(col) = total of the maintained per-column non-null
              // count; a group whose every value was null holds nn = 0 and
              // re-sums to 0, matching COUNT's never-null contract
              val nn = stateAttr(view.nnCounts(c.name))
              val summed: Expression = ae.copy(aggregateFunction = Sum(nn))
              val typed =
                if (summed.dataType == ae.dataType) summed
                else Cast(summed, ae.dataType)
              Some(Alias(
                Coalesce(Seq(typed, Literal(0L))),
                name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Min(c: AttributeReference), _, false, None, _), name)
                if view.minCols.contains(c.name) =>
              // min of per-key mins; null state cells (all-null groups)
              // skip, exactly as Min over the base skips null rows. No
              // widening — Min keeps its input type.
              Some(Alias(
                ae.copy(aggregateFunction = Min(
                  stateAttr(view.minCols(c.name)))),
                name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Max(c: AttributeReference), _, false, None, _), name)
                if view.maxCols.contains(c.name) =>
              Some(Alias(
                ae.copy(aggregateFunction = Max(
                  stateAttr(view.maxCols(c.name)))),
                name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Average(c: AttributeReference, _), _, false, None, _), name)
                if view.sumCols.contains(c.name) &&
                  view.nnCounts.contains(c.name) &&
                  ae.dataType == DoubleType =>
              // AVG(col) = SUM(partial sums) / SUM(non-null counts). Two
              // NEW AggregateExpressions (fresh resultIds — ae.copy twice
              // would collide on ae's). Restricted to DoubleType results:
              // decimal Average carries its own precision/scale bump that a
              // sum-then-divide would have to re-derive — refused instead.
              // All-null group: sums re-sum to null, null/0 = null = AVG.
              val sumE: Expression = AggregateExpression(
                Sum(stateAttr(c.name)), ae.mode, isDistinct = false,
                None, NamedExpression.newExprId)
              val cntE: Expression = AggregateExpression(
                Sum(stateAttr(view.nnCounts(c.name))), ae.mode,
                isDistinct = false, None, NamedExpression.newExprId)
              Some(Alias(
                Divide(Cast(sumE, DoubleType), Cast(cntE, DoubleType)),
                name)(exprId = al.exprId))
            case al @ Alias(ae @ AggregateExpression(
                  Count(cs), _, true, None, _), name)
                if view.countCol.isDefined && cs.nonEmpty &&
                  cs.forall(c => groupingServable(view, inline(c))) =>
              // COUNT(DISTINCT key cols — or deterministic expressions
              // over them, same commuting argument as the groupings):
              // every LIVE summary row is one distinct key combination,
              // so distinct-over-f(keys) counts the same value set over
              // the summary's key values as over the base rows — exact
              // only under the liveness filter below (a fully-deleted
              // group's row lingers in state with count 0). Count keeps
              // LongType: no cast. NULL args skip rows identically on
              // both sides (f is deterministic).
              val mappedArgs: Seq[Expression] = cs.map(c =>
                inline(c).transform {
                  case a: AttributeReference => stateAttr(a.name)
                })
              Some(Alias(ae.copy(aggregateFunction = Count(mappedArgs)),
                name)(exprId = al.exprId))
            case _ => None
          }
          if (mapped.exists(_.isEmpty)) None
          else {
            val newGroupings: Seq[Expression] =
              groupings.map(_.transform {
                case a: AttributeReference => stateAttr(a.name)
              })
            val rewrittenFilters = filters.map(f => inline(f).transform {
              case a: AttributeReference => stateAttr(a.name)
            })
            // liveness: only summary rows with base rows still behind them
            // (see the object scaladoc — dead groups must not resurrect;
            // exact for every shape since net-zero rows contribute zero)
            val liveness: Option[Expression] = view.countCol.map { nc =>
              GreaterThan(stateAttr(nc),
                Cast(Literal(0), stateAttr(nc).dataType))
            }
            val newChild = (rewrittenFilters ++ liveness)
              .foldLeft(state)((p, c) => Filter(c, p))
            Some(Aggregate(newGroupings, mapped.map(_.get), newChild))
          }
        }
      }
    }
  }
}
