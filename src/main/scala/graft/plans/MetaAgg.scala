package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.EvalMode
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-served aggregates — the optimizer tier over
  * [[graft.sources.ZoneMap.metaProfile]], and the third rewrite rule in
  * the family ([[SummaryViews]] serves MAINTAINED summaries,
  * [[RewriteToBloomPrunedJoin]] prunes scans, this rule serves whole
  * aggregates from the layout's own statistics): a plain
  * `SELECT count(*) / count(c) / min(c) / max(c) / sum(c) FROM layout
  * [WHERE range-conjuncts-on-zoned-columns]` over a zone-registered
  * parquet layout is answered from the `_zonemap` manifest for every file
  * the predicate FULLY covers, scanning only the boundary files it
  * partially covers — the small-materialized-aggregates design (Moerkotte,
  * VLDB '98), the same trick every lakehouse table format plays with its
  * file-statistics tier, here on plain parquet. At 100 TB the win is
  * structural: a dashboard `count(*) WHERE day BETWEEN …` on a
  * range-clustered layout reads a KB manifest plus the two boundary
  * files instead of the terabytes between them; with no predicate at all
  * the data files are never opened.
  *
  * Exactness argument, leg by leg. The manifest holds, per data file,
  * `n_rows` and per indexed column `min / max / null-count` (and, for
  * exact-associative types, `sum`). A file is COVERED by a conjunct
  * `c (cmp) lit` iff its zone certifies every row passes: the zone
  * interval lies inside the predicate interval (strictness respected)
  * and the file has ZERO nulls in `c` (a null row fails every
  * comparison). For covered files the per-file statistics ARE the
  * aggregate of their passing rows (all rows pass), and the four
  * statistics compose losslessly: count = Σ n_rows, count(c) =
  * Σ (n_rows − nulls), min = min of mins, max = max of maxes, sum =
  * Σ sums. Files the predicate PARTIALLY covers (zone intersects but is
  * not contained, null-free not certified) are scanned with the ORIGINAL
  * filter re-applied — row-exact by construction. Files the zone
  * EXCLUDES hold no passing rows (range comparisons are null-rejecting,
  * so all-null zones are excluded too). The two legs union and a final
  * combine aggregates them (counts coalesce to 0 on the all-empty edge —
  * `count` over an empty table is 0, `min/max/sum` are NULL).
  *
  * SUM is served only for integral and decimal columns — exactly the
  * types where re-aggregating per-file sums equals the row sum in any
  * order (long arithmetic is associative, wraparound included; decimal
  * is exact, and the widened re-aggregate casts back to the original sum
  * type losslessly or overflows exactly where the direct sum would).
  * Float/double sums are order-dependent — the manifest doesn't even
  * record them ([[graft.sources.ZoneMap.sumable]]), and the rule refuses.
  * AVG is never served: Spark's Average accumulates doubles in row
  * order; recomposing it from exact sum/count would be a DIFFERENT
  * double. Users who want the metadata speed spell `sum(c)/count(c)`.
  *
  * Staleness discipline: the rule compares the relation's OWN file
  * listing against the manifest. Files the listing has but the manifest
  * doesn't (appended since the last [[graft.sources.ZoneMap.update]])
  * are scanned raw in the partial leg — fresh data is never missed; a
  * manifest row whose file vanished from the listing means the manifest
  * is STALE (a rewrite raced it) and the whole rule refuses. Parquet
  * part files are immutable-by-name (every writer mints fresh names), so
  * listing equality certifies statistic validity — the same contract
  * Spark's own FileIndex caching and every manifest tier here relies on.
  *
  * GROUP BY serves when the layout is CLUSTERED by the group columns: a
  * file HOMOGENEOUS in every one of them (zone min == max with zero
  * nulls, or all-NULL — the SQL NULL group) contributes its statistics
  * to a single output group straight from its manifest row; mixed files
  * scan, group and fold in. The same homogeneity serves DISTINCT
  * shapes — `SELECT DISTINCT g` and `count(DISTINCT c)` (global or per
  * group) — through legs of distinct VALUES; a distinct count never
  * mixes with plain aggregates.
  *
  * Scope is otherwise tight; the rule REFUSES (leaves the plan
  * untouched, full scan, exact answers) unless every condition holds:
  * every aggregate one of count(*)/count(c)/min(c)/max(c)/sum(c)/
  * count(DISTINCT c) on a zone-indexed DATA column (no FILTER clause,
  * no TRY-mode sums), every grouping expression a bare zone-indexed
  * attribute, every WHERE conjunct a literal range / equality
  * comparison on a zone-indexed column, single-root registered
  * relation, manifest schema carrying the needed statistic columns.
  * Probe failures refuse loudly through the
  * [[BloomJoins.RefusalMetric]] counter ("meta-agg" leg).
  *
  * Cost: plan-time work is one manifest-schema probe, one manifest
  * file-list collect and (with a predicate) one boundary-file collect —
  * all metadata-sized and cached under the manifest VERSION
  * ([[BloomJoins.cachedProbe]]), so a dashboard re-issuing the query
  * replans from memory. The rewritten plan's manifest leg is a
  * files-sized parquet aggregate executed distributed at RUN time.
  */
object MetaAgg {

  /** Test spy: rewrites actually fired. */
  private[graft] val served = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One servable aggregate, resolved to a RELATION column name. */
  private[plans] sealed trait Spec
  private[plans] case object CountStar extends Spec
  private[plans] final case class CountCol(c: String) extends Spec
  private[plans] final case class MinCol(c: String) extends Spec
  private[plans] final case class MaxCol(c: String) extends Spec
  private[plans] final case class SumCol(c: String) extends Spec
  /** A grouping column passed through to the output (grouped serving). */
  private[plans] final case class GroupKey(c: String) extends Spec
  /** `count(DISTINCT c)` — served through distinct-value legs. */
  private[plans] final case class DistinctCount(c: String) extends Spec

  /** One WHERE conjunct's contribution: an optionally-open interval on a
    * zone column, with STRICTNESS kept (the covered test needs it: a file
    * with `c_min == lo` is fully covered by `c >= lo` but not `c > lo`). */
  private[plans] final case class Bound(value: Any, inclusive: Boolean)
  private[plans] final case class ColRange(c: String, lo: Option[Bound],
                                    hi: Option[Bound])


  /** Install on an existing session, AHEAD of the scan-pruning rule but
    * BEHIND the summary-view rewrite: in the user-rule fixed point the
    * first matching rewrite wins. An aggregate this rule can serve from
    * the manifest must not first have its scan swapped by
    * [[RewriteToBloomPrunedJoin]] (after the swap the relation is no
    * longer a registered single-root scan — pruned scan instead of no
    * scan); conversely a query a MAINTAINED summary can serve must go to
    * [[RewriteToSummary]] first — the O(keys) state table beats the
    * files-sized manifest leg plus boundary scans every time. Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RewriteToMetaAggregate])) {
      val (summaries, rest) =
        cur.partition(_.isInstanceOf[RewriteToSummary])
      spark.experimental.extraOptimizations =
        summaries ++ (RewriteToMetaAggregate(spark) +: rest)
    }
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[RewriteToMetaAggregate])
}

/** The rewrite rule — see [[MetaAgg]] for semantics. Matches a global
  * `Aggregate` whose child unwraps (through attribute/rename Projects
  * and Filters) to a single zone-registered parquet relation. */
final case class RewriteToMetaAggregate(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import BloomJoins.{cachedProbe, refused, Probed, RefusedTransient, RefusedWide}
  import MetaAgg.{Bound, ColRange, CountCol, CountStar, DistinctCount, GroupKey, MaxCol, MinCol, Spec, SumCol}

  /** The plan-time manifest collects execute queries WHILE this rule is
    * running; their optimization must not re-enter the rule. */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (inRule.get()) plan
    else {
      inRule.set(true)
      try plan.transformDown {
        case agg @ Aggregate(gexprs, aggExprs, child, _)
            if aggExprs.nonEmpty &&
              gexprs.forall(_.isInstanceOf[AttributeReference]) =>
          tryServe(gexprs.map(_.asInstanceOf[AttributeReference]),
            aggExprs, child).getOrElse(agg)
      } finally inRule.set(false)
    }

  // ------------------------------------------------------------ matching

  /** Unwrap attribute/rename Projects and Filters down to the relation,
    * keeping the invariant that collected conditions and the
    * substitution map are expressed in CURRENT-depth attributes — at the
    * relation both are in relation attrs. Any other node refuses. */
  private def unwrap(plan: LogicalPlan)
      : Option[(LogicalRelation, List[Expression],
                Map[ExprId, AttributeReference])] = {
    var cur = plan
    var conds: List[Expression] = Nil
    var sub = Map.empty[ExprId, AttributeReference]
    while (true) {
      cur match {
        case Project(exprs, pchild) if exprs.forall {
              case _: AttributeReference => true
              case Alias(_: AttributeReference, _) => true
              case _ => false
            } =>
          val m: Map[ExprId, AttributeReference] = exprs.collect {
            case a: AttributeReference => a.exprId -> a
            case al @ Alias(a: AttributeReference, _) => al.exprId -> a
          }.toMap
          conds = conds.map(_.transform {
            case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
          })
          sub = sub.map { case (k, v) =>
            k -> m.getOrElse(v.exprId, v)
          } ++ m
          cur = pchild
        case Filter(c, fchild) =>
          conds = conds :+ c
          cur = fchild
        case rel: LogicalRelation =>
          return Some((rel, conds, sub))
        case _ => return None
      }
    }
    None // unreachable
  }

  /** Resolve an aggregate argument to a relation column name (through the
    * unwrapped rename map); None refuses. */
  private def relCol(e: Expression, sub: Map[ExprId, AttributeReference],
                     rel: LogicalRelation): Option[String] = e match {
    case a: AttributeReference =>
      val r = sub.getOrElse(a.exprId, a)
      rel.output.find(_.exprId == r.exprId).map(_.name)
    case _ => None
  }

  private def sumableType(dt: DataType): Boolean =
    graft.sources.ZoneMap.sumable(dt)

  /** Parse every WHERE conjunct as a literal comparison on a zone column;
    * ALL conjuncts must parse or the whole rule refuses (one undecidable
    * conjunct means no file can be certified fully covered). NULL-literal
    * comparisons refuse here — [[RewriteToBloomPrunedJoin]]'s Filter leg
    * already collapses those scans. Several conjuncts on one column each
    * stay their own [[ColRange]]; the covered/candidate tests AND over
    * all of them, which IS the interval intersection. */
  private def parseConds(conds: Seq[Expression], zcols: Set[String],
                         sub: Map[ExprId, AttributeReference],
                         rel: LogicalRelation): Option[Seq[ColRange]] = {
    def zc(e: Expression): Option[String] =
      relCol(e, sub, rel).filter(zcols.contains)
    def litV(l: Literal): Option[Any] = Option(l.value)
    val parsed: Seq[Option[ColRange]] = conds.flatMap(conjunctsOf).map {
      case IsNotNull(a: AttributeReference) =>
        // the optimizer infers IsNotNull beside every range conjunct; on a
        // zone column it maps to the unbounded range (covered = zero
        // nulls, candidate = any non-null value)
        zc(a).map(c => ColRange(c, None, None))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), false)), None)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), true)), None)
      case LessThan(a: AttributeReference, l: Literal) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, None, Some(Bound(scalaV(a, v), false)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, None, Some(Bound(scalaV(a, v), true)))
      case EqualTo(a: AttributeReference, l: Literal) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), true)),
            Some(Bound(scalaV(a, v), true)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, None, Some(Bound(scalaV(a, v), false)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, None, Some(Bound(scalaV(a, v), true)))
      case LessThan(l: Literal, a: AttributeReference) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), false)), None)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), true)), None)
      case EqualTo(l: Literal, a: AttributeReference) =>
        for (c <- zc(a); v <- litV(l))
          yield ColRange(c, Some(Bound(scalaV(a, v), true)),
            Some(Bound(scalaV(a, v), true)))
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) None else Some(parsed.map(_.get))
  }

  /** Literal values cross the manifest-query boundary as Columns —
    * convert catalyst-internal representations (UTF8String, Decimal) to
    * the Scala form `lit()` accepts. */
  private def scalaV(a: AttributeReference, v: Any): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(a.dataType)(v)

  /** Value → stable cache-key string: Array[Byte] (a BinaryType bound)
    * stringifies by CONTENT, not identity — an identity image would make
    * the probe key unique per planning and churn the shared LRU. */
  private def keyStr(v: Any): String = v match {
    case a: Array[Byte] => java.util.Arrays.toString(a)
    case other => String.valueOf(other)
  }

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  // ------------------------------------------------------------- serving

  private def tryServe(gexprs: Seq[AttributeReference],
                       aggExprs: Seq[NamedExpression],
                       child: LogicalPlan): Option[LogicalPlan] =
    for {
      (rel, conds, sub) <- unwrap(child)
      root <- BloomJoins.singleRootOf(spark, rel)
      zls = BloomJoins.zoneLayoutsFor(root)
      if zls.nonEmpty
      zcols = zls.map(_.col).toSet
      groupCols <- resolveGroups(gexprs, sub, rel, zcols)
      specs <- parseSpecs(aggExprs, sub, rel, zcols, groupCols)
      // shape validation: a DISTINCT COUNT never mixes with other
      // aggregates (Spark plans that mix through Expand — a different
      // shape that never reaches here anyway); at most one
      if specs.count(_.isInstanceOf[DistinctCount]) <= 1 &&
        (!specs.exists(_.isInstanceOf[DistinctCount]) ||
          specs.forall(sp => sp.isInstanceOf[DistinctCount] ||
            sp.isInstanceOf[GroupKey]))
      ranges <- parseConds(conds, zcols, sub, rel)
      plan <- serve(aggExprs, specs, groupCols, conds, ranges, rel, root)
    } yield plan

  /** Every grouping expression must be a bare attribute resolving to a
    * zone-indexed relation column — homogeneity (one group value per
    * file) is certified from that column's zone. */
  private def resolveGroups(gexprs: Seq[AttributeReference],
                            sub: Map[ExprId, AttributeReference],
                            rel: LogicalRelation,
                            zcols: Set[String]): Option[Seq[String]] = {
    val cols = gexprs.map(g => relCol(g, sub, rel).filter(zcols.contains))
    if (cols.exists(_.isEmpty)) None else Some(cols.map(_.get))
  }

  /** Every output expression must be a servable aggregate; any other
    * shape refuses the whole rewrite. */
  private def parseSpecs(aggExprs: Seq[NamedExpression],
                         sub: Map[ExprId, AttributeReference],
                         rel: LogicalRelation,
                         zcols: Set[String],
                         groupCols: Seq[String]): Option[Seq[Spec]] = {
    val specs: Seq[Option[Spec]] = aggExprs.map { ne =>
      val keyOpt = ne match {
        case a: AttributeReference =>
          relCol(a, sub, rel).filter(groupCols.contains).map(GroupKey)
        case al @ Alias(a: AttributeReference, _) =>
          relCol(a, sub, rel).filter(groupCols.contains).map(GroupKey)
        case _ => None
      }
      if (keyOpt.isDefined) keyOpt
      else parseAgg(ne, sub, rel, zcols)
    }
    if (specs.exists(_.isEmpty)) None else Some(specs.map(_.get))
  }

  private def parseAgg(ne: NamedExpression,
                       sub: Map[ExprId, AttributeReference],
                       rel: LogicalRelation,
                       zcols: Set[String]): Option[Spec] = {
      val aeOpt = ne match {
        case Alias(x: AggregateExpression, _) => Some(x)
        case x: AggregateExpression => Some(x)
        case _ => None
      }
      aeOpt.filter(_.filter.isEmpty)
        .flatMap { ae =>
          ae.aggregateFunction match {
            case c: Count if ae.isDistinct && c.children.length == 1 =>
              // count(DISTINCT c): served via distinct-value legs
              c.children.head match {
                case e => relCol(e, sub, rel).filter(zcols.contains)
                    .map(DistinctCount)
              }
            case _ if ae.isDistinct => None
            case c: Count if c.children.length == 1 =>
              c.children.head match {
                case Literal(v, _) if v != null => Some(CountStar)
                case e => relCol(e, sub, rel).filter(zcols.contains)
                    .map(CountCol)
              }
            case m: Min =>
              relCol(m.child, sub, rel).filter(zcols.contains).map(MinCol)
            case m: Max =>
              relCol(m.child, sub, rel).filter(zcols.contains).map(MaxCol)
            case s: Sum if sumableType(s.child.dataType) &&
                s.evalContext.evalMode != EvalMode.TRY =>
              // TRY sums return NULL on overflow — a semantics the
              // composed per-file sums cannot replicate; LEGACY (wraps)
              // and ANSI (errors) both compose, argued in the scaladoc
              relCol(s.child, sub, rel).filter(zcols.contains).map(SumCol)
            case _ => None
          }
        }
  }

  /** Build the two-leg replacement plan; None refuses (stale manifest,
    * missing statistic columns, probe failure). */
  private def serve(aggExprs: Seq[NamedExpression], specs: Seq[Spec],
                    groupCols: Seq[String],
                    conds: List[Expression], ranges: Seq[ColRange],
                    rel: LogicalRelation, root: String)
      : Option[LogicalPlan] = try {
    val nroot = BloomJoins.norm(root)
    val mpath = s"$root/_zonemap"
    val ver = graft.sources.Manifests.manifestVersion(root, "_zonemap")

    // manifest schema: every needed statistic column must exist (an older
    // manifest without <c>_sum refuses SUM serving but a rebuilt one serves)
    val fields = cachedProbe(("metaschema", nroot, ver)) {
      try Probed(spark.read.parquet(mpath).schema.fieldNames.toSeq)
      catch { case e: Exception =>
        refused(root, "meta-agg", e); RefusedTransient }
    }.getOrElse(return None).toSet
    val needed: Seq[String] = specs.flatMap {
      case CountStar => Nil
      case CountCol(c) => Seq(s"${c}_nulls")
      case MinCol(c) => Seq(s"${c}_min")
      case MaxCol(c) => Seq(s"${c}_max")
      case SumCol(c) => Seq(s"${c}_sum", s"${c}_nulls")
      case GroupKey(_) => Nil
      case DistinctCount(c) => Seq(s"${c}_min", s"${c}_max", s"${c}_nulls")
    } ++ ranges.flatMap(r =>
      Seq(s"${r.c}_min", s"${r.c}_max", s"${r.c}_nulls")) ++
      groupCols.flatMap(g =>
        Seq(s"${g}_min", s"${g}_max", s"${g}_nulls"))
    if (!needed.forall(fields.contains)) return None

    // SUM validity: on a mixed-schema manifest (an out-of-process append
    // beside pre-`_sum` rows) the old files' sums read as NULL and a
    // served SUM would silently drop them. A NULL sum is only legitimate
    // for an all-NULL-column file; anything else refuses SUM serving
    // until the manifest is rebuilt (ZoneMap.update does so on schema
    // drift). Version-cached: one tiny manifest job per manifest version.
    val sumColsNeeded = specs.collect { case SumCol(c) => c }.distinct
    sumColsNeeded.foreach { c =>
      val ok = cachedProbe(("metasumok", nroot, ver, c)) {
        try {
          val bad = spark.read.parquet(mpath)
            .filter(col(s"${c}_sum").isNull &&
              col(s"${c}_nulls") =!= col("n_rows"))
            .limit(1).count()
          if (bad > 0L) RefusedWide // stays refused until a rebuild bumps
          else Probed(Nil)
        } catch { case e: Exception =>
          refused(root, "meta-agg", e); RefusedTransient }
      }
      if (ok.isEmpty) return None
    }

    // distinct-value serving: a pure SELECT DISTINCT (all specs group
    // keys) or a count(DISTINCT c) [GROUP BY ...] routes through legs of
    // DISTINCT VALUES instead of folded statistics; homogeneity is then
    // required on the distinct column too (its value set per servable
    // file must be exactly {min} or {NULL})
    val dcCol: Option[String] =
      specs.collectFirst { case DistinctCount(c) => c }
    val distinctMode = specs.forall(sp =>
      sp.isInstanceOf[GroupKey] || sp.isInstanceOf[DistinctCount])
    if (dcCol.isDefined && !distinctMode) return None
    val legsCols: Seq[String] = groupCols ++ dcCol.toSeq

    // listing vs manifest: appended files scan raw; a manifest row whose
    // file vanished means a rewrite raced the manifest — refuse
    def normF(p: String): String = new org.apache.hadoop.fs.Path(p)
      .toUri.getPath
    val listing: Seq[String] = rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.inputFiles.toSeq
      case _ => return None
    }
    val listingByNorm = listing.map(f => normF(f) -> f).toMap
    val manifestFiles = cachedProbe(("metafiles", nroot, ver)) {
      try Probed(spark.read.parquet(mpath).select("file")
        .collect().map(r => normF(r.getString(0))).toSeq)
      catch { case e: Exception =>
        refused(root, "meta-agg", e); RefusedTransient }
    }.getOrElse(return None)
    val manifestSet = manifestFiles.toSet
    if (!manifestSet.subsetOf(listingByNorm.keySet)) return None // stale
    val unknown = listing.filterNot(f => manifestSet.contains(normF(f)))

    // zone tests per parsed range, strictness-aware
    def coveredTest(r: ColRange): Column = {
      val base = col(s"${r.c}_nulls") === 0L
      val loT = r.lo.fold(lit(true))(b =>
        if (b.inclusive) col(s"${r.c}_min") >= lit(b.value)
        else col(s"${r.c}_min") > lit(b.value))
      val hiT = r.hi.fold(lit(true))(b =>
        if (b.inclusive) col(s"${r.c}_max") <= lit(b.value)
        else col(s"${r.c}_max") < lit(b.value))
      base && loT && hiT
    }
    def candidateTest(r: ColRange): Column = {
      val base = col(s"${r.c}_min").isNotNull // all-NULL zones never match
      val loT = r.lo.fold(lit(true))(b =>
        if (b.inclusive) col(s"${r.c}_max") >= lit(b.value)
        else col(s"${r.c}_max") > lit(b.value))
      val hiT = r.hi.fold(lit(true))(b =>
        if (b.inclusive) col(s"${r.c}_min") <= lit(b.value)
        else col(s"${r.c}_min") < lit(b.value))
      base && loT && hiT
    }
    val covered = ranges.map(coveredTest)
      .reduceOption(_ && _).getOrElse(lit(true))
    val candidate = ranges.map(candidateTest)
      .reduceOption(_ && _).getOrElse(lit(true))
    // grouped serving additionally demands each file be HOMOGENEOUS in
    // every group column: one value throughout (zero nulls, min == max)
    // or all-NULL (the SQL NULL group) — only then do the file's
    // statistics belong to a single output group
    val homog = legsCols.distinct.map { g =>
      (col(s"${g}_nulls") === 0L &&
        col(s"${g}_min") === col(s"${g}_max")) ||
        col(s"${g}_nulls") === col("n_rows")
    }.reduceOption(_ && _).getOrElse(lit(true))

    // files scanned raw: predicate-boundary files and (when grouping or
    // serving distincts) covered-but-mixed files — the original filter
    // re-applies there
    val servableM = covered && homog
    val partialFiles: Seq[String] =
      if (ranges.isEmpty && legsCols.isEmpty) Nil
      else {
        val bk = ranges.map(r => (r.c,
          r.lo.map(b => (keyStr(b.value), b.inclusive)),
          r.hi.map(b => (keyStr(b.value), b.inclusive))))
          .sortBy(_._1).toList
        cachedProbe(("metapartial", nroot, ver, bk, legsCols.toList)) {
          try Probed(spark.read.parquet(mpath)
            .filter(candidate && !servableM)
            .select("file").sort("file")
            .collect().map(_.getString(0)).toSeq)
          catch { case e: Exception =>
            refused(root, "meta-agg", e); RefusedTransient }
        }.getOrElse(return None)
      }

    // ---- manifest leg: servable files' statistics, aggregated
    // distributed (grouped by each file's single group value when
    // grouping: its min — or NULL for an all-null zone)
    def aliasN(i: Int) = s"a$i"
    def gAlias(j: Int) = s"g$j"
    val gVals: Seq[Column] = legsCols.zipWithIndex.map { case (g, j) =>
      when(col(s"${g}_nulls") === col("n_rows"), lit(null))
        .otherwise(col(s"${g}_min")).as(gAlias(j))
    }
    val mAggs: Seq[Column] = specs.zipWithIndex.collect {
      case (CountStar, i) => sum(col("n_rows")).as(aliasN(i))
      case (CountCol(c), i) =>
        sum(col("n_rows") - col(s"${c}_nulls")).as(aliasN(i))
      case (MinCol(c), i) => min(col(s"${c}_min")).as(aliasN(i))
      case (MaxCol(c), i) => max(col(s"${c}_max")).as(aliasN(i))
      case (SumCol(c), i) => sum(col(s"${c}_sum")).as(aliasN(i))
    }
    // .distinct() would emit a Deduplicate node — the main optimizer's
    // ReplaceDeduplicateWithAggregate has already run by the time this
    // rule fires, so build the distinct as the Aggregate it would have
    // become
    def distinctOf(df: DataFrame): DataFrame = {
      val lp = df.queryExecution.analyzed
      GraftBridge.ofRows(spark,
        Aggregate(lp.output, lp.output, lp))
    }
    val mBase = spark.read.parquet(mpath).filter(servableM)
    val mleg =
      if (distinctMode) distinctOf(mBase.select(gVals: _*))
      else if (groupCols.isEmpty) mBase.agg(mAggs.head, mAggs.tail: _*)
      else mBase.groupBy(gVals: _*).agg(mAggs.head, mAggs.tail: _*)

    // ---- partial leg: boundary + unknown files, original filter re-applied
    val scanFiles = partialFiles ++ unknown.sorted
    val combined: DataFrame =
      if (scanFiles.isEmpty) mleg
      else {
        val scan = graft.sources.Manifests
          .batchedRead(spark, scanFiles.iterator, basePath = Some(root))
          .get.queryExecution.analyzed
        val byName = scan.output.map(a => a.name -> a).toMap
        if (!rel.output.forall(o => byName.contains(o.name))) return None
        val restored: Seq[NamedExpression] = rel.output.map(o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId))
        val filtered = conds.reduceOption(And)
          .map(c => Filter(c, Project(restored, scan)): LogicalPlan)
          .getOrElse(Project(restored, scan))
        val pdf = GraftBridge.ofRows(spark, filtered)
        val pAggs: Seq[Column] = specs.zipWithIndex.collect {
          case (CountStar, i) => count(lit(1)).as(aliasN(i))
          case (CountCol(c), i) => count(col(c)).as(aliasN(i))
          case (MinCol(c), i) => min(col(c)).as(aliasN(i))
          case (MaxCol(c), i) => max(col(c)).as(aliasN(i))
          case (SumCol(c), i) => sum(col(c)).as(aliasN(i))
        }
        val pGroups = legsCols.zipWithIndex.map { case (g, j) =>
          col(g).as(gAlias(j))
        }
        val pleg =
          if (distinctMode) distinctOf(pdf.select(pGroups: _*))
          else if (groupCols.isEmpty) pdf.agg(pAggs.head, pAggs.tail: _*)
          else pdf.groupBy(pGroups.take(groupCols.length): _*)
            .agg(pAggs.head, pAggs.tail: _*)
        mleg.unionByName(pleg)
      }

    // ---- combine: counts re-sum (coalescing the empty edge to 0),
    // min/max/sum re-fold; sums cast back to the original result type
    // (lossless when the total fits; overflow behaves as the direct sum)
    val cAggs: Seq[Column] = specs.zipWithIndex.collect {
      case (CountStar, i) =>
        coalesce(sum(col(aliasN(i))), lit(0L)).as(aliasN(i))
      case (CountCol(_), i) =>
        coalesce(sum(col(aliasN(i))), lit(0L)).as(aliasN(i))
      case (MinCol(_), i) => min(col(aliasN(i))).as(aliasN(i))
      case (MaxCol(_), i) => max(col(aliasN(i))).as(aliasN(i))
      case (SumCol(_), i) => sum(col(aliasN(i))).as(aliasN(i))
    }
    val outer =
      if (distinctMode) {
        // distinct values across both legs (a value seen by the manifest
        // AND a scanned file collapses to one row), then — for a
        // count(DISTINCT c) — count the non-null distinct values per group
        val d = distinctOf(combined)
        dcCol match {
          case None => d
          case Some(_) =>
            val dcIdx = legsCols.length - 1
            val cnt = specs.zipWithIndex.collectFirst {
              case (DistinctCount(_), i) =>
                count(col(gAlias(dcIdx))).as(aliasN(i))
            }.get
            if (groupCols.isEmpty) d.agg(cnt)
            else d.groupBy(groupCols.indices.map(j => col(gAlias(j))): _*)
              .agg(cnt)
        }
      }
      else if (groupCols.isEmpty) combined.agg(cAggs.head, cAggs.tail: _*)
      else combined
        .groupBy(groupCols.indices.map(j => col(gAlias(j))): _*)
        .agg(cAggs.head, cAggs.tail: _*)
    val fin = outer.select(aggExprs.zipWithIndex.map { case (ne, i) =>
      val srcName = specs(i) match {
        case GroupKey(c) => gAlias(groupCols.indexOf(c))
        case _ => aliasN(i)
      }
      val c0 = col(srcName)
      val c = if (outer.schema(srcName).dataType == ne.dataType) c0
        else c0.cast(ne.dataType)
      c.as(ne.name)
    }: _*)
    val fplan = fin.queryExecution.analyzed
    // type-identity safety net: parents must see exactly the original types
    if (!fplan.output.zip(aggExprs)
        .forall { case (a, o) => a.dataType == o.dataType }) return None
    MetaAgg.served.incrementAndGet()
    Some(Project(aggExprs.zip(fplan.output).map { case (o, a) =>
      Alias(a, o.name)(exprId = o.exprId)
    }, fplan))
  } catch { case e: Exception =>
    refused(root, "meta-agg", e); None
  }
}
