package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.sources.BloomIndex

/** Bloom-pruned star joins as an OPTIMIZER rule — the ergonomics tier on
  * top of [[graft.sources.BloomIndex.prunedJoin]], the same move
  * [[SummaryViews]] made for `IncrementalAgg`: `prunedJoin` only helps
  * callers who KNOW the index exists; with this rule installed, a plain
  * `fact.join(dim, fact("k") === dim("k"))` — including `spark.sql` from
  * users who never heard of the manifest — routes the fact scan through
  * the per-file Bloom probe and reads only the files that can hold a
  * matching key. At 100 TB this is the star-join point-lookup shape: a
  * dimension filtered to thousands of keys touches a sliver of the fact
  * layout's files, and scan cost follows the sliver. LITERAL point
  * lookups get the same treatment: a plain `WHERE key IN (…)` /
  * `key = lit` over a registered layout (any top-level conjunct that
  * pins the indexed column to literals, including the optimizer's InSet
  * form) swaps the scan for the candidate files while the Filter stays
  * above it — `BloomIndex.prunedRead` ergonomics for users who only
  * speak SQL. RANGE predicates get the zone-map analog: register a
  * zone-mapped layout ([[registerZone]]) and a plain
  * `WHERE col BETWEEN …` / `col >= lit` (any top-level range or
  * equality conjunct on the zoned column; open-ended bounds allowed)
  * swaps the scan for the files whose min/max zone intersects —
  * `ZoneMap.prunedRead` ergonomics, same exactness argument (the
  * Filter stays above; strict bounds probe the closed interval, a
  * sound superset). Multiple pinned conjuncts/columns INTERSECT their
  * candidate sets.
  *
  * Scope is deliberately TIGHT — the rule REFUSES (leaves the plan
  * untouched) unless every condition holds:
  *
  *  - INNER or LEFT-SEMI equi-join (the latter is how `k IN (SELECT …)`
  *    plans) on exactly ONE key pair, both sides bare column references
  *    (composite or expression conditions refuse); ANTI joins never
  *    prune — they keep exactly the rows a pruned scan would drop;
  *  - the fact side unwraps through attribute/rename Projects and
  *    Filters to a parquet scan of a REGISTERED layout ([[register]]),
  *    and the join key resolves — through any renames — to that
  *    layout's indexed column;
  *  - the dim side is fully DETERMINISTIC (it is executed once at
  *    optimization time to collect its distinct keys and again at run
  *    time inside the join — a non-deterministic dim could produce
  *    different keys and turn Bloom's false-negative-freedom into real
  *    false negatives);
  *  - the dim's distinct-key count fits the layout's `maxKeys` cap
  *    (hashes-only collect, 8 bytes/key; past that width file skipping
  *    degenerates toward a full scan and the plain join is the honest
  *    plan).
  *
  * Exactness: candidate files are a SUPERSET of every file holding a
  * matching key (Bloom filters have no false negatives); the join itself
  * discards false-positive files' rows, and fact-side Filters stay in
  * place above the swapped scan. The fact scan's output is re-aliased
  * under the ORIGINAL attribute ids, so parents never see the
  * substitution. An empty dim prunes to an empty fact scan — the join's
  * exact answer.
  *
  * Cost & staleness: firing costs two driver-visible jobs at
  * optimization time (the dim distinct-key collect and the files-sized
  * manifest probe) — the price `prunedJoin` callers already pay, moved
  * into planning. The manifest answers AS OF the probe; maintain it with
  * the write path ([[graft.sources.BloomIndex.update]] /
  * [[graft.sources.Compaction]]) exactly as `prunedJoin` requires.
  */
object BloomJoins {

  /** A bloom-indexed fact layout opted into automatic join pruning.
    * `factPath` must carry a `_bloomindex` manifest on `col`. */
  final case class Layout(factPath: String, col: String,
                          maxKeys: Int = 100000)

  /** A zone-mapped fact layout opted into automatic range-scan pruning.
    * `factPath` must carry a `_zonemap` manifest on `col`. */
  final case class ZoneLayout(factPath: String, col: String)

  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, Layout]()
  private val zones =
    new java.util.concurrent.ConcurrentHashMap[String, List[ZoneLayout]]()

  private def norm(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  def register(l: Layout): Unit = layouts.put(norm(l.factPath), l)
  def unregister(factPath: String): Unit = layouts.remove(norm(factPath))
  def registerZone(l: ZoneLayout): Unit =
    zones.compute(norm(l.factPath), (_, cur) =>
      Option(cur).getOrElse(Nil).filterNot(_.col == l.col) :+ l)
  def unregisterZone(factPath: String): Unit = zones.remove(norm(factPath))
  def clear(): Unit = { layouts.clear(); zones.clear() }
  def isEmpty: Boolean = layouts.isEmpty && zones.isEmpty

  private[plans] def forPaths(paths: Seq[String]): Option[Layout] =
    paths.map(norm).flatMap(p => Option(layouts.get(p))).headOption

  private[plans] def zonesForPaths(paths: Seq[String]): Seq[ZoneLayout] =
    paths.map(norm).flatMap(p => Option(zones.get(p)).getOrElse(Nil))

  /** Install on an existing session (the extensions hook only runs at
    * construction). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RewriteToBloomPrunedJoin]))
      spark.experimental.extraOptimizations =
        cur :+ RewriteToBloomPrunedJoin(spark)
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[RewriteToBloomPrunedJoin])
}

/** The rewrite rule. Runs in the user-provided-optimizer batch; the
  * guarded pattern is `Join(Inner, …, EqualTo(factKey, dimKey))` with the
  * fact side landing on a registered parquet layout. */
final case class RewriteToBloomPrunedJoin(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import BloomJoins._

  /** Collecting the dim keys executes a query WHILE this rule is running;
    * that inner query's optimization must not re-enter the rule (a dim
    * containing its own prunable join is served un-pruned — conservative
    * and terminating). */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (BloomJoins.isEmpty || inRule.get()) plan
    else {
      inRule.set(true)
      try plan.transformUp {
        case j @ Join(left, right, Inner,
            Some(EqualTo(a: AttributeReference, b: AttributeReference)),
            hint) =>
          // either side may be the fact, and the equality may be written
          // in either order — try all orientations, first success wins
          tryPrune(j, left, right, a, b)
            .orElse(tryPrune(j, left, right, b, a))
            .orElse(tryPrune(j, right, left, b, a))
            .orElse(tryPrune(j, right, left, a, b))
            .getOrElse(j)
        case j @ Join(left, right, LeftSemi,
            Some(EqualTo(a: AttributeReference, b: AttributeReference)),
            hint) =>
          // the `k IN (SELECT …)` plan shape: semi output = matching fact
          // rows only, so the candidate-superset swap stays exact. The
          // fact is ALWAYS the left side; anti joins must never prune
          // (they keep exactly the rows a pruned scan would drop).
          tryPrune(j, left, right, a, b)
            .orElse(tryPrune(j, left, right, b, a))
            .getOrElse(j)
        case fl @ Filter(cond, rel: LogicalRelation) =>
          // LITERAL point lookups — `key IN (…)` / `key = lit` spelled as
          // plain SQL over a registered layout: a top-level conjunct that
          // pins the indexed column to literals bounds the matching rows
          // to the files whose filters fire; the Filter itself stays
          // above the swapped scan, so false positives are re-filtered
          // exactly. OR-branches never prune (only top-level conjuncts
          // are inspected). Range conjuncts route through the zone-map
          // registry the same way.
          tryPruneScan(fl, cond, rel)
            .orElse(tryPruneZoneScan(fl, cond, rel))
            .getOrElse(fl)
      } finally inRule.set(false)
    }

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  /** Literal values a top-level conjunct pins `key` to — the smallest
    * such list (any pinning conjunct yields a sound candidate superset).
    * NULL literals are dropped: `key = NULL` / `IN (…, NULL)` never
    * match rows, so they need no candidate files. */
  private def pinnedValues(cond: Expression,
                           key: AttributeReference): Option[Seq[Any]] = {
    val toScala = CatalystTypeConverters.createToScalaConverter(key.dataType)
    val lists = conjunctsOf(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some(Seq(l.value))
      case EqualTo(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some(Seq(l.value))
      case In(a: AttributeReference, vs)
          if a.exprId == key.exprId &&
            vs.forall(_.isInstanceOf[Literal]) =>
        Some(vs.map(_.asInstanceOf[Literal].value))
      case InSet(a: AttributeReference, hset)
          if a.exprId == key.exprId => Some(hset.toSeq)
      case _ => None
    }
    if (lists.isEmpty) None
    else Some(lists.minBy(_.length)
      .filter(_ != null).map(toScala))
  }

  /** Swap a registered relation under a literal-pinned Filter for the
    * candidate-files scan; None refuses (unregistered, no pinning
    * conjunct, list wider than maxKeys, probe failure). */
  private def tryPruneScan(fl: Filter, cond: Expression,
                           rel: LogicalRelation): Option[LogicalPlan] = {
    val layout = rel.relation match {
      case fs: HadoopFsRelation =>
        forPaths(fs.location.rootPaths.map(_.toString))
      case _ => None
    }
    layout.flatMap { l =>
      rel.output.find(a => a.name == l.col).flatMap { key =>
        pinnedValues(cond, key).flatMap { values =>
          if (values.length > l.maxKeys) None
          else if (values.isEmpty)
            // every pinned literal was NULL: no row can match
            Some(fl.copy(child = LocalRelation(rel.output)))
          else try {
            val files = BloomIndex.candidateFiles(
              spark, l.factPath, l.col, values)
            swappedScan(rel, files).map(s => fl.copy(child = s))
          } catch { case _: Exception => None }
        }
      }
    }
  }

  /** Swap the registered relation under `factSide` for a candidate-files
    * scan driven by `dimSide`'s distinct keys; None refuses. */
  private def tryPrune(join: Join, factSide: LogicalPlan,
                       dimSide: LogicalPlan,
                       factKey: AttributeReference,
                       dimKey: AttributeReference): Option[LogicalPlan] = {
    if (!factSide.outputSet.contains(factKey) ||
        !dimSide.outputSet.contains(dimKey) ||
        !deterministic(dimSide)) None
    else rewriteFact(factSide, factKey, dimSide, dimKey).map { newFact =>
      if (factSide eq join.left) join.copy(left = newFact)
      else join.copy(right = newFact)
    }
  }

  private def deterministic(plan: LogicalPlan): Boolean =
    !plan.exists(p => p.expressions.exists(!_.deterministic))

  /** Unwrap attribute/rename Projects and Filters down to the registered
    * relation, rebuild the same stack over the pruned scan. The join key
    * is tracked THROUGH renames (`Alias(attr, name)` projections the
    * optimizer interposes), so the registry check compares the
    * RELATION-level column name. */
  private def rewriteFact(plan: LogicalPlan, factKey: AttributeReference,
                          dimSide: LogicalPlan, dimKey: AttributeReference)
      : Option[LogicalPlan] = plan match {
    case p @ Project(exprs, child)
        if exprs.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        } =>
      val childKey = exprs.collectFirst {
        case al @ Alias(c: AttributeReference, _)
            if al.exprId == factKey.exprId => c
        case a: AttributeReference if a.exprId == factKey.exprId => a
      }
      childKey.flatMap(ck => rewriteFact(child, ck, dimSide, dimKey))
        .map(c => p.copy(child = c))
    case f @ Filter(_, child) =>
      rewriteFact(child, factKey, dimSide, dimKey)
        .map(c => f.copy(child = c))
    case rel: LogicalRelation =>
      val layout = rel.relation match {
        case fs: HadoopFsRelation =>
          forPaths(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
      layout match {
        case Some(l)
            if factKey.name == l.col &&
              rel.output.exists(_.exprId == factKey.exprId) =>
          prunedScan(rel, l, dimSide, dimKey)
        case _ => None
      }
    case _ => None
  }

  /** The pruned replacement for `rel`: probe the manifest with the dim's
    * distinct key hashes, scan only firing files, re-alias to `rel`'s
    * original output ids. */
  private def prunedScan(rel: LogicalRelation, layout: Layout,
                         dimSide: LogicalPlan, dimKey: AttributeReference)
      : Option[LogicalPlan] = {
    try {
      val dimDf = GraftBridge.ofRows(spark, dimSide)
      val hashes = dimDf.filter(col(dimKey.name).isNotNull)
        .select(col(dimKey.name).cast("string").as("__k"))
        .distinct().limit(layout.maxKeys + 1)
        .select(xxhash64(col("__k")).as("h"))
        .collect().map(_.getLong(0))
      if (hashes.length > layout.maxKeys) None // too wide: plain join wins
      else if (hashes.isEmpty)
        // no live dim keys: the inner join is empty — exact
        Some(LocalRelation(rel.output))
      else swappedScan(rel,
        BloomIndex.candidateFilesForHashes(
          spark, layout.factPath, layout.col, hashes))
    } catch { case _: Exception => None } // probe failed: refuse, not crash
  }

  /** (lo, hi) interval bounds a top-level conjunct pins `key` into —
    * None = open on that side. Strict bounds map to the closed interval
    * (a sound candidate superset; the Filter above is exact). NULL
    * literals never match a range comparison and are skipped. */
  private def rangeBounds(cond: Expression, key: AttributeReference)
      : Seq[(Option[Any], Option[Any])] = {
    val toScala = CatalystTypeConverters.createToScalaConverter(key.dataType)
    def v(l: Literal): Any = toScala(l.value)
    conjunctsOf(cond).flatMap {
      case _ @ (GreaterThan(_, Literal(null, _)) |
                LessThan(_, Literal(null, _)) |
                GreaterThanOrEqual(_, Literal(null, _)) |
                LessThanOrEqual(_, Literal(null, _)) |
                EqualTo(_, Literal(null, _))) => None
      case GreaterThan(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some((Some(v(l)), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some((Some(v(l)), None))
      case LessThan(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some((None, Some(v(l))))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some((None, Some(v(l))))
      case GreaterThan(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some((None, Some(v(l))))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some((None, Some(v(l))))
      case LessThan(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some((Some(v(l)), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some((Some(v(l)), None))
      case EqualTo(a: AttributeReference, l: Literal)
          if a.exprId == key.exprId => Some((Some(v(l)), Some(v(l))))
      case EqualTo(l: Literal, a: AttributeReference)
          if a.exprId == key.exprId => Some((Some(v(l)), Some(v(l))))
      case _ => None
    }
  }

  /** Swap a zone-registered relation under a range-pinned Filter for the
    * zone-intersecting files; multiple pinned conjuncts/columns
    * INTERSECT their candidate sets. None refuses. */
  private def tryPruneZoneScan(fl: Filter, cond: Expression,
                               rel: LogicalRelation): Option[LogicalPlan] = {
    val zls = rel.relation match {
      case fs: HadoopFsRelation =>
        zonesForPaths(fs.location.rootPaths.map(_.toString))
      case _ => Nil
    }
    if (zls.isEmpty) None
    else try {
      val sets = for {
        zl <- zls
        key <- rel.output.find(_.name == zl.col).toSeq
        (lo, hi) <- rangeBounds(cond, key)
      } yield graft.sources.ZoneMap.candidateFilesBounded(
        spark, zl.factPath, zl.col, lo, hi).toSet
      if (sets.isEmpty) None
      else swappedScan(rel, sets.reduce(_ intersect _).toSeq.sorted)
        .map(s => fl.copy(child = s))
    } catch { case _: Exception => None } // probe failed: refuse, not crash
  }

  /** A scan of exactly `files`, re-aliased under `rel`'s original output
    * ids (parents never see the substitution); empty file list collapses
    * to an exact empty LocalRelation. */
  private def swappedScan(rel: LogicalRelation,
                          files: Seq[String]): Option[LogicalPlan] = {
    if (files.isEmpty) Some(LocalRelation(rel.output))
    else {
      val scan = graft.sources.Manifests
        .batchedRead(spark, files.iterator)
        .get.queryExecution.analyzed
      val byName = scan.output.map(a => a.name -> a).toMap
      // every original column must exist in the pruned scan (same
      // files, same schema) — refuse on any surprise
      if (!rel.output.forall(o => byName.contains(o.name))) None
      else {
        val restored: Seq[NamedExpression] = rel.output.map(o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId))
        Some(Project(restored, scan))
      }
    }
  }
}
