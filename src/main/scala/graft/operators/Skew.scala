package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling tools for joins whose key distribution is pathological —
  * the 100 TB failure mode where one hot key (a null-ish default, a
  * celebrity user, a template document) lands an entire shuffle partition
  * on one task.
  *
  * Two tiers, matching how production Spark handles skew:
  *  1. AQE's runtime skew-join split (on by default) — splits oversized
  *     partitions of a sort-merge join automatically. PlanAuditSpec proves
  *     it engages on this build's config.
  *  2. Explicit salting ([[saltedJoin]]) for when AQE can't help: the
  *     non-sort-merge shapes, aggregation-into-join pipelines, or a single
  *     key so hot that even a split partition is one task's worth.
  */
object Skew {

  /** Equi-join with the skewed side salted into `salt` sub-keys and the
    * other side replicated `salt`× — the classic salt/replicate rewrite.
    *
    * The salt is `pmod(xxhash64(<every hashable column>), salt)` — a pure
    * function of the ROW, never `monotonically_increasing_id` or rand():
    * a non-deterministic expression inside a shuffle key is the
    * SPARK-23207 failure class, where a map task recomputed after a fetch
    * failure re-salts its rows differently and reducers silently see a row
    * twice or not at all. Spread is uniform for distinct rows regardless
    * of the key distribution, and no row ever changes join partners (the
    * salt only sub-divides the shuffle partition of its key), so the
    * OUTPUT is exactly the plain join's. The one spread caveat: BYTE-
    * IDENTICAL duplicate rows share a salt bucket — a hot key whose volume
    * is all copies of one row stays on one task, the price of a
    * recompute-safe assignment.
    * Cost model: `other` shuffles `salt`× its size; use for a hot FACT
    * side joined to a modest (but non-broadcastable) side. A broadcastable
    * right side should use `broadcast()` instead — salting is the tier
    * between broadcast and AQE.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1 (got $salt)")
    // right/full outer would emit each UNMATCHED `other` row once per salt
    // replica — only join types that never null-extend the replicated side
    // are output-identical to the plain join
    // "cross" is excluded: this is a using-columns equi-join on (key, salt),
    // so a cross request would not produce a cross product anyway — and a
    // true cross join has no key to salt
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed(joinType.toLowerCase.replace("_", "")) ||
      allowed(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types; '$joinType' would " +
        "duplicate unmatched rows of the replicated side")
    // salt inputs come from the plan's OUTPUT ATTRIBUTES, not name lookup:
    // skewed(f.name) would throw AMBIGUOUS_REFERENCE on a post-join frame
    // with duplicate column names, and mis-parse dotted names
    val saltInputs = skewed.queryExecution.analyzed.output
      .filterNot(a => graft.Hashable.unhashable(a.dataType))
      .map(a => org.apache.spark.sql.GraftBridge.column(a))
    // no fallback: if NOTHING is hashable the key column isn't either, so
    // any xxhash64 would fail analysis anyway — state the real contract
    require(saltInputs.nonEmpty,
      "saltedJoin needs at least one hashable (non-map, non-variant) " +
        "column on the skewed side to derive a deterministic salt")
    val s = skewed.withColumn("__salt",
      pmod(xxhash64(saltInputs: _*), lit(salt.toLong)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    s.join(o, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** The DIAGNOSTIC that decides whether the tiers above are needed: the
    * top-`topN` heaviest keys of `keyCol` with their row share and their
    * multiple of the mean key load (`skew_ratio` — the number a salting or
    * AQE decision reads directly: a ratio near 1 means uniform, a ratio of
    * 500 means that key alone is 500 tasks' worth of one).
    *
    * Plan shape: one key-keyed count (map-side partial agg — the shuffle
    * carries one row per distinct key per partition), one 1-row total
    * aggregate broadcast back over the counts, and a TakeOrdered top-N
    * with a total order ((n_rows desc, key asc nulls first) — NULL is a
    * classic hot key and profiles like any other). Cost is one pass at any
    * scale; the result is topN rows. */
  def profile(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1 (got $topN)")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("__total"), 6).as("share"),
        round(col("n_rows").cast("double") * col("__nkeys") / col("__total"), 6)
          .as("skew_ratio"))
      .orderBy(col("n_rows").desc, col("key").asc_nulls_first)
      .limit(topN)
  }

  /** Join-output cardinality forecast — the pre-flight check before an
    * expensive equi-join: per join key, the exact output row count
    * `rows_left · rows_right`, the total, and each key's share. This is
    * the number a capacity/salting decision reads BEFORE launching the
    * join itself: a single key carrying 30% of a trillion-row output is a
    * salting candidate ([[saltedJoin]]); a total far above the input sizes
    * is a modeling bug caught at planning cost, not at job cost.
    *
    * Plan: one partial-aggregated count per side (key-count tables, far
    * smaller than the inputs), a keyed join OF THE COUNT TABLES, a 1-row
    * total broadcast back, and a k-bounded TakeOrdered — the inputs are
    * scanned once each and never joined. NULL keys are excluded (an inner
    * equi-join can never match them). */
  def joinForecast(left: DataFrame, right: DataFrame, keyCol: String,
                   topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1 (got $topN)")
    def keyCounts(df: DataFrame, as: String) =
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as(as))
    val per = keyCounts(left, "rows_left")
      .join(keyCounts(right, "rows_right"), "key")
      .select(col("key"), col("rows_left"), col("rows_right"),
        (col("rows_left") * col("rows_right")).as("out_rows"))
    val total = per.agg(sum(col("out_rows")).as("__total"))
    per.crossJoin(broadcast(total))
      .select(col("key"), col("rows_left"), col("rows_right"),
        col("out_rows"),
        round(col("out_rows").cast("double") / col("__total"), 6).as("share"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topN)
  }
}
