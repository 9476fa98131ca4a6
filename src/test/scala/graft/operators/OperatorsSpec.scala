package graft.operators

import graft.{SparkSpec, Tables}
import graft.cdc.CdcEnvelope
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val env = CdcEnvelope.fromEvents(Tables.events(spark, sfTiny)).cache()

  test("byOperations keeps exactly the requested operation types") {
    val kept = Filters.byOperations(env, Seq("purchase", "view"))
    assert(kept.select("operation").distinct().as[String].collect().toSet
      .subsetOf(Set("purchase", "view")))
    assert(kept.count() ===
      env.filter(col("operation").isin("purchase", "view")).count())
  }

  test("splitInvalidate partitions the stream exactly") {
    val (live, inv) = Filters.splitInvalidate(env, Seq("error"))
    assert(live.count() + inv.count() === env.count())
    assert(inv.filter(col("operation") =!= "error").count() === 0)
  }

  test("dedupLatestByKey keeps the latest event per key") {
    val deduped = Batching.dedupLatestByKey(env, Seq("user_id"))
    assert(deduped.count() === env.select("user_id").distinct().count())
    // every kept row is the max (ts, event_id) of its user
    val latest = env.groupBy("user_id")
      .agg(max(struct(col("cluster_time"), col("event_id"))).as("m"))
      .select(col("user_id").as("u"), col("m.event_id").as("want_id"))
    val bad = deduped.join(latest, col("user_id") === col("u"))
      .filter(col("event_id") =!= col("want_id"))
    assert(bad.count() === 0)
  }

  test("countBatches produces dense batch ids of size <= batchSize") {
    val b = Batching.countBatches(env, 100)
    val sizes = b.groupBy("batch_id").count().orderBy("batch_id").collect()
    assert(sizes.map(_.getLong(1)).sum === env.count())
    sizes.dropRight(1).foreach(r => assert(r.getLong(1) === 100))
    assert(sizes.last.getLong(1) <= 100)
  }

  test("timeWindows covers every event exactly once") {
    val w = Batching.timeWindows(env, "1 hour")
    assert(w.agg(sum("n_events")).as[Long].head() === env.count())
  }

  test("enrichment join broadcasts the dimension side") {
    val dim = Tables.customer(spark, sfTiny)
    val joined = Enrichment.enrich(env, dim, col("user_id") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("interval enrichment == the literal range join; edge semantics exact") {
    import spark.implicits._
    val bands = Seq((0.0, 25.0, "micro"), (25.0, 80.0, "small"),
      (80.0, 460.0, "big"), (470.0, 1e9, "whale")) // [460,470) uncovered
    val events = Tables.events(spark, sfTiny)
    val got = Enrichment.enrichByInterval(events, "value", bands, "band")
      .select(col("event_id"), col("band"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // ground truth: the join form this expression replaces
    val dim = bands.toDF("lo", "hi", "band")
    val want = events.join(dim,
        col("value") >= col("lo") && col("value") < col("hi"), "left")
      .select(col("event_id"), col("band"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === want)
    assert(want.values.flatten.toSet.size >= 3, "fixture should hit bands")
    // [lo, hi) boundaries exactly: lo inclusive, hi exclusive, gap = NULL
    val edges = Seq(0.0, 24.999, 25.0, 459.999, 460.0, 465.0, 470.0, -1.0)
      .toDF("value")
    val labels = Enrichment.enrichByInterval(edges, "value", bands, "b")
      .collect().map(r => Option(r.getString(1))).toSeq
    assert(labels === Seq(Some("micro"), Some("micro"), Some("small"),
      Some("big"), None, None, Some("whale"), None))
    // NULL value → NULL band (left-join semantics)
    val n = Enrichment.enrichByInterval(
        Seq[Option[Double]](None).toDF("value"), "value", bands, "b")
      .head()
    assert(n.isNullAt(1))
    // invariants rejected loudly
    intercept[IllegalArgumentException](Enrichment.enrichByInterval(
      events, "value", Seq((0.0, 10.0, "a"), (5.0, 15.0, "b"))))
    intercept[IllegalArgumentException](Enrichment.enrichByInterval(
      events, "value", Seq((10.0, 10.0, "a"))))
  }

  test("salted join output equals the plain join; shuffle keys carry the salt") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hot key: 5000 rows of key 7, a sprinkle of others
    val skewed = ((1 to 5000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, i.toLong + 10000)))
      .toDF("k", "payload")
    val other = (0 to 10).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = skewed.join(other, Seq("k"), "inner")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    for (salt <- Seq(1, 8)) {
      val salted = Skew.saltedJoin(skewed, other, "k", salt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted === plain, s"salt=$salt changed the join output")
    }
    // the exchange must partition on (k, __salt): the hot key now spreads
    // over `salt` shuffle partitions instead of one
    val df = Skew.saltedJoin(skewed, other, "k", 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column not in the plan:\n$plan")
    // left joins stay output-identical; right/full outer would duplicate
    // unmatched replicated rows and must be rejected up front
    val lo = Skew.saltedJoin(skewed, other, "k", 8, "left_outer")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val loPlain = skewed.join(other, Seq("k"), "left_outer")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(lo === loPlain)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, other, "k", 8, "full_outer")
    }
    // "cross" is rejected too: a using-columns equi-join on (k, salt) can't
    // honor it, so accepting it would silently behave like an inner join
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, other, "k", 8, "cross")
    }
    // the salt must be a pure function of the row: a nondeterministic
    // expression in the shuffle key is the SPARK-23207 recompute hazard.
    // Output comparison can't detect it (the output is salt-invariant by
    // construction), so assert directly that no nondeterministic
    // expression appears anywhere in the salted plan.
    val analyzed = Skew.saltedJoin(skewed, other, "k", 8)
      .queryExecution.analyzed.toString
    for (bad <- Seq("monotonically_increasing_id", "rand(", "uuid("))
      assert(!analyzed.contains(bad),
        s"nondeterministic '$bad' in the salted plan:\n$analyzed")
    // a post-join frame with DUPLICATE column names still salts (inputs
    // resolve from plan attributes, not name lookup)
    val dup = skewed.withColumnRenamed("payload", "note")
      .join(other.withColumn("note", lit("x")), Seq("k"))
    val viaDup = Skew.saltedJoin(dup, other.select(col("k")), "k", 4)
    assert(viaDup.count() === dup.join(other.select(col("k")), Seq("k")).count())
  }

  test("skew profile: exact counts, shares, mean-multiples, NULL as a key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hot key 100 rows, null key 20, eight singletons → 128 rows, 10 keys
    val rows = Seq.fill(100)(Option(7L)) ++ Seq.fill(20)(Option.empty[Long]) ++
      (11L to 18L).map(Option(_))
    val df = rows.toDF("k")
    val prof = Skew.profile(df, "k", topN = 3).collect()
    assert(prof.length === 3)
    // rank 1: the hot key
    assert(prof(0).getLong(1) === 100L && prof(0).getLong(0) === 7L)
    assert(prof(0).getDouble(2) === math.rint(100.0 / 128 * 1e6) / 1e6)
    assert(prof(0).getDouble(3) === math.rint(100.0 * 10 / 128 * 1e6) / 1e6)
    // rank 2: the NULL key profiles like any other (classic hot default)
    assert(prof(1).isNullAt(0) && prof(1).getLong(1) === 20L)
    // rank 3: singleton ties break on the key, ascending
    assert(prof(2).getLong(0) === 11L && prof(2).getLong(1) === 1L)
    // one pass: exactly one aggregate over the data feeds topN rows
    val again = Skew.profile(df, "k", topN = 3).collect().map(_.toSeq).toSeq
    assert(again === prof.map(_.toSeq).toSeq)
  }

  test("asOfJoin matches the naive rank form, including timestamp ties") {
    import spark.implicits._
    // deterministic fixture with same-instant ties on both sides
    val left = Seq(
      (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"), (3L, 10L, 50L, "c"),
      (4L, 20L, 100L, "d"), (5L, 30L, 100L, "e"))
      .toDF("id", "k", "t_raw", "tag")
      .withColumn("t", timestamp_micros(col("t_raw"))).drop("t_raw")
    val right = Seq(
      (101L, 10L, 100L, 1.0), (102L, 10L, 100L, 2.0), // tie at t=100: 102 wins
      (103L, 10L, 150L, 3.0),
      (104L, 20L, 101L, 4.0), // after left t=100: no match for id=4
      (105L, 40L, 1L, 5.0))   // key with no left rows
      .toDF("rid", "k", "t_raw", "score")
      .withColumn("t", timestamp_micros(col("t_raw"))).drop("t_raw")
      .select(col("rid"), col("k"), col("t"),
        col("t").as("m_t"), col("score").as("m_score"), col("rid").as("m_rid"))
    val got = AsOf.asOfJoin(left, "k", "t", right, "k", "t",
      payload = Seq("m_t", "m_score", "m_rid"), tiebreak = "rid")
    // id=1 (t=100): ties at 100 → rid 102; id=2 (t=200): rid 103;
    // id=3 (t=50): none; id=4 (t=100): right is at 101 → none; id=5: none
    val byId = got.collect().map(r =>
      r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("m_rid"))) None
         else Some(r.getLong(r.fieldIndex("m_rid"))))).toMap
    assert(byId === Map(1L -> Some(102L), 2L -> Some(103L), 3L -> None,
      4L -> None, 5L -> None))
    // every left row survives exactly once (left-join contract)
    assert(got.count() === 5)
    // the scalable shape: NO join operator anywhere in the plan — one
    // exchange on the key and a running window over the union
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
  }

  test("asOfJoin null keys/times follow SQL join semantics (null-extend, never match)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), 100L),
      (2L, None, 100L))          // null key: must null-extend, not match other null keys
      .toDF("id", "k", "t_raw")
      .withColumn("t", timestamp_micros(col("t_raw"))).drop("t_raw")
    val right = Seq(
      (101L, Some(10L), Some(50L)),
      (102L, None, Some(40L)),   // null key: can never be a match partner
      (103L, Some(10L), None))   // null time: t <= T is never true
      .toDF("rid", "k", "t_raw")
      .withColumn("t", timestamp_micros(col("t_raw"))).drop("t_raw")
      .select(col("rid"), col("k"), col("t"), col("rid").as("m_rid"))
    val got = AsOf.asOfJoin(left, "k", "t", right, "k", "t",
      payload = Seq("m_rid"), tiebreak = "rid")
    val byId = got.collect().map(r =>
      r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("m_rid"))) None
         else Some(r.getLong(r.fieldIndex("m_rid"))))).toMap
    // id=1 matches rid=101 (the only non-null, preceding right row);
    // the null-time rid=103 must NOT win despite nulls-first sorting.
    // id=2 (null key) survives null-extended — NOT paired with rid=102.
    assert(byId === Map(1L -> Some(101L), 2L -> None))
    assert(got.count() === 2)
  }

  test("rangeJoin equals the inequality join and plans a hash join, not BNLJ") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (i.toLong, i.toLong % 7, lo, lo + rnd.nextInt(5000).toLong)
    }.toDF("iid", "k", "lo_raw", "hi_raw")
      .withColumn("lo", timestamp_micros(col("lo_raw")))
      .withColumn("hi", timestamp_micros(col("hi_raw")))
      .drop("lo_raw", "hi_raw")
    val points = (1 to 2000).map { j =>
      (j.toLong, j.toLong % 7, rnd.nextInt(110000).toLong)
    }.toDF("pid", "pk", "pt_raw")
      .withColumn("pt", timestamp_micros(col("pt_raw"))).drop("pt_raw")
    val got = AsOf.rangeJoin(intervals, "lo", "hi", points, "pt",
      keys = Seq("k" -> "pk"), bucketWidth = lit(2048L))
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    val want = intervals.join(points,
        col("k") === col("pk") && col("pt").between(col("lo"), col("hi")))
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(want.nonEmpty, "fixture produced no in-range pairs")
    val plan = AsOf.rangeJoin(intervals, "lo", "hi", points, "pt",
        keys = Seq("k" -> "pk"), bucketWidth = lit(2048L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // make the thresholds reachable at test scale: any partition over
      // 64 KB and 1x the median is "skewed"; SMJ forced (no broadcast)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val skewed = spark.range(200000)
        .select((col("id") % 1000).as("k"), col("id").as("payload"))
        .withColumn("k", when(col("payload") % 2 === 0, 7L).otherwise(col("k")))
      val other = spark.range(2000)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = skewed.join(other, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("approximate aggregates stay inside their error bounds") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfTiny)
    val both = li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_approx"),
        expr("percentile(l_quantity, 0.5)").as("p50_exact"),
        count(lit(1)).as("n"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"HLL rsd=0.02 estimate off by ${relErr * 100}% for ${r.get(0)}")
      // percentile_approx rank error <= n/accuracy; quantity is a small
      // integer domain, so p50 lands within one unit of exact
      assert(math.abs(r.getAs[Double]("p50_approx") -
        r.getAs[Double]("p50_exact")) <= 1.0)
    }
  }

  test("mergeable KLL: merged daily sketches answer range quantiles within rank epsilon") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("agg_kll_mergeable")(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    // KLL's contract is a RANK guarantee (~1.65% at k=200; compaction is
    // randomized, so value equality can NEVER be asserted): the exact rank
    // of each estimate must sit within epsilon of the asked quantile
    val ev = graft.Tables.events(spark, sfTiny)
      .select(col("value"), to_date(date_trunc("week", col("ts"))).as("week"))
    val weekVals = ev.collect()
      .groupBy(_.getDate(1).toString).view
      .mapValues(_.map(_.getDouble(0)).sorted).toMap
    out.foreach { r =>
      val vals = weekVals(r.getDate(0).toString)
      def rankOf(v: Double): Double =
        vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(r.getAs[Double]("approx_p50")) - 0.5) <= 0.05,
        s"p50 rank off for week ${r.get(0)}")
      assert(rankOf(r.getAs[Double]("approx_p99")) >= 0.94,
        s"p99 rank off for week ${r.get(0)}")
    }
    // mergeability across an arbitrary range: union the per-week sketches
    // into a whole-feed quantile and gate its rank the same way
    val allVals = weekVals.values.flatten.toArray.sorted
    val global = ev.groupBy(col("week"))
      .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
      .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)")
        .as("p50"))
      .head().getDouble(0)
    val gRank = allVals.count(_ <= global).toDouble / allVals.length
    assert(math.abs(gRank - 0.5) <= 0.05, s"global merged p50 rank $gRank")
  }

  test("mergeable HLL: union of daily sketches == one-shot sketch, bounded error") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("agg_hll_mergeable")(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"merged-HLL estimate off by ${relErr * 100}% for week ${r.get(0)}")
    }
    // lossless mergeability: unioning the daily sketches estimates exactly
    // what one sketch over the whole week estimates (same lgK)
    val ev = graft.Tables.events(spark, sfTiny)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week")) // year-unambiguous
    val merged = ev.groupBy(col("week"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val oneShot = ev.groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val o = oneShot.collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    assert(m === o, "sketch union is not lossless vs the one-shot sketch")
  }

  test("mergeable CMS: merged dailies bit-identical to one-shot, one-sided bound") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("agg_cms_mergeable")(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sfTiny)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val weekTotals = ev.groupBy("week").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_n")
      val exact = r.getAs[Long]("exact_n")
      // the CMS one-sided contract: never below truth, above it by at
      // most eps*N (eps=0.001; N = the week's event count)
      assert(approx >= exact,
        s"CMS underestimated ${r.get(1)} in week ${r.get(0)}: $approx < $exact")
      val n = weekTotals(r.getDate(0).toString)
      assert(approx <= exact + math.ceil(0.001 * n).toLong,
        s"CMS over eps*N bound for ${r.get(1)} in week ${r.get(0)}")
    }
    // lossless mergeability: the merged daily sketches are BYTE-identical
    // to the one-shot weekly sketch (cell-wise counter sums commute;
    // same eps/confidence/seed => same hash functions and layout)
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
    val merged = daily.groupBy(col("week"))
      .agg(graft.functions.Sketches.cmsMerge(col("sk")).as("sk"))
    val oneShot = ev.groupBy(col("week"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
    val m = merged.collect()
      .map(r => r.getDate(0).toString -> r.getAs[Array[Byte]](1).toSeq).toMap
    val o = oneShot.collect()
      .map(r => r.getDate(0).toString -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(m === o, "CMS merge is not lossless vs the one-shot sketch")
    // incompatible shapes (different eps => different width) fail loudly
    // instead of silently mixing hash spaces
    val s1 = ev.agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
    val s2 = ev.agg(expr("count_min_sketch(event_type, 0.01d, 0.99d, 42)").as("sk"))
    val err = intercept[Exception] {
      s1.union(s2).agg(graft.functions.Sketches.cmsMerge(col("sk"))).collect()
    }
    def messages(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(e =>
      Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.toLowerCase.contains("merge")),
      s"unclear incompatible-merge error: $err")
    // an empty group yields NULL (the SQL aggregate convention), and a
    // NULL input row is skipped rather than poisoning the merge
    val empty = ev.filter(lit(false))
      .agg(graft.functions.Sketches.cmsMerge(col("event_type").cast("binary")))
      .head()
    assert(empty.isNullAt(0), "empty-group CMS merge should be NULL")
    val withNull = daily.select(col("sk"))
      .union(spark.sql("SELECT CAST(NULL AS BINARY)"))
      .agg(graft.functions.Sketches.cmsMerge(col("sk")).as("sk")).head()
    assert(!withNull.isNullAt(0), "NULL sketch row should be skipped")
  }

  test("topKPerGroup equals the window row_number form exactly") {
    val orders = Tables.orders(spark, sfTiny)
    val viaHeap = TopK.topKPerGroup(orders,
      groupCols = Seq("o_custkey"),
      ordCols = Seq(col("o_totalprice"), (-col("o_orderkey")).as("__tb")),
      payload = Seq(col("o_orderkey")), k = 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_custkey"), row_number().over(w).as("rank"),
        col("o_orderkey"), col("o_totalprice"))
      .filter(col("rank") <= 3)
    assert(viaHeap.count() === viaWindow.count())
    assert(viaHeap.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaHeap).count() === 0)
  }

  test("topKPerGroup emits at most k ranks, dense from 1, per group") {
    val out = TopK.topKPerGroup(Tables.orders(spark, sfTiny),
      groupCols = Seq("o_custkey"),
      ordCols = Seq(col("o_totalprice"), (-col("o_orderkey")).as("__tb")),
      payload = Seq(col("o_orderkey")), k = 2)
    val perGroup = out.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"), min("rank").as("minr"))
      .collect()
    perGroup.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n <= 2 && r.getAs[Int]("minr") === 1 &&
        r.getAs[Int]("maxr").toLong === n)
    }
  }

  test("partition key strategies expose the reference layouts") {
    assert(KeyStrategy.HivePartitioned.partitionColumns ===
      Seq("collection", "year", "month", "day", "hour"))
    assert(KeyStrategy.DatePartitioned.partitionColumns ===
      Seq("collection", "year", "month", "day"))
    assert(KeyStrategy.CollectionBased.partitionColumns === Seq("collection"))
    assert(KeyStrategy.Flat.partitionColumns.isEmpty)
    val keyed = PartitionKeys.withTimeColumns(env)
    val r = keyed.select("cluster_time", "year", "month", "day", "hour").head()
    val ts = r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC)
    assert(r.getInt(1) === ts.getYear)
    assert(r.getInt(2) === ts.getMonthValue)
    assert(r.getInt(3) === ts.getDayOfMonth)
    assert(r.getInt(4) === ts.getHour)
  }

  test("countBatches keeps NULL-timestamp rows, ordered first like the naive form") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0), (2L, new java.sql.Timestamp(t0.getTime + 60000)),
      (3L, null.asInstanceOf[java.sql.Timestamp]),
      (4L, null.asInstanceOf[java.sql.Timestamp]),
      (5L, new java.sql.Timestamp(t0.getTime + 120000)))
      .toDF("event_id", "cluster_time")
    val batched = Batching.countBatches(rows, batchSize = 2)
    assert(batched.count() === 5, "null-timestamp rows vanished")
    val byId = batched.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("batch_id")).toMap
    // nulls first (the naive global row_number's ascending order), so the
    // two null rows fill batch 0 and the timestamped rows follow
    assert(byId(3L) === 0L && byId(4L) === 0L)
    assert(byId(1L) === 1L && byId(2L) === 1L && byId(5L) === 2L)
  }

  test("splitInvalidate routes NULL operations to the live side, losing nothing") {
    import spark.implicits._
    val rows = Seq((1L, "insert"), (2L, null.asInstanceOf[String]),
      (3L, "error")).toDF("event_id", "operation")
    val (live, inv) = Filters.splitInvalidate(rows, Seq("error"))
    assert(live.count() + inv.count() === 3, "split lost rows")
    assert(live.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(inv.select("event_id").collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("rangeJoin refuses a zero-cast bucket width instead of returning empty") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val intervals = Seq((1L, t0, new java.sql.Timestamp(t0.getTime + 60000)))
      .toDF("k", "lo", "hi")
    val points = Seq((1L, new java.sql.Timestamp(t0.getTime + 1000)))
      .toDF("k", "pt")
    val e = intercept[Exception] {
      AsOf.rangeJoin(intervals, "lo", "hi", points, "pt",
        Seq(("k", "k")), lit(0.5)).count() // casts to width 0
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bucketWidth")), s"unclear error: $e")
  }

  test("asOfJoin rejects dotted and reserved column names up front") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val left = Seq((1L, t0)).toDF("k", "t")
    val dotted = Seq((1L, t0, 1.0)).toDF("k", "t", "a.b")
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, "k", "t", dotted, "k", "t",
        payload = Seq("a.b"), tiebreak = "k")
    }
    val reserved = Seq((1L, t0, 1.0)).toDF("k", "t", "__rt")
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, "k", "t", reserved, "k", "t",
        payload = Seq("__rt"), tiebreak = "k")
    }
  }

  test("joinForecast: exact per-key output sizes, forecast == real join size") {
    import spark.implicits._
    val left = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(3L), None)
      .toDF("k")
    val right = Seq(Some(1L), Some(1L), Some(2L), Some(2L), Some(4L), None)
      .toDF("k")
    val got = Skew.joinForecast(left, right, "k")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // key 1: 3×2=6; key 2: 1×2=2; keys 3/4 unmatched; NULLs never match
    assert(got === Map(
      1L -> ((3L, 2L, 6L, 0.75)),
      2L -> ((1L, 2L, 2L, 0.25))))
    // the forecast total must equal the REAL inner-join row count
    val real = left.join(right, "k").count()
    assert(got.values.map(_._3).sum === real)
  }

  test("joinForecast topN is a bounded TakeOrdered with a total order") {
    import spark.implicits._
    val left = (1L to 100L).flatMap(k => Seq.fill(k.toInt % 7 + 1)(k)).toDF("k")
    val df = Skew.joinForecast(left, left, "k", topN = 5)
    assert(df.count() === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must be k-bounded, not a global sort:\n$plan")
    // ties on out_rows break on key: the cut is deterministic across runs
    val keys = df.collect().map(_.getLong(0)).toSeq
    assert(keys === Skew.joinForecast(left, left, "k", topN = 5)
      .collect().map(_.getLong(0)).toSeq)
    // heaviest first: out_rows non-increasing
    val sizes = df.collect().map(_.getLong(3)).toSeq
    assert(sizes === sizes.sortBy(-_))
  }
}
