package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  // (id, qty, flag) with one NULL qty, one NULL flag, one duplicate id,
  // qty 99 out of [1,10], flag "X" outside {A,B}
  private lazy val dirty = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 2.0, "A"), (2L, 5.0, "B"), (2L, 7.0, "A"), (3L, null, "B"),
    (4L, 99.0, null), (5L, 3.0, "X"), (null, 4.0, "A")
  ).toDF("id", "qty", "flag")

  test("profile: nulls, native-typed min/max, exact distinct, decimal avg") {
    val p = Quality.profile(dirty, Seq("id", "qty", "flag"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = p("id")
    assert(id.getLong(1) === 7)              // n_rows
    assert(id.getLong(2) === 1)              // n_nulls
    assert(id.getLong(4) === 5)              // n_distinct (NULL not counted)
    assert(id.getString(5) === "1" && id.getString(6) === "5")

    val qty = p("qty")
    assert(qty.getLong(2) === 1)
    // min/max on the NATIVE type: numerically 2.0 < 99.0 even though the
    // strings "2.0" > "99.0" lexicographically — the profiler must compare
    // before casting to the uniform output type
    assert(qty.getString(5) === "2.0" && qty.getString(6) === "99.0")
    // decimal-routed mean of the 6 non-null values, exact
    assert(math.abs(qty.getDouble(7) - (2 + 5 + 7 + 99 + 3 + 4) / 6.0) < 1e-9)

    val flag = p("flag")
    assert(flag.getLong(2) === 1)
    assert(flag.getLong(4) === 3)
    assert(flag.isNullAt(7), "non-numeric column must have NULL avg")
    assert(math.abs(flag.getDouble(3) - 1.0 / 7) < 1e-6) // null_frac
  }

  test("profile plan: exact = 2 pruned scans, no sort-agg; approx = 1 scan") {
    val li = Tables.lineitem(spark, sfTiny)
    // exact mode: stats pass + narrow distinct pass — and NEVER the
    // multi-countDistinct expand that sort-aggregates n·k expanded rows
    val exactPlan = Quality.profile(li,
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(exactPlan).length === 2, exactPlan)
    assert(!exactPlan.contains("Expand"),
      s"multi-distinct expand fallback crept back in:\n$exactPlan")
    // approx mode: everything folds into one aggregate over one scan
    val approxPlan = Quality.profile(li,
      Seq("l_orderkey", "l_quantity", "l_returnflag"), exact = false)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(approxPlan).length === 1, approxPlan)
    assert(!approxPlan.contains("Join"), "approx profiler must never join")
  }

  test("profile approx mode: HLL distinct lands within 5% of exact") {
    val li = Tables.lineitem(spark, sfTiny)
    val exact = Quality.profile(li, Seq("l_orderkey"))
      .select("n_distinct").as[Long].head()
    // rsd 0.02 → 2σ ≈ 4%; the default-rsd sketch was measured at 6.4% on
    // this fixture, a legitimate ~1.3σ draw — the knob, not luck, buys
    // the bound
    val approx = Quality.profile(li, Seq("l_orderkey"), exact = false,
        rsd = 0.02)
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("runChecks counts each violation class exactly") {
    import Quality._
    val parent = Seq(1L, 2L, 3L, 5L).toDF("pid")
    val got = Quality.runChecks(dirty, Seq(
        NotNull("id"), NotNull("qty"),
        InRange("qty", 1, 10),
        AcceptedValues("flag", Seq("A", "B")),
        Unique(Seq("id")),
        ForeignKey("id", parent, "pid")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got("not_null:id") === ((1L, "fail")))
    assert(got("not_null:qty") === ((1L, "fail")))
    assert(got("range:qty[1.0,10.0]") === ((1L, "fail")))      // the 99
    assert(got("accepted:flag{A,B}") === ((1L, "fail")))       // the X
    assert(got("unique:id") === ((1L, "fail")))                // one extra 2
    // id=4 has no parent; NULL id does not violate FK
    assert(got("fk:id") === ((1L, "fail")))
  }

  test("runChecks: all-pass table reports pass everywhere") {
    import Quality._
    val clean = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val got = Quality.runChecks(clean,
      Seq(NotNull("id"), InRange("v", 0, 10), Unique(Seq("id"))))
    assert(got.filter(col("status") =!= "pass").count() === 0)
  }

  test("runChecks on an EMPTY input: every check reads 0/'pass', never NULL") {
    import Quality._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val parent = Seq(1L).toDF("pid")
    val got = Quality.runChecks(empty, Seq(
        NotNull("id"), InRange("v", 0, 10), AcceptedValues("id", Seq("1")),
        Unique(Seq("id")), ForeignKey("id", parent, "pid")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got.size === 5)
    got.foreach { case (name, (violations, status)) =>
      assert(violations === 0L && status === "pass",
        s"$name on empty input: ($violations, $status)")
    }
  }

  test("correlations: matches built-in corr, one pass, pairwise-null exact") {
    val li = Tables.lineitem(spark, sfTiny)
    val got = Quality.correlations(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // cross-check every pair against Spark's built-in corr (a different
    // code path: double-folded co-moment accumulators)
    got.foreach { case ((a, b), (n, c)) =>
      val want = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(c - want) < 1e-6, s"($a,$b): $c vs $want")
      assert(n === li.count())
    }
    // perfectly correlated / anti-correlated columns hit ±1 exactly
    val lin = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("x", "y", "z")
    val c2 = Quality.correlations(lin, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(c2(("x", "y")) === 1.0 && c2(("x", "z")) === -1.0)
    // pairwise null exclusion: the NULL row drops only from pairs using y
    val withNull = Seq((1.0, Some(2.0), 3.0), (2.0, None, 5.0),
      (3.0, Some(6.0), 7.0)).toDF("x", "y", "z")
    val c3 = Quality.correlations(withNull, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(c3(("x", "y")) === 2 && c3(("x", "z")) === 3)
    // all moments fold into one aggregate over one scan
    val plan = Quality.correlations(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length === 1, plan)
  }

  test("driftPsi: identical tables read 0; a shift reads large; NULL-rate change counts") {
    import spark.implicits._
    val ref = (1 to 1000).map(i => (i.toDouble % 100, i.toLong)).toDF("x", "y")
    // same distribution → psi == 0 exactly (every bucket proportion equal)
    val same = Quality.driftPsi(ref, ref, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(same("x") === 0.0 && same("y") === 0.0)
    // a hard location shift → most mass in the clamp bucket → large PSI
    val shifted = ref.select((col("x") + 1000).as("x"), col("y"))
    val drift = Quality.driftPsi(ref, shifted, Seq("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drift("x") > 0.25, s"hard shift must read major drift: $drift")
    // null-rate change is drift too (NULLs bucket separately)
    val nulled = ref.select(
      when(col("y") % 2 === 0, col("x")).as("x"), col("y"))
    val nd = Quality.driftPsi(ref, nulled, Seq("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(nd("x") > 0.25, s"50% null-rate change must read major drift: $nd")
    // constant reference column: everything buckets to 0, no crash
    val const = ref.select(lit(5.0).as("x"), col("y"))
    val cd = Quality.driftPsi(const, const, Seq("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cd("x") === 0.0)
  }

  test("driftPsi plan: one min/max pass + melted count aggregates, no row joins") {
    val ref = Tables.lineitem(spark, sfSmall)
    val cur = ref.filter(col("l_returnflag") === "A")
    val df = Quality.driftPsi(ref, cur, Seq("l_quantity", "l_extendedprice"))
    val plan = df.queryExecution.executedPlan.toString
    // bucket alignment is a zero-padded union + per-key sum — NO join of
    // any kind survives to the physical plan (the old FULL OUTER merge
    // cost a SortMergeJoin + two sorted exchanges over the count tables)
    assert(!plan.contains("Join"), s"drift must not join at all:\n$plan")
    // counts partial-aggregate map-side before their exchanges
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 4,
      s"melted counts not partial-aggregated:\n$plan")
  }

  test("driftKs: identity reads 0, disjoint shift reads 1, a half cut reads exactly 0.5") {
    import spark.implicits._
    val ref = (1 to 1000).map(i => (i.toDouble, i.toLong)).toDF("x", "y")
    val same = Quality.driftKs(ref, ref, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(same("x") === 0.0 && same("y") === 0.0)
    // fully disjoint supports → the CDF gap hits 1 somewhere
    val shifted = ref.select((col("x") + 10000).as("x"), col("y"))
    val d1 = Quality.driftKs(ref, shifted, Seq("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d1("x") === 1.0)
    // current = the lower half of the reference: at x=500 F_cur=1,
    // F_ref=0.5 → KS exactly 0.5 (integer counts, exact rationals)
    val lower = ref.filter(col("x") <= 500)
    val d2 = Quality.driftKs(ref, lower, Seq("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d2("x") === 0.5)
    // NULLs are excluded from the statistic, and n_* report non-null rows
    val nulled = ref.select(
      when(col("y") % 2 === 0, col("x")).as("x"), col("y"))
    // evens keep every other value: the CDF gap peaks at odd values,
    // exactly 1/1000 — near-zero drift, and n_cur counts non-null rows
    val nd = Quality.driftKs(ref, nulled, Seq("x")).collect().head
    assert(nd.getDouble(1) === 0.001)
    assert(nd.getLong(3) === 500)
  }

  test("driftKs plan: melted count aggregates, union count merge, no joins") {
    val ref = Tables.lineitem(spark, sfSmall)
    val cur = ref.filter(col("l_returnflag") === "A")
    val plan = Quality.driftKs(ref, cur, Seq("l_quantity", "l_extendedprice"))
      .queryExecution.executedPlan.toString
    // count alignment is a zero-padded union + per-key sum — no join
    assert(!plan.contains("Join"), s"drift must not join at all:\n$plan")
    // (col, value) counts partial-aggregate map-side before the exchange
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 4,
      s"melted counts not partial-aggregated:\n$plan")
  }

  test("driftKsSketch tracks the exact statistic within its error bound") {
    import spark.implicits._
    // grid resolution (1/256) + 2× KLL rank error (~1.65% at k=200)
    // stays under the 0.05 gate with margin
    val ref = (1 to 20000).map(_.toDouble).toDF("x")
    def both(cur: org.apache.spark.sql.DataFrame): (Double, Double) = (
      Quality.driftKs(ref, cur, Seq("x")).collect().head.getDouble(1),
      Quality.driftKsSketch(ref, cur, Seq("x")).collect().head.getDouble(1))
    val cases = Seq(
      "identity" -> ref,
      "half cut" -> ref.filter(col("x") <= 10000),
      "disjoint" -> ref.select((col("x") + 1e6).as("x")))
    for ((name, cur) <- cases) {
      val (e, a) = both(cur)
      assert(math.abs(a - e) <= 0.05, s"$name: approx $a vs exact $e")
    }
    // and on the real feed pair the catalog entries monitor
    val ev = Tables.events(spark, sfTiny)
    val cur = ev.filter(col("event_type") === "purchase")
    val e2 = Quality.driftKs(ev, cur, Seq("value", "user_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a2 = Quality.driftKsSketch(ev, cur, Seq("value", "user_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (c <- Seq("value", "user_id"))
      assert(math.abs(a2(c) - e2(c)) <= 0.05, s"$c: ${a2(c)} vs ${e2(c)}")
  }

  test("driftTimeline flags the broken day; quiet days read quiet; tracks exact KS") {
    import spark.implicits._
    // three synthetic days: day2 repeats day1's distribution, day3 is
    // shifted out of support — the timeline must read ~0 then ~1
    def day(d: Int, off: Double) =
      (1 to 500).map(i => (s"2024-02-0$d 12:00:00", i.toDouble + off))
    val df = (day(1, 0) ++ day(2, 0) ++ day(3, 10000.0))
      .toDF("ts_s", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("value"))
    val t = Quality.driftTimeline(df, "value", "ts").orderBy("day").collect()
    assert(t.length === 2) // first day has no predecessor
    assert(t(0).getDouble(2) <= 0.05, s"quiet day read ${t(0).getDouble(2)}")
    assert(t(1).getDouble(2) >= 0.95, s"broken day read ${t(1).getDouble(2)}")
    assert(t.forall(_.getLong(3) === 500L))
    // on the real feed: each timeline reading within the sketch error
    // bound of the exact two-sample statistic for that day pair
    val ev = Tables.events(spark, sfTiny)
    val rows = Quality.driftTimeline(ev, "value", "ts")
      .orderBy("day").collect().take(3)
    assert(rows.nonEmpty)
    for (r <- rows) {
      val cur = ev.filter(to_date(col("ts")) === lit(r.getDate(0).toString))
      val prev = ev.filter(to_date(col("ts")) === lit(r.getDate(1).toString))
      val exact = Quality.driftKs(prev, cur, Seq("value"))
        .collect().head.getDouble(1)
      assert(math.abs(r.getDouble(2) - exact) <= 0.05,
        s"${r.getDate(0)}: timeline ${r.getDouble(2)} vs exact $exact")
    }
  }

  test("driftCategorical: identity reads 0/0; a mix flip reads large; hand-computed chi2") {
    import spark.implicits._
    val ref = ((1 to 50).map(_ => "a") ++ (1 to 50).map(_ => "b"))
      .toDF("cat")
    val same = Quality.driftCategorical(ref, ref, Seq("cat")).collect().head
    assert(same.getDouble(1) === 0.0 && same.getDouble(2) === 0.0)
    // majority flip 90/10 → 10/90
    val r90 = ((1 to 90).map(_ => "a") ++ (1 to 10).map(_ => "b")).toDF("cat")
    val c90 = ((1 to 10).map(_ => "a") ++ (1 to 90).map(_ => "b")).toDF("cat")
    val flip = Quality.driftCategorical(r90, c90, Seq("cat")).collect().head
    assert(flip.getDouble(1) > 0.25 && flip.getDouble(2) > 50.0)
    // hand check: ref {a:3,b:1}, cur {a:1,b:3} → e_a=2.8, e_b=1.2,
    // chi2 = 1.8²/2.8 + 1.8²/1.2 = 3.857143 (round 6)
    val r4 = Seq("a", "a", "a", "b").toDF("cat")
    val c4 = Seq("a", "b", "b", "b").toDF("cat")
    val hand = Quality.driftCategorical(r4, c4, Seq("cat")).collect().head
    assert(hand.getDouble(2) === 3.857143)
    // a category unseen in the reference stays finite (add-half smoothing)
    // and counts toward n_categories; NULL is a first-class category
    val withNew = Seq("a", "c", "c", null).toDF("cat")
    val nv = Quality.driftCategorical(r4, withNew, Seq("cat")).collect().head
    assert(!nv.getDouble(2).isNaN && !nv.getDouble(2).isInfinite)
    assert(nv.getLong(3) === 4) // a, b, c, ∅
  }

  test("outliersMad: hand-computed stats; flags what the classic z-score misses; MAD=0 policy") {
    import spark.implicits._
    // 1..9 plus one wild value: median 5.5, MAD 2.5 by hand; only the
    // wild value clears 3.5 robust sigmas. One NULL row proves exclusion.
    val base = (1 to 9).map(i => ("g", java.lang.Double.valueOf(i.toDouble))) :+
      (("g", java.lang.Double.valueOf(1000.0))) :+
      (("g", null.asInstanceOf[java.lang.Double]))
    val df = base.toDF("grp", "value")
    val r = Quality.outliersMad(df, "value", "grp").collect().head
    assert(r.getLong(1) === 10)          // NULL excluded from n
    assert(r.getDouble(2) === 5.5)
    assert(r.getDouble(3) === 2.5)
    assert(r.getLong(4) === 1)
    // the classic mean/stddev rule MISSES this exact outlier: the wild
    // value inflates the stddev until its own z stays under 3
    val xs = (1 to 9).map(_.toDouble) :+ 1000.0
    val mean = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
    assert((1000.0 - mean) / sd < 3.0,
      "fixture must be one the classic z-score fails on")
    // MAD = 0 (over half identical): any deviation at all flags
    val const = (Seq.fill(4)(5.0) :+ 6.0).map(("c", _)).toDF("grp", "value")
    val c = Quality.outliersMad(const, "value", "grp").collect().head
    assert(c.getDouble(3) === 0.0 && c.getLong(4) === 1)
    // a clean group flags nothing
    val clean = (1 to 100).map(i => ("k", i.toDouble)).toDF("grp", "value")
    assert(Quality.outliersMad(clean, "value", "grp")
      .collect().head.getLong(4) === 0)
    // the 100 TB mode (approx_percentile sketch) agrees with exact on
    // the real feed: same groups, outlier counts within 10% of n
    val ev = Tables.events(spark, sfTiny)
    val ex = Quality.outliersMad(ev, "value", "event_type")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(4)))).toMap
    val ap = Quality.outliersMad(ev, "value", "event_type", exact = false)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(4)))).toMap
    assert(ex.keySet === ap.keySet)
    for ((g, (n, o)) <- ex) {
      assert(ap(g)._1 === n)
      assert(math.abs(ap(g)._2 - o) <= math.max(2L, n / 10),
        s"$g: approx ${ap(g)._2} vs exact $o of $n")
    }
  }

  test("driftPsiByGroup: only the shifted segment reads drift; NULL group is a segment") {
    import spark.implicits._
    // two segments, identical in ref; in cur, ONLY segment b shifts
    val ref = ((1 to 500).map(i => ("a", i.toDouble % 100)) ++
      (1 to 500).map(i => ("b", i.toDouble % 100))).toDF("seg", "x")
    val cur = ref.select(col("seg"),
      when(col("seg") === "b", col("x") + 1000).otherwise(col("x")).as("x"))
    val d = Quality.driftPsiByGroup(ref, cur, "x", "seg")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d("a") === 0.0, s"unshifted segment must read zero: $d")
    assert(d("b") > 0.25, s"shifted segment must read major drift: $d")
    // a NULL group key is the ∅ segment, not a dropped row
    val withNull = ref.unionAll(
      Seq((null.asInstanceOf[String], 5.0)).toDF("seg", "x"))
    val g = Quality.driftPsiByGroup(withNull, withNull, "x", "seg")
      .collect().map(_.getString(0)).toSet
    assert(g === Set("a", "b", "∅"))
    // identity across every group reads zero everywhere
    assert(Quality.driftPsiByGroup(ref, ref, "x", "seg")
      .collect().forall(_.getDouble(1) === 0.0))
  }

  test("histogram: equi-depth on a ramp, ties land low, NULLs excluded, approx agrees") {
    import spark.implicits._
    // a uniform ramp splits exactly: 10 buckets x 100 rows, contiguous
    val ramp = (1 to 1000).map(_.toDouble).toDF("x")
    val h = Quality.histogram(ramp, "x", 10).orderBy("bucket").collect()
    assert(h.length === 10)
    assert(h.forall(_.getLong(1) === 100L), h.mkString(", "))
    // buckets tile the range: each lo is the previous hi + 1 on integers
    val his = h.map(_.getDouble(3))
    val los = h.map(_.getDouble(2))
    assert(los.head === 1.0 && his.last === 1000.0)
    assert((1 until 10).forall(i => los(i) === his(i - 1) + 1))
    // heavy ties: values equal to a boundary land in the LOWER bucket,
    // and the swallowed buckets simply don't appear
    val ties = (Seq.fill(95)(5.0) ++ (1 to 5).map(_.toDouble)).toDF("x")
    val t = Quality.histogram(ties, "x", 10).orderBy("bucket").collect()
    assert(t.map(_.getInt(0)).toSeq ===
      t.map(_.getInt(0)).toSeq.sorted.distinct) // no duplicate buckets
    assert(t.map(_.getLong(1)).sum === 100L)
    // NULLs excluded
    val withNull = (Seq[java.lang.Double](1.0, 2.0, 3.0, null)).toDF("x")
    assert(Quality.histogram(withNull, "x", 2)
      .agg(sum("n")).collect().head.getLong(0) === 3L)
    // the sketch mode lands each count within 5% of exact on the ramp
    val ha = Quality.histogram(ramp, "x", 10, exact = false)
      .orderBy("bucket").collect()
    assert(ha.map(_.getLong(1)).sum === 1000L)
    assert(ha.forall(r => math.abs(r.getLong(1) - 100L) <= 50L))
  }

  test("driftCategorical: chi2 is NULL (not NaN) against an empty side; psi stays finite") {
    import spark.implicits._
    val ref = Seq("a", "a", "b").toDF("cat")
    val empty = ref.filter(lit(false))
    val r = Quality.driftCategorical(ref, empty, Seq("cat")).collect().head
    assert(r.isNullAt(2), s"chi2 vs empty current must be NULL: $r")
    assert(!r.isNullAt(1) && !r.getDouble(1).isNaN) // smoothed psi finite
  }

  test("quarantine tags first failing check in order; split partitions") {
    import Quality._
    val checks = Seq(InRange("qty", 1, 10), AcceptedValues("flag", Seq("A", "B")),
      NotNull("id"))
    val tagged = Quality.quarantine(dirty, checks)
      .collect().map(r => (r.getAs[java.lang.Long]("id"),
        Option(r.getAs[String]("quarantine_reason")))).toMap
    assert(tagged(4L) === Some("range:qty[1.0,10.0]"))   // 99 fails range FIRST
    assert(tagged(5L) === Some("accepted:flag{A,B}"))     // the X
    assert(tagged(null) === Some("not_null:id"))
    assert(tagged(1L).isEmpty && tagged(3L).isEmpty)      // null qty passes range
    val (ok, bad) = Quality.split(dirty, checks)
    assert(ok.count() + bad.count() === dirty.count())
    assert(!ok.columns.contains("quarantine_reason"))
    assert(bad.filter(col("quarantine_reason").isNull).count() === 0)
    // a row-local gate must stay a narrow projection: no exchange at all
    val plan = Quality.quarantine(Tables.lineitem(spark, sfTiny),
      Seq(InRange("l_quantity", 1, 30))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quarantine must not shuffle:\n$plan")
  }

  test("scan-local checks share one aggregate pass (no extra scans)") {
    import Quality._
    val plan = Quality.runChecks(Tables.lineitem(spark, sfTiny), Seq(
        NotNull("l_orderkey"), InRange("l_quantity", 1, 30),
        AcceptedValues("l_returnflag", Seq("A", "N"))))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1,
      s"3 scan-local checks must fold into one scan, got $scans:\n$plan")
  }

  test("fdProfile: exact FD, measured g3, NULL as first-class ∅, one-scan plan") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 10L), (2L, 10L), (3L, 20L), (null, 20L), (null, 20L)
    ).toDF("a", "b")
    val r = Quality.fdProfile(df, Seq("a" -> "b", "b" -> "a"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap

    // a→b holds: groups 1→{10}, 2→{10}, 3→{20}, ∅→{20} all single-valued
    // (the ∅ group COUNTS — an FD that held only because NULLs vanished
    // would be a false positive)
    val ab = r(("a", "b"))
    assert(ab.getLong(2) === 4 && ab.getLong(3) === 0 && ab.getLong(4) === 0)
    assert(ab.getLong(5) === 6)
    assert(ab.getBoolean(6) && ab.getDouble(7) === 1.0)

    // b→a broken both groups: 10→{1,1,2} and 20→{3,∅,∅}, each modal 2 of
    // 3 ⇒ g3 = 2 deleted rows of 6, strength 2/3
    val ba = r(("b", "a"))
    assert(ba.getLong(2) === 2 && ba.getLong(3) === 2 && ba.getLong(4) === 2)
    assert(!ba.getBoolean(6))
    assert(math.abs(ba.getDouble(7) - (1.0 - 2.0 / 6)) < 1e-12)

    // one exploded scan feeds every pair — no per-pair rescans
    val ev = Tables.events(spark, sfTiny)
    val plan = Quality.fdProfile(ev,
        Seq("event_id" -> "event_type", "event_type" -> "user_id"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"k pairs must share one scan, got $scans:\n$plan")
  }
}
