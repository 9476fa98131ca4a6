package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Theta-sketch set algebra: exact-regime equivalence with true set
  * operations, estimation-regime error bounds, lossless mergeability.
  * (The CMS merge aggregate's tests live in OperatorsSpec next to the
  * HLL/KLL entries it completes.) */
class SketchesSpec extends SparkSpec {

  test("theta exact regime: estimate, intersection, difference equal true set algebra") {
    val out = graft.SparkEntry.queries("agg_theta_overlap")(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    val wu = Tables.events(spark, sfTiny)
      .select(to_date(date_trunc("week", col("ts"))).as("week"),
        col("user_id")).distinct()
      .collect().groupBy(_.getDate(0).toString).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    var sawReturning = false
    out.foreach { r =>
      val wk = r.getDate(0).toString
      val cur = wu(wk)
      val prev = wu.getOrElse(
        java.time.LocalDate.parse(wk).minusDays(7).toString, Set.empty[Long])
      assert(r.getAs[Long]("n_users") === cur.size.toLong, s"week $wk n_users")
      assert(r.getAs[Long]("returning_users") === (cur & prev).size.toLong,
        s"week $wk returning")
      assert(r.getAs[Long]("new_users") === (cur -- prev).size.toLong,
        s"week $wk new")
      if ((cur & prev).nonEmpty) sawReturning = true
    }
    assert(sawReturning, "fixture should have week-over-week returning users")
  }

  test("theta estimation regime: bounded error at lgK=9 on 40K-element sets") {
    import spark.implicits._
    // A = [0, 40000), B = [20000, 60000): |A| = |B| = 40000, overlap
    // 20000, difference 20000 — all far beyond the 2^9 = 512 nominal
    // entries, so every estimate runs in sampling mode. Theta hashing is
    // deterministic, so the measured errors are stable run to run.
    val rows = (0 until 40000).map(i => ("a", i.toLong)) ++
      (20000 until 60000).map(i => ("b", i.toLong))
    val sk = rows.toDF("g", "v").groupBy("g")
      .agg(Sketches.thetaSketch(col("v"), lgK = 9).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val probe = Seq((sk("a"), sk("b"))).toDF("a", "b")
      .select(
        Sketches.thetaEstimate(col("a")).as("na"),
        Sketches.thetaEstimate(col("b")).as("nb"),
        Sketches.thetaIntersectEstimate(col("a"), col("b")).as("inter"),
        Sketches.thetaAnotBEstimate(col("a"), col("b")).as("anotb"))
      .head()
    val (na, nb, inter, anotb) = (probe.getDouble(0), probe.getDouble(1),
      probe.getDouble(2), probe.getDouble(3))
    info(f"theta lgK=9: |A|=$na%.0f |B|=$nb%.0f inter=$inter%.0f anotb=$anotb%.0f")
    // RSE at lgK=9 is ~1/sqrt(512) = 4.4%; gate at ~3 sigma. Set-op
    // estimates compound the error of both operands — gate wider.
    assert(math.abs(na - 40000) / 40000.0 <= 0.15, s"|A| estimate $na")
    assert(math.abs(nb - 40000) / 40000.0 <= 0.15, s"|B| estimate $nb")
    assert(math.abs(inter - 20000) / 20000.0 <= 0.25, s"intersection $inter")
    assert(math.abs(anotb - 20000) / 20000.0 <= 0.25, s"difference $anotb")
  }

  test("theta merge is lossless: daily sketches union to the one-shot weekly bytes") {
    val ev = Tables.events(spark, sfTiny)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val merged = ev.groupBy(col("week"), col("day"))
      .agg(Sketches.thetaSketch(col("user_id")).as("sk"))
      .groupBy(col("week"))
      .agg(Sketches.thetaUnion(col("sk")).as("sk"))
    val oneShot = ev.groupBy(col("week"))
      .agg(Sketches.thetaSketch(col("user_id")).as("sk"))
    val m = merged.collect()
      .map(r => r.getDate(0).toString -> r.getAs[Array[Byte]](1).toSeq).toMap
    val o = oneShot.collect()
      .map(r => r.getDate(0).toString -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(m === o,
      "theta union of dailies is not byte-identical to the one-shot sketch")
  }

  test("theta edge semantics: empty group estimates 0, NULL sketch rows are skipped") {
    import spark.implicits._
    val empty = Seq((1L, 1L)).toDF("g", "v").filter(lit(false))
      .agg(Sketches.thetaSketch(col("v")).as("sk"))
      .select(Sketches.thetaEstimate(col("sk"))).head()
    assert(empty.getDouble(0) === 0.0, "empty-group theta should estimate 0")
    val one = Seq(1L, 2L, 3L).toDF("v")
      .agg(Sketches.thetaSketch(col("v")).as("sk"))
      .select(col("sk")).head().getAs[Array[Byte]](0)
    val withNull = Seq(Option(one), None)
      .toDF("sk")
      .agg(Sketches.thetaUnion(col("sk")).as("sk"))
      .select(Sketches.thetaEstimate(col("sk"))).head()
    assert(withNull.getDouble(0) === 3.0, "NULL sketch row should be skipped")
  }

  // --- frequent-items (Misra-Gries) sketch --------------------------------

  /** Zipf-ish fixture: item i appears 2000/i times for i in 1..40 (so true
    * counts are known in closed form), tagged round-robin into `part`
    * groups to exercise partial sketches + merge. */
  private def freqFixture(parts: Int) = {
    import spark.implicits._
    val rows = for {
      i <- 1 to 40
      j <- 1 to 2000 / i
    } yield (((i * 7919 + j) % parts).toLong, i.toLong)
    rows.toDF("part", "item")
  }

  private def trueCount(i: Long): Long = (2000 / i)

  test("freq exact regime: estimates equal true counts, maxError is 0, top-k cut matches") {
    val sk = freqFixture(8)
      .groupBy("part")
      .agg(Sketches.freqSketch(col("item"), 1024).as("sk"))
      .agg(Sketches.freqMerge(col("sk"), 1024).as("sk"))
    // 40 distinct items << 0.75*1024: the sketch never purges, so the
    // exposed error envelope must be exactly 0 — freqMaxError's contract
    val maxErr = sk.select(Sketches.freqMaxError(col("sk"))).head().getLong(0)
    assert(maxErr === 0L, "exact regime must report maxError 0")
    val top = sk.select(explode(Sketches.freqTopK(col("sk"), 10)).as("hh"))
      .select("hh.item", "hh.est", "hh.lb", "hh.ub").collect()
    assert(top.length === 10)
    top.zipWithIndex.foreach { case (r, rank) =>
      val (item, est, lb, ub) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(item === rank + 1L, s"rank $rank should be item ${rank + 1}")
      assert(est === trueCount(item), s"item $item estimate should be exact")
      assert(lb === est && ub === est, s"item $item bounds collapse when exact")
    }
  }

  test("freq saturated regime: lb<=true<=ub containment and merge-order-invariant validity") {
    import spark.implicits._
    // maxMapSize 64 with 40 heavy items + 5000 singleton tail items forces
    // Misra-Gries purges; estimates may drift but the deterministic bounds
    // may not lie, whatever order the partial sketches merged in.
    val tail = (1000L to 6000L).map(x => (x % 8, x + 100))
    val df = freqFixture(8).union(tail.toDF("part", "item"))
    def mergedTop(order: org.apache.spark.sql.Column) = df
      .groupBy("part")
      .agg(Sketches.freqSketch(col("item"), 64).as("sk"))
      .orderBy(order)
      .agg(Sketches.freqMerge(col("sk"), 64).as("sk"))
      .select(Sketches.freqMaxError(col("sk")).as("err"),
        Sketches.freqTopK(col("sk"), 5).as("top"))
      .head()
    Seq(mergedTop(col("part").asc), mergedTop(col("part").desc)).foreach { r =>
      assert(r.getLong(0) > 0L, "saturated sketch must report a nonzero envelope")
      val top = r.getSeq[org.apache.spark.sql.Row](1)
      assert(top.nonEmpty)
      top.foreach { hh =>
        val (item, est, lb, ub) = (hh.getLong(0), hh.getLong(1),
          hh.getLong(2), hh.getLong(3))
        val truth = if (item <= 40) trueCount(item) else 1L
        assert(lb <= truth && truth <= ub,
          s"item $item true=$truth outside [$lb,$ub]")
        assert(lb <= est && est <= ub, s"item $item est outside its own bounds")
      }
      // the dominant items are far above the error envelope — NO_FALSE_
      // NEGATIVES guarantees they surface regardless of merge order
      assert(top.map(_.getLong(0)).take(3).toSet === Set(1L, 2L, 3L))
    }
  }

  test("freq STRING sketches: exact-regime estimates survive partial " +
      "merge; top-k order is (est desc, item asc), bounds collapse") {
    import spark.implicits._
    // the categorical twin of the long fixture: item "itNN" appears
    // 2000/NN times, split round-robin over parts and merged back
    val rows = for {
      i <- 1 to 40
      j <- 1 to 2000 / i
    } yield (((i * 7919 + j) % 8).toLong, f"it$i%02d")
    val sk = rows.toDF("part", "item")
      .groupBy("part")
      .agg(Sketches.freqSketchStr(col("item"), 1024).as("sk"))
      .agg(Sketches.freqMergeStr(col("sk"), 1024).as("sk"))
    val maxErr = sk.select(Sketches.freqMaxErrorStr(col("sk")))
      .head().getLong(0)
    assert(maxErr === 0L, "exact regime must report maxError 0")
    val top = sk.select(explode(Sketches.freqTopKStr(col("sk"), 10)).as("hh"))
      .select("hh.item", "hh.est", "hh.lb", "hh.ub").collect()
    assert(top.length === 10)
    top.zipWithIndex.foreach { case (r, rank) =>
      val (item, est) = (r.getString(0), r.getLong(1))
      assert(item === f"it${rank + 1}%02d",
        s"rank $rank should be it${rank + 1}")
      assert(est === 2000L / (rank + 1), s"item $item estimate must be exact")
      assert(r.getLong(2) === est && r.getLong(3) === est,
        s"item $item bounds collapse when exact")
    }
  }
}
