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
}
