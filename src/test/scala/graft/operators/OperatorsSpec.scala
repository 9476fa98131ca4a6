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
}
