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
