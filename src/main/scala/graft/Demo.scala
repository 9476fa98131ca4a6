package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcEnvelope
import graft.operators.KeyStrategy
import graft.sources.{OutCompression, OutFormat}
import graft.streaming._

/** Runnable end-to-end example — the Spark twin of the reference's
  * `rigatoni-examples/change_stream_listener.rs` + `simple_pipeline_memory
  * .rs`: a live change feed, an [[Orchestrator]] watching three
  * collections, one [[FileDestination]] per collection, and a traffic
  * generator revealing events in waves WHILE the queries run — then a
  * graceful drain, aggregated stats, and a lossless read-back check.
  *
  * Run it with:
  * {{{
  *   sbt "runMain graft.Demo"                       # fixture feed, ~30 s
  *   sbt "runMain graft.Demo /root/testdata/sf0.01" # bigger feed
  * }}}
  *
  * Exit code 0 means every generated event landed exactly once.
  */
object Demo {

  private val Collections = Seq("c_0", "c_1", "c_2")

  private val envDDL =
    "operation string, database string, collection string, " +
      "cluster_time timestamp, document_key string, full_document string, " +
      "resume_token string, event_id long, user_id long, value double"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = if (args.length > 1) args(1) else "target/demo-out"
    val waves = 3

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // feed the reference metric names (events_processed_total, batch_size,
    // …) from engine progress events
    val listener = new MetricsListener
    spark.streams.addListener(listener)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // --- 1. stage the change feed: the events fixture as CDC envelopes,
    //        split per collection into `waves` files each ------------------
    println(s"[demo] staging change feed from $sfDir")
    val env = CdcEnvelope.fromEvents(Tables.events(spark, sfDir))
      .drop("update_description")
      .filter(col("collection").isin(Collections: _*))
    Collections.foreach { c =>
      env.filter(col("collection") === c).repartition(waves)
        .write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(s"$root/staging/$c")
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/source/$c"))
    }
    val expected = env.groupBy("collection").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[demo] feed: ${expected.values.sum} events over " +
      s"${Collections.size} collections")

    // --- 2. one streaming query per collection, batchId-keyed file sinks --
    val dests = Collections.map(c => c -> new FileDestination(s"$root/out/$c",
      OutFormat.Jsonl, OutCompression.Gzip, KeyStrategy.CollectionBased)).toMap
    val orchestrator = new Orchestrator(
      spark,
      sourceRoot = s"$root/source",
      level = WatchLevel.Collection(Collections),
      checkpointRoot = s"$root/checkpoints",
      schemaDDL = envDDL,
      destinationFor = dests(_),
      configure = _.copy(triggerInterval = Some("1 second")),
      metricsPort = Some(0)) // the reference's /metrics endpoint; 0 = ephemeral
    orchestrator.start()
    println(s"[demo] orchestrator running " +
      s"${orchestrator.activeQueries.size} queries; metrics at " +
      s"http://localhost:${orchestrator.metricsServer.get.port}/metrics")

    // --- 3. traffic generator: reveal one staged wave per tick while the
    //        queries are live (the reference example's insert task) --------
    val generator = new Thread(() => {
      try {
        (0 until waves).foreach { w =>
          Collections.foreach { c =>
            // the staging dir shrinks as waves move out: always take the
            // first file still waiting (globStatus returns NULL, not an
            // empty array, when the pattern's parent matches nothing)
            Option(fs.globStatus(
              new org.apache.hadoop.fs.Path(s"$root/staging/$c/part-*")))
              .getOrElse(Array.empty).toSeq
              .sortBy(_.getPath.getName).headOption.foreach { st =>
                val f = st.getPath
                fs.rename(f,
                  new org.apache.hadoop.fs.Path(s"$root/source/$c/${f.getName}"))
              }
          }
          println(s"[demo] generator: wave ${w + 1}/$waves revealed")
          Thread.sleep(800)
        }
      } catch {
        case t: Throwable =>
          // surface the cause instead of a silent 60 s drain timeout
          println(s"[demo] generator FAILED: $t")
      }
    }, "demo-traffic-generator")
    generator.start()
    generator.join()

    // --- 4. drain: poll the destinations until every event landed --------
    def landed(): Long = Collections.map { c =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/out/$c"))) 0L
      else dests(c).readBack(spark, Some(envDDL)).count()
    }.sum
    val total = expected.values.sum
    val deadline = System.nanoTime() + 60e9.toLong
    while (landed() < total && System.nanoTime() < deadline) Thread.sleep(500)

    val stats = orchestrator.stats()
    // one live scrape before shutdown — what Prometheus would see
    orchestrator.metricsServer.foreach { srv =>
      try {
        val body = scala.io.Source.fromURL(
          s"http://127.0.0.1:${srv.port}/metrics", "UTF-8").mkString
        val lines = body.linesIterator.size
        val processed = graft.streaming.GraftMetrics.EventsProcessed
        println(s"[demo] /metrics scrape: $lines series, e.g. " +
          body.linesIterator.filter(_.startsWith(processed))
            .maxByOption(_.contains("{")).getOrElse(""))
      } catch { case t: Throwable => println(s"[demo] scrape failed: $t") }
    }
    orchestrator.stop() // graceful: in-flight batches finish, offsets commit
    println(s"[demo] stats: events=${stats.eventsProcessed} " +
      s"batches=${stats.batchesWritten} writeErrors=${stats.writeErrors} " +
      s"retries=${stats.retries}")

    // --- 5. verify: lossless, exactly-once, per collection ----------------
    var ok = true
    Collections.foreach { c =>
      val back = dests(c).readBack(spark, Some(envDDL))
      val n = back.count()
      val distinct = back.select(countDistinct(col("event_id"))).head.getLong(0)
      val want = expected.getOrElse(c, 0L) // a feed may leave a watched collection empty
      val status = if (n == want && distinct == want) "OK" else "MISMATCH"
      if (status != "OK") ok = false
      println(f"[demo]   $c%-4s events=$n%5d distinct=$distinct%5d expected=$want%5d  $status")
    }
    // --- 6. the lake self-documents: build one indexed layout from the
    //        delivered feed and read the catalog back (describe) ----------
    val lakeDir = s"$root/lake"
    dests(Collections.head).readBack(spark, Some(envDDL))
      .write.mode("overwrite").parquet(lakeDir)
    graft.sources.BloomIndex.write(spark, lakeDir, Seq("event_id"),
      expectedItemsPerFile = 100000)
    graft.plans.GraftCatalog.describe(spark, lakeDir).collect().foreach { r =>
      val why = Option(r.getString(6)).filter(_.nonEmpty)
        .fold("")(d => s" ($d)")
      println(s"[demo] catalog: kind=${r.getString(1)} name=${r.getString(2)}" +
        s" ${r.getString(3)} v=${r.getLong(4)} refusals=${r.getLong(5)}$why")
    }

    // --- 7. manifest-served aggregates: the feed profile without
    //        touching a single data file (MetaAgg over the zone map,
    //        plus the per-file sketch tier for the approx questions) ----
    graft.sources.ZoneMap.write(spark, lakeDir, Seq("event_id"),
      sketchCols = Seq("event_id"))
    val approx = graft.sources.ZoneMap.metaApproxProfile(spark, lakeDir,
      Seq("event_id"), Seq(0.5)).collect().head
    println(s"[demo] manifest sketch tier: n=${approx.getAs[Long]("n_rows")} " +
      s"p50(event_id)=${approx.getAs[Double]("event_id_p50")} " +
      s"approx_distinct=${approx.getAs[Long]("event_id_approx_distinct")}")
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache() // a fresh session's state
    graft.plans.MetaAgg.install(spark)
    val profile = spark.read.parquet(lakeDir)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.min(col("event_id")).as("first_id"),
        org.apache.spark.sql.functions.max(col("event_id")).as("last_id"))
      .collect().head
    println(s"[demo] manifest-served profile (zero data files): " +
      s"n=${profile.getLong(0)} ids=[${profile.getLong(1)}," +
      s"${profile.getLong(2)}]")
    graft.plans.MetaAgg.uninstall(spark)

    spark.stop()
    if (!ok) { println("[demo] FAILED: lost or duplicated events"); sys.exit(1) }
    println("[demo] all events delivered exactly once")
  }
}
