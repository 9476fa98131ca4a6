package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.mutable

/** O1 — the pipeline orchestrator (pipeline.rs:660-1096): owns the session,
  * destination factory and watch-level dispatch; spawns one streaming query
  * per watched collection (or one glob query for database/deployment
  * level), tracks them, aggregates stats, and stops everything gracefully.
  *
  * What the reference needs distributed locks for (O6 — N instances
  * fighting over collections) Spark solves structurally: a checkpoint
  * directory admits exactly one running query, and executors scale a
  * single query horizontally instead of sharding collections across
  * processes.
  */
final class Orchestrator(
    spark: SparkSession,
    sourceRoot: String,
    level: WatchLevel,
    checkpointRoot: String,
    schemaDDL: String,
    destinationFor: String => Destination,
    configure: PipelineConfig => PipelineConfig = identity,
    metricsPort: Option[Int] = None) {

  private val queries = mutable.LinkedHashMap.empty[String, StreamingQuery]
  private val destinations = mutable.LinkedHashMap.empty[String, Destination]
  private var metrics: Option[MetricsServer] = None

  /** The live /metrics endpoint, if `metricsPort` was given and [[start]]
    * has run — `metricsServer.map(_.port)` is the scrape port. */
  def metricsServer: Option[MetricsServer] = synchronized(metrics)

  /** Start one query per watch target (pipeline.rs:798-971 dispatch). */
  def start(): Seq[StreamingQuery] = synchronized {
    require(queries.isEmpty, "orchestrator already started")
    // path shapes come from the ONE tested mapping (CdcPipeline.sourcePath)
    // so the orchestrator can never drift from the pipeline's glob scheme
    val targets: Seq[(String, String)] = level match {
      case WatchLevel.Collection(names) =>
        names.zip(CdcPipeline.sourcePath(sourceRoot, level))
      case WatchLevel.Database =>
        CdcPipeline.sourcePath(sourceRoot, level).map("database" -> _)
      case WatchLevel.Deployment =>
        CdcPipeline.sourcePath(sourceRoot, level).map("deployment" -> _)
    }
    targets.foreach { case (name, path) =>
      val dest = destinationFor(name)
      val cfg = configure(PipelineConfig(
        sourceDir = path,
        schemaDDL = schemaDDL,
        checkpointDir = s"$checkpointRoot/$name",
        queryName = s"graft-cdc-$name"))
      destinations(name) = dest
      queries(name) = CdcPipeline.start(spark, cfg, dest)
    }
    GraftMetrics.setGauge(GraftMetrics.ActiveCollections, queries.size.toDouble)
    // the reference serves /metrics next to the pipelines
    // (metrics_prometheus.rs); port 0 picks an ephemeral port
    metrics = metricsPort.map(MetricsServer.start)
    queries.values.toSeq
  }

  def activeQueries: Seq[StreamingQuery] = synchronized(queries.values.toSeq)

  /** Block until every query has processed all currently-available input
    * (AvailableNow queries terminate on their own). */
  def awaitTermination(timeoutMs: Long = 120000): Unit =
    activeQueries.foreach(_.awaitTermination(timeoutMs))

  /** O9 — aggregated stats (pipeline.rs:639-651) from the metric registry. */
  def stats(): PipelineStats = {
    import GraftMetrics._
    PipelineStats(
      eventsProcessed = counterTotal(EventsProcessed),
      batchesWritten = counterTotal(BatchesWritten),
      writeErrors = counterTotal(WriteErrors),
      retries = counterTotal(Retries))
  }

  /** O8 — graceful shutdown (pipeline.rs:1915-2016): stop each query
    * (in-flight batch completes, offsets commit), close destinations,
    * zero the active gauge. */
  def stop(): Unit = synchronized {
    queries.values.foreach(q => CdcPipeline.stopGracefully(q))
    destinations.values.foreach(_.close())
    GraftMetrics.setGauge(GraftMetrics.ActiveCollections, 0.0)
    metrics.foreach(_.stop())
    metrics = None
    queries.clear()
    destinations.clear()
  }
}
