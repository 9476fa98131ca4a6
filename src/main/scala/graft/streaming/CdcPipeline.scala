package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Pipeline configuration, mirroring PipelineConfigBuilder's validated
  * surface (pipeline.rs:554-635). Count/time batching (A1/A2) map to the
  * micro-batch engine's admission control: `maxFilesPerTrigger` bounds a
  * batch, the trigger interval is the batch timeout. */
final case class PipelineConfig(
    sourceDir: String,
    schemaDDL: String,
    checkpointDir: String,
    queryName: String = "graft-cdc",
    maxFilesPerTrigger: Option[Int] = None,          // A1 (count batching)
    triggerInterval: Option[String] = Some("5 seconds"), // A2; None => AvailableNow
    retry: Retry.Policy = Retry.Policy(),
    /** S6 — extra source options (latestFirst, maxFileAge, …), the
      * `full_document`/`batch_size` knob surface of stream.rs:473-501. */
    sourceOptions: Map[String, String] = Map.empty,
    /** F3 — operations that invalidate the stream: the batch's live rows
      * are flushed, then the query terminates fatally (no retry). */
    invalidateOps: Seq[String] = Seq.empty,
    transform: DataFrame => DataFrame = identity) {
  require(maxFilesPerTrigger.forall(n => n >= 1 && n <= 10000),
    "batch size must be in [1, 10000]") // pipeline.rs:562-571
}

/** Final statistics (PipelineStats, pipeline.rs:639-651). */
final case class PipelineStats(
    eventsProcessed: Long, batchesWritten: Long,
    writeErrors: Long, retries: Long)

/** The streaming runtime (SURVEY §3.1 restated on Structured Streaming):
  * file-source `readStream` over a CDC event directory → declarative
  * transform → `foreachBatch` destination with retry — with the engine
  * supplying what the reference hand-builds:
  *
  *  - resume tokens / state store (S5, ST1-ST3, O4): the checkpoint
  *    directory's offset WAL + commit log. Offsets commit only after the
  *    batch function returns, which is exactly token-save-after-write —
  *    at-least-once; an idempotent (batchId-keyed) destination makes it
  *    exactly-once. Two queries can't share a checkpoint (the lock the
  *    reference takes in Redis, O6, for free).
  *  - worker loop (O2): the micro-batch engine itself.
  *  - back-pressure (O7): `maxFilesPerTrigger` admission control.
  *  - graceful shutdown (O8/A3): `query.stop()` finishes the in-flight
  *    batch, then offsets are committed; nothing buffered is lost.
  */
object CdcPipeline {

  /** S1/S2/S3 — the bounded-source scan levels become path shapes: a
    * collection is a directory, a database a glob of collections, a
    * deployment a glob of databases (watch_level.rs:91-187). */
  def sourcePath(root: String, level: WatchLevel): Seq[String] = level match {
    case WatchLevel.Collection(names) => names.map(n => s"$root/$n")
    case WatchLevel.Database          => Seq(s"$root/*")
    case WatchLevel.Deployment        => Seq(s"$root/*/*")
  }

  /** Open the streaming source (S1 + S6 options). Timestamp format matches
    * [[graft.sources.Writers]] so µs precision survives the JSONL hop. */
  def source(spark: SparkSession, cfg: PipelineConfig): DataFrame = {
    val r = spark.readStream.schema(cfg.schemaDDL)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    cfg.sourceOptions.foreach { case (k, v) => r.option(k, v) }
    cfg.maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(cfg.sourceDir)
  }

  /** Wire source → transform → destination and start the query.
    * The foreachBatch body is the flush path (pipeline.rs:1721-1786):
    * write with retry/backoff, then metrics; offset commit (the "save
    * resume token" step) happens in the engine after this returns. */
  def start(spark: SparkSession, cfg: PipelineConfig,
            destination: Destination): StreamingQuery = {
    import GraftMetrics._
    val transformed = cfg.transform(source(spark, cfg))
    val writer = transformed.writeStream
      .queryName(cfg.queryName)
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        try {
          // F3: split off invalidation markers; live rows still flush, then
          // the stream closes fatally (stream.rs:1211-1220 semantics).
          val invalidated = cfg.invalidateOps.nonEmpty && !batch
            .filter(org.apache.spark.sql.functions.col("operation")
              .isin(cfg.invalidateOps: _*)).isEmpty
          val live =
            if (cfg.invalidateOps.isEmpty) batch
            else batch.filter(!org.apache.spark.sql.functions.col("operation")
              .isin(cfg.invalidateOps: _*))
          Retry.withBackoff(cfg.retry, seed = batchId,
            onRetry = (n, t) => {
              inc(Retries, "query" -> cfg.queryName)
              inc(WriteErrors, "query" -> cfg.queryName,
                "error_type" -> DestinationError.errorType(t))
            }) {
            destination.writeBatch(live, batchId)
            destination.flush()
          }
          if (invalidated)
            throw new DestinationError.Invalidated(
              s"stream ${cfg.queryName} invalidated at batch $batchId")
          inc(BatchesWritten, "query" -> cfg.queryName)
          observe(WriteDuration, (System.nanoTime() - t0) / 1e9,
            "query" -> cfg.queryName)
        } catch {
          case t: Throwable =>
            inc(WriteErrors, "query" -> cfg.queryName,
              "error_type" -> DestinationError.errorType(t))
            throw t // fail the batch -> offsets NOT committed -> redelivery
        }
      }
    val triggered = cfg.triggerInterval match {
      case Some(iv) => writer.trigger(Trigger.ProcessingTime(iv))
      case None     => writer.trigger(Trigger.AvailableNow())
    }
    triggered.start()
  }

  /** Drain-and-stop (O8): wait for the current batch, then stop. */
  def stopGracefully(q: StreamingQuery, timeoutMs: Long = 60000): Unit = {
    q.stop()
    q.awaitTermination(timeoutMs)
  }

  /** O5 — restart-with-backoff driver loop (stream.rs:950-1011): run the
    * query; on a retryable failure, restart FROM THE CHECKPOINT after an
    * exponential backoff with jitter; `maxAttempts = 0` retries forever
    * (stream.rs semantics). Returns the number of (re)starts performed. */
  def runWithRestart(spark: SparkSession, cfg: PipelineConfig,
                     destination: Destination, maxAttempts: Int = 3,
                     sleep: Long => Unit = Thread.sleep): Int = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val q = start(spark, cfg, destination)
      try {
        q.awaitTermination()
        done = true // clean termination (AvailableNow drained, or stop())
      } catch {
        case t: Throwable if DestinationError.isRetryable(t) &&
          (maxAttempts == 0 || attempt < maxAttempts) =>
          GraftMetrics.inc(GraftMetrics.Retries, "query" -> cfg.queryName)
          sleep(cfg.retry.delayMs(attempt, seed = 17L))
        case t: Throwable =>
          throw t
      }
    }
    attempt
  }
}

/** Watch-level topology (watch_level.rs:91-187, S4): how many streaming
  * queries cover the source tree. */
sealed trait WatchLevel
object WatchLevel {
  final case class Collection(names: Seq[String]) extends WatchLevel
  case object Database extends WatchLevel
  case object Deployment extends WatchLevel
}
