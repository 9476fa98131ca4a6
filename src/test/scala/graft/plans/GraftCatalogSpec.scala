package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sources.BloomIndex
import graft.streaming.IncrementalAgg

/** The catalog's contract: registrations persisted beside the data are
  * DISCOVERED by a fresh session's plain SQL (the registry no longer dies
  * with the JVM), discovery costs one filesystem probe per root, the off
  * switch works, and a malformed catalog refuses loudly — never crashes a
  * query. "Fresh session" is simulated by clearing every in-memory
  * registry plus the discovery cache, which is exactly the state a new
  * JVM starts from. */
class GraftCatalogSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val root = "/root/repo/target/test-out/graft-catalog"
  private val factPath = s"$root/fact"
  private val basePath = s"$root/base"
  private val statePath = s"$root/mv-state"
  private val fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  fs.delete(new org.apache.hadoop.fs.Path(root), true)

  // bloom + zone layout
  Tables.documents(spark, sfTiny)
    .select("doc_id", "lang", "n_chars")
    .repartition(8, col("doc_id"))
    .write.parquet(factPath)
  BloomIndex.write(spark, factPath, Seq("doc_id"),
    expectedItemsPerFile = 2000, fpp = 0.01)
  graft.sources.ZoneMap.write(spark, factPath, Seq("n_chars"))

  // summary view state over a second base
  Tables.documents(spark, sfTiny)
    .select("doc_id", "lang", "source", "n_chars")
    .write.parquet(basePath)
  IncrementalAgg.applyDelta(spark,
    statePath,
    spark.read.parquet(basePath).select(col("lang"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs")),
    keyCols = Seq("lang"), sumCols = Seq("n_chars", "n_docs"),
    nBuckets = 4, batchId = 0L)

  // register everything, persist, then FORGET (the fresh-session state)
  BloomJoins.clear()
  SummaryViews.clear()
  GraftCatalog.clearCache()
  BloomJoins.register(BloomJoins.Layout(factPath, "doc_id", maxKeys = 50000))
  BloomJoins.registerZone(BloomJoins.ZoneLayout(factPath, "n_chars"))
  GraftCatalog.save(spark, factPath)
  SummaryViews.register(SummaryViews.View(
    basePath, statePath, Seq("lang"), Set("n_chars"), Some("n_docs")))
  GraftCatalog.save(spark, basePath)
  freshSession()
  BloomJoins.install(spark)
  SummaryViews.install(spark)

  private def freshSession(): Unit = {
    BloomJoins.clear()
    SummaryViews.clear()
    GraftCatalog.clearCache()
  }

  override def afterAll(): Unit = {
    BloomJoins.uninstall(spark)
    SummaryViews.uninstall(spark)
    freshSession()
    super.afterAll()
  }

  private def factFiles(df: DataFrame, marker: String): Long =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if f.location.rootPaths.exists(_.toString.contains(marker)) =>
            f.location.inputFiles.length.toLong
          case _ => 0L
        }
    }.sum

  private def firedOnState(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.exists(_.toString.contains("mv-state/state"))
          case _ => false
        }
    }.exists(identity)

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  private def withoutRules[T](f: => T): T = {
    BloomJoins.uninstall(spark)
    SummaryViews.uninstall(spark)
    try f finally { BloomJoins.install(spark); SummaryViews.install(spark) }
  }

  test("a fresh session's plain SQL prunes a catalogued bloom layout — " +
    "no register() call anywhere") {
    // the standing state IS the fresh session: registries cleared after
    // save. The first query over the path must discover the catalog.
    val q = spark.sql(s"SELECT doc_id, lang FROM parquet.`$factPath` " +
      "WHERE doc_id IN (3, 7, 11)")
    assert(factFiles(q, "graft-catalog/fact") > 0 &&
      factFiles(q, "graft-catalog/fact") < 8,
      s"discovery must let plain SQL prune:\n${q.queryExecution.optimizedPlan}")
    val exp = withoutRules(sortedRows(
      spark.read.parquet(factPath).where(col("doc_id").isin(3L, 7L, 11L))
        .select("doc_id", "lang")))
    assert(sortedRows(q) === exp)
  }

  test("zone layouts ride the same catalog: a fresh-session range query " +
    "prunes") {
    freshSession()
    val q = spark.sql(
      s"SELECT count(*) AS n FROM parquet.`$factPath` WHERE n_chars < 40")
    // n_chars is hash-spread across files, so zones may not skip — the
    // REQUIRE here is on discovery registering the zone layout at all;
    // skipping is asserted on the clustered layout below
    assert(BloomJoins.zoneLayoutsFor(factPath).isEmpty,
      "premise: fresh session starts empty")
    q.queryExecution.optimizedPlan // plan → discovery runs
    assert(BloomJoins.zoneLayoutsFor(factPath).map(_.col) === Seq("n_chars"),
      "discovery must register the catalogued zone layout")
    // a range-clustered layout catalogued the same way actually SKIPS
    val zpath = s"$root/zfact"
    Tables.documents(spark, sfTiny).select("doc_id", "lang")
      .repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(zpath)
    graft.sources.ZoneMap.write(spark, zpath, Seq("doc_id"))
    BloomJoins.registerZone(BloomJoins.ZoneLayout(zpath, "doc_id"))
    GraftCatalog.save(spark, zpath)
    freshSession()
    val zq = spark.sql(
      s"SELECT doc_id FROM parquet.`$zpath` WHERE doc_id <= 60")
    assert(factFiles(zq, "graft-catalog/zfact") > 0 &&
      factFiles(zq, "graft-catalog/zfact") < 8,
      zq.queryExecution.optimizedPlan.toString)
    assert(zq.count() === withoutRules(
      spark.read.parquet(zpath).where(col("doc_id") <= 60L).count()))
  }

  test("a fresh session's plain GROUP BY lands on a catalogued summary " +
    "view") {
    freshSession()
    val q = spark.sql(
      s"""SELECT lang, sum(n_chars) AS sc, count(*) AS n
         |FROM parquet.`$basePath` GROUP BY lang""".stripMargin)
    assert(firedOnState(q),
      s"discovery must route the aggregate onto the summary:\n${
        q.queryExecution.optimizedPlan}")
    val exp = withoutRules(sortedRows(spark.sql(
      s"""SELECT lang, sum(n_chars) AS sc, count(*) AS n
         |FROM parquet.`$basePath` GROUP BY lang""".stripMargin)))
    assert(sortedRows(q) === exp)
  }

  test("discovery costs one filesystem probe per root, hit or miss") {
    freshSession()
    val other = s"$root/no-catalog"
    spark.range(10).select(col("id").as("doc_id")).write
      .mode("overwrite").parquet(other)
    def q: DataFrame =
      spark.read.parquet(other).where(col("doc_id").isin(1L, 2L))
    q.queryExecution.optimizedPlan
    val p0 = GraftCatalog.discoveryProbes.get()
    (1 to 3).foreach(_ => q.queryExecution.optimizedPlan)
    assert(GraftCatalog.discoveryProbes.get() === p0,
      "a probed root (miss) must never re-probe in-session")
    // and a HIT root equally probes once
    def qc: DataFrame =
      spark.read.parquet(factPath).where(col("doc_id").isin(3L))
    qc.queryExecution.optimizedPlan
    val p1 = GraftCatalog.discoveryProbes.get()
    (1 to 3).foreach(_ => qc.queryExecution.optimizedPlan)
    assert(GraftCatalog.discoveryProbes.get() === p1)
  }

  test("spark.graft.catalog.autoload=false disables discovery; explicit " +
    "load() still works") {
    freshSession()
    spark.conf.set("spark.graft.catalog.autoload", "false")
    try {
      val q = spark.read.parquet(factPath)
        .where(col("doc_id").isin(3L, 7L))
      assert(factFiles(q, "graft-catalog/fact") === 8L,
        "autoload off: plain scan")
      assert(GraftCatalog.load(spark, factPath),
        "explicit load must still read the catalog")
      val q2 = spark.read.parquet(factPath)
        .where(col("doc_id").isin(3L, 7L))
      assert(factFiles(q2, "graft-catalog/fact") < 8)
    } finally spark.conf.set("spark.graft.catalog.autoload", "true")
  }

  test("a malformed catalog refuses loudly: queries answer exactly, the " +
    "refusal is counted") {
    val broken = s"$root/broken"
    spark.range(20).select(col("id").as("doc_id")).write
      .mode("overwrite").parquet(broken)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$broken/_graft_catalog.json"), true)
    out.write("{not json at all".getBytes("UTF-8")); out.close()
    freshSession()
    val before = graft.streaming.GraftMetrics
      .counterTotal(BloomJoins.RefusalMetric)
    val q = spark.read.parquet(broken).where(col("doc_id") === 3L)
    assert(q.count() === 1L, "the query must answer despite the bad catalog")
    assert(graft.streaming.GraftMetrics
      .counterTotal(BloomJoins.RefusalMetric) > before,
      "the catalog-load failure must be counted")
  }

  test("save round-trips every registration field") {
    freshSession()
    BloomJoins.register(BloomJoins.Layout(factPath, "doc_id", maxKeys = 123))
    BloomJoins.registerZone(BloomJoins.ZoneLayout(factPath, "n_chars"))
    GraftCatalog.save(spark, factPath)
    SummaryViews.register(SummaryViews.View(
      basePath, statePath, Seq("lang"), Set("n_chars"), Some("n_docs"),
      nnCounts = Map("n_chars" -> "nn"), minCols = Map("n_chars" -> "mn"),
      maxCols = Map("n_chars" -> "mx")))
    GraftCatalog.save(spark, basePath)
    freshSession()
    assert(GraftCatalog.load(spark, factPath))
    assert(GraftCatalog.load(spark, basePath))
    assert(BloomJoins.layoutsFor(factPath)
      === Seq(BloomJoins.Layout(factPath, "doc_id", maxKeys = 123)))
    assert(BloomJoins.zoneLayoutsFor(factPath)
      === Seq(BloomJoins.ZoneLayout(factPath, "n_chars")))
    assert(SummaryViews.viewsFor(basePath) === Seq(SummaryViews.View(
      basePath, statePath, Seq("lang"), Set("n_chars"), Some("n_docs"),
      nnCounts = Map("n_chars" -> "nn"), minCols = Map("n_chars" -> "mn"),
      maxCols = Map("n_chars" -> "mx"))))
    // restore the canonical persisted state for any later test
    GraftCatalog.save(spark, factPath)
    GraftCatalog.save(spark, basePath)
  }
}
