package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sources.BloomIndex

/** The bloom-pruned-join rule's contract: a globally injected rewriter
  * must prove it never fires wrongly (every refusal path), that firing
  * actually SKIPS files, and that the answer is bit-identical to the
  * plain join. */
class BloomJoinsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val root = "/root/repo/target/test-out/bloom-joins"
  private val factPath = s"$root/fact"
  private val fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // hash-spread layout: doc_id ranges overlap across every file, so only
  // the Bloom manifest can skip files for a point-ish dim
  fs.delete(new org.apache.hadoop.fs.Path(root), true)
  Tables.documents(spark, sfTiny)
    .select("doc_id", "lang", "source")
    .repartition(8, col("doc_id"))
    .write.parquet(factPath)
  BloomIndex.write(spark, factPath, Seq("doc_id"),
    expectedItemsPerFile = 2000, fpp = 0.01)
  BloomJoins.clear()
  BloomJoins.register(BloomJoins.Layout(factPath, "doc_id"))
  BloomJoins.install(spark)

  override def afterAll(): Unit = {
    BloomJoins.uninstall(spark)
    BloomJoins.clear()
    super.afterAll()
  }

  private def fact: DataFrame = spark.read.parquet(factPath)
  private def dimOf(ids: Long*): DataFrame =
    ids.toSeq.toDF("id")

  /** Number of fact files the optimized plan reads (0 when the scan
    * collapsed to a LocalRelation). Counts the file listing, not
    * rootPaths — a directory scan has ONE root path over 8 files. */
  private def factFiles(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if f.location.rootPaths.exists(_.toString.contains(
                "bloom-joins/fact")) =>
            f.location.inputFiles.length.toLong
          case _ => 0L
        }
    }.sum

  private def withoutRule[T](f: => T): T = {
    BloomJoins.uninstall(spark)
    try f finally BloomJoins.install(spark)
  }

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  /** Pruned and plain answers must agree; returns (rows, files read). */
  private def assertParity(q: => DataFrame): (Seq[Row], Long) = {
    val pruned = q
    val got = sortedRows(pruned)
    val exp = withoutRule {
      val e = q
      assert(factFiles(e) === 8L, "rule must be inert while uninstalled")
      sortedRows(e)
    }
    assert(got === exp)
    (got, factFiles(pruned))
  }

  test("a plain DataFrame inner join fires: files skipped, answer exact") {
    val dim = dimOf(3L, 7L, 11L)
    val (rows, files) = assertParity {
      val f = fact
      f.join(dim, f("doc_id") === dim("id"))
    }
    assert(rows.length === 3)
    assert(files > 0 && files < 8,
      s"expected file skipping, read $files of 8")
  }

  test("spark.sql spelling fires too, with parents resolving above the join") {
    fact.createOrReplaceTempView("bj_fact")
    dimOf(5L, 9L).createOrReplaceTempView("bj_dim")
    val q = spark.sql(
      """SELECT f.lang, count(*) AS n FROM bj_fact f
        |JOIN bj_dim d ON f.doc_id = d.id GROUP BY f.lang""".stripMargin)
    assert(factFiles(q) < 8, q.queryExecution.optimizedPlan.toString)
    val exp = withoutRule(sortedRows(spark.sql(
      """SELECT f.lang, count(*) AS n FROM bj_fact f
        |JOIN bj_dim d ON f.doc_id = d.id GROUP BY f.lang""".stripMargin)))
    assert(sortedRows(q) === exp)
  }

  test("fact-side filters stay in place above the pruned scan") {
    val dim = dimOf(3L, 7L)
    val (rows, files) = assertParity {
      val f = fact
      f.where(col("lang") =!= "zz").join(dim, f("doc_id") === dim("id"))
    }
    assert(files < 8)
    assert(rows.length === 2)
  }

  test("an empty dim prunes to the exact empty answer") {
    val dim = dimOf()
    val f = fact
    val q = f.join(dim, f("doc_id") === dim("id"))
    assert(factFiles(q) === 0L,
      "empty dim must collapse the fact scan entirely")
    assert(q.count() === 0L)
  }

  test("IN-subquery (left-semi) fires; NOT IN / anti never prunes") {
    fact.createOrReplaceTempView("bj_fact")
    dimOf(3L, 7L).createOrReplaceTempView("bj_dim_semi")
    val semi = spark.sql(
      "SELECT * FROM bj_fact WHERE doc_id IN (SELECT id FROM bj_dim_semi)")
    assert(factFiles(semi) > 0 && factFiles(semi) < 8,
      semi.queryExecution.optimizedPlan.toString)
    val exp = withoutRule(sortedRows(spark.sql(
      "SELECT * FROM bj_fact WHERE doc_id IN (SELECT id FROM bj_dim_semi)")))
    assert(sortedRows(semi) === exp)
    // anti: the kept rows are exactly the ones a pruned scan would drop
    val anti = spark.sql(
      "SELECT * FROM bj_fact WHERE doc_id NOT IN (SELECT id FROM bj_dim_semi)")
    assert(factFiles(anti) === 8L,
      anti.queryExecution.optimizedPlan.toString)
    assert(anti.count() === 498L)
  }

  test("literal IN / = filters prune the scan; OR branches never do") {
    val all = withoutRule(sortedRows(
      fact.where(col("doc_id").isin(3L, 7L, 11L))))
    // IN over the indexed column: scan swapped, filter stays, answer exact
    val q = fact.where(col("doc_id").isin(3L, 7L, 11L))
    assert(factFiles(q) > 0 && factFiles(q) < 8,
      q.queryExecution.optimizedPlan.toString)
    assert(sortedRows(q) === all)
    // single equality, spelled through SQL
    fact.createOrReplaceTempView("bj_fact")
    val eq = spark.sql("SELECT lang FROM bj_fact WHERE doc_id = 7")
    assert(factFiles(eq) > 0 && factFiles(eq) < 8)
    assert(eq.count() === 1L)
    // a conjunct on another column rides along (still prunes, still exact)
    val conj = fact.where(col("doc_id").isin(3L, 7L) && col("lang").isNotNull)
    assert(factFiles(conj) < 8)
    assert(conj.count() === 2L)
    // an OR involving the key must NOT prune: the other branch admits
    // rows in any file
    val or = fact.where(col("doc_id") === 3L || col("lang") === "en")
    assert(factFiles(or) === 8L,
      or.queryExecution.optimizedPlan.toString)
    // a large IN list goes through the optimizer's InSet form and still
    // prunes (cap permitting)
    val big = (1L to 15L).toSeq
    val inset = fact.where(col("doc_id").isin(big: _*))
    assert(factFiles(inset) < 8)
    assert(inset.count() === withoutRule(
      fact.where(col("doc_id").isin(big: _*)).count()))
  }

  test("literal pruning: NULL-only pins collapse to empty; non-key " +
    "columns and over-wide lists refuse") {
    val nullPin = fact.where(col("doc_id") === lit(null).cast("long"))
    assert(nullPin.count() === 0L)
    // literal filter on a non-indexed column: plain scan
    val nonKey = fact.where(col("lang") === "en")
    assert(factFiles(nonKey) === 8L)
    BloomJoins.register(BloomJoins.Layout(factPath, "doc_id", maxKeys = 2))
    try {
      val wide = fact.where(col("doc_id").isin(1L, 2L, 3L, 4L))
      assert(factFiles(wide) === 8L, "over-wide IN must refuse")
    } finally BloomJoins.register(BloomJoins.Layout(factPath, "doc_id"))
  }

  test("zone-registered range filters prune: BETWEEN, open-ended, " +
    "intersection; OR and unregistered columns refuse") {
    val zpath = s"$root/zfact"
    // range-cluster on doc_id so zones are tight
    Tables.documents(spark, sfTiny)
      .select("doc_id", "lang", "n_chars")
      .repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(zpath)
    graft.sources.ZoneMap.write(spark, zpath, Seq("doc_id", "n_chars"))
    BloomJoins.registerZone(BloomJoins.ZoneLayout(zpath, "doc_id"))
    def zfiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains("zfact")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
    def z = spark.read.parquet(zpath)
    try {
      // closed interval: two conjuncts intersect to the holding files
      val between = z.where(col("doc_id") >= 100L && col("doc_id") <= 140L)
      assert(zfiles(between) > 0 && zfiles(between) < 8,
        between.queryExecution.optimizedPlan.toString)
      val exp = withoutRule(sortedRows(
        z.where(col("doc_id") >= 100L && col("doc_id") <= 140L)))
      assert(sortedRows(between) === exp)
      // open-ended bound prunes too (strict > probes the closed interval)
      val open = z.where(col("doc_id") > 450L)
      assert(zfiles(open) > 0 && zfiles(open) < 8)
      assert(open.count() === withoutRule(
        z.where(col("doc_id") > 450L).count()))
      // a second zoned column intersects its candidate set with the first
      BloomJoins.registerZone(BloomJoins.ZoneLayout(zpath, "n_chars"))
      val both = z.where(col("doc_id") <= 80L && col("n_chars") >= 0)
      assert(zfiles(both) > 0 && zfiles(both) < 8)
      assert(both.count() === withoutRule(
        z.where(col("doc_id") <= 80L && col("n_chars") >= 0).count()))
      // OR involving the zoned column must not prune
      val or = z.where(col("doc_id") <= 10L || col("lang") === "en")
      assert(zfiles(or) === 8L)
      // a range on an unregistered column alone must not prune
      BloomJoins.unregisterZone(zpath)
      BloomJoins.registerZone(BloomJoins.ZoneLayout(zpath, "n_chars"))
      val unreg = z.where(col("doc_id") <= 10L)
      assert(zfiles(unreg) === 8L)
    } finally BloomJoins.unregisterZone(zpath)
  }

  test("refuses an unregistered layout") {
    val other = s"$root/unregistered"
    fact.limit(50).write.mode("overwrite").parquet(other)
    val o = spark.read.parquet(other)
    val dim = dimOf(3L)
    val q = o.join(dim, o("doc_id") === dim("id"))
    val reads = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.exists(_.toString.contains("unregistered"))
          case _ => false
        }
    }
    assert(reads.exists(identity), "plain scan of the unregistered layout")
  }

  test("refuses outer joins and cross-side composite conditions") {
    val dim = dimOf(3L, 7L)
    val f = fact
    assert(factFiles(f.join(dim,
      f("doc_id") === dim("id"), "left")) === 8L)
    // a cross-side non-equi conjunct stays in the join condition (the
    // optimizer cannot split it to one side), so the rule must refuse.
    // (A SINGLE-side conjunct like `&& f("doc_id") > 0` is a non-test:
    // predicate pushdown splits it into a fact filter before this rule
    // runs, leaving a clean equi-join — firing there is correct.)
    val f2 = fact
    assert(factFiles(f2.join(dim,
      f2("doc_id") === dim("id") && f2("doc_id") =!= dim("id") + 1)) === 8L)
  }

  test("single-side extra conjuncts split into fact filters and still fire") {
    val dim = dimOf(3L, 7L)
    val (rows, files) = assertParity {
      val f = fact
      f.join(dim, f("doc_id") === dim("id") && f("doc_id") > 3)
    }
    assert(files > 0 && files < 8)
    assert(rows.length === 1)
  }

  test("refuses a non-deterministic dim (non-collapsible source)") {
    // the dim must be parquet-backed: a rand-filtered LOCAL relation is
    // eagerly evaluated by ConvertToLocalRelation into frozen rows before
    // this rule runs — at that point it IS deterministic and firing is
    // exact. Over a file source the Filter(rand…) survives into the
    // optimized plan and the rule must refuse (plan-time keys could
    // differ from run-time keys).
    val f = fact
    val dim = fact.select(col("doc_id").as("id"))
      .where(rand(42) < 0.001)
    val q = f.join(dim, f("doc_id") === dim("id"))
    val planStr = q.queryExecution.optimizedPlan.toString
    assert(planStr.contains("rand("), s"premise: rand must survive\n$planStr")
    assert(factFiles(q) >= 8L, // both sides scan the full layout
      s"non-deterministic dim must not prune:\n$planStr")
  }

  test("refuses a dim wider than maxKeys instead of degrading") {
    BloomJoins.register(BloomJoins.Layout(factPath, "doc_id", maxKeys = 2))
    try {
      val dim = dimOf(1L, 2L, 3L, 4L)
      val f = fact
      assert(factFiles(f.join(dim, f("doc_id") === dim("id"))) === 8L)
    } finally BloomJoins.register(BloomJoins.Layout(factPath, "doc_id"))
  }

  test("refuses when the join key is not the indexed column") {
    val dim = Seq("en").toDF("l")
    val f = fact
    val q = f.join(dim, f("lang") === dim("l"))
    assert(factFiles(q) === 8L)
  }
}
