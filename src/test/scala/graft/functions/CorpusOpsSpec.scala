package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfTiny).cache()

  test("split is deterministic, content-keyed, and roughly 80/10/10") {
    val once = CorpusOps.withSplit(docs)
    val again = CorpusOps.withSplit(docs)
    assert(once.select("doc_id", "split").collect().toSet ===
      again.select("doc_id", "split").collect().toSet)
    val frac = once.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(frac("train") / n > 0.7 && frac("train") / n < 0.9)
    assert(frac.getOrElse("val", 0L) / n < 0.2)
    assert(frac.getOrElse("test", 0L) / n < 0.2)
    // content-keyed: identical texts land in the same split
    val dupSplits = once.groupBy("text")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(dupSplits.count() === 0)
  }

  test("chunking covers every token, honors overlap, keeps short tails") {
    import spark.implicits._
    val one = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    // size 4, overlap 1, stride 3: 10 tokens -> ceil((10-1)/3) = 3 chunks
    val chunks = CorpusOps.chunkTokens(one, chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(4, 4, 4))
    // a doc shorter than one chunk still yields its (short) chunk
    val short = CorpusOps.chunkTokens(
      Seq((2L, "a b")).toDF("doc_id", "text"), chunkSize = 8).collect()
    assert(short.length === 1 && short.head.getAs[String]("chunk_text") === "a b")
    // corpus-wide: zero-overlap chunk token counts sum to the token counts
    val total = CorpusOps.chunkTokens(docs, chunkSize = 32)
      .agg(sum("chunk_tokens")).head().getLong(0)
    val expected = docs.select(TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total === expected, "zero-overlap chunks must partition the tokens")
  }

  test("sequence packing: contiguous, budget-bounded, loses no chunks") {
    import spark.implicits._
    val chunks = CorpusOps.chunkTokens(docs, chunkSize = 32)
    val packed = CorpusOps.packSequences(chunks, budget = 256).cache()
    // no chunk lost or duplicated
    assert(packed.count() === chunks.count())
    val seqs = packed.groupBy("source", "seq_id")
      .agg(sum("chunk_tokens").as("n_tokens")).collect()
    // a sequence holds at least one chunk and overruns the budget by less
    // than one chunk (whole-chunk granularity)
    seqs.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n < 256 + 32, s"sequence exceeds budget + chunk: $n")
    }
    // within a (source, seq_id), chunks are contiguous in (doc_id, chunk_idx)
    // order: seq_id is non-decreasing along the pack order
    val mono = packed.orderBy("source", "doc_id", "chunk_idx")
      .select("source", "seq_id").collect()
      .foldLeft((Option.empty[String], -1L, true)) {
        case ((src, last, ok), row) =>
          val s2 = row.getString(0); val id = row.getLong(1)
          if (src.contains(s2)) (src, id, ok && id >= last)
          else (Some(s2), id, ok)
      }
    assert(mono._3, "seq_id not monotone within a source's pack order")
    // deterministic across runs
    val again = CorpusOps.packSequences(chunks, budget = 256)
      .select("source", "doc_id", "chunk_idx", "seq_id").collect().toSet
    assert(again === packed
      .select("source", "doc_id", "chunk_idx", "seq_id").collect().toSet)
  }

  test("best-fit packing: budget is a HARD bound, no chunk lost, near-optimal") {
    val chunks = CorpusOps.chunkTokens(docs, chunkSize = 32)
    val packed = CorpusOps.packSequencesBestFit(chunks, budget = 256).cache()
    // every chunk appears exactly once
    assert(packed.count() === chunks.count())
    assert(packed.select("doc_id", "chunk_idx").distinct().count() ===
      chunks.count())
    val seqs = packed.groupBy("source", "seq_id")
      .agg(sum("chunk_tokens").as("n_tokens")).cache()
    // unlike the greedy pack, NO sequence exceeds the budget
    assert(seqs.filter(col("n_tokens") > 256).count() === 0,
      "best-fit must never overrun the budget")
    // near-optimality: per source, sequences within FFD's 11/9·LB + 1 and a
    // fill factor no greedy-with-overflow pack is needed to reach
    val bySource = packed.groupBy("source")
      .agg(sum("chunk_tokens").as("total"),
        countDistinct("seq_id").as("n_seq")).collect()
    bySource.foreach { r =>
      val lb = math.ceil(r.getAs[Long]("total").toDouble / 256).toLong
      val n = r.getAs[Long]("n_seq")
      assert(n <= math.ceil(lb * 11.0 / 9.0).toLong + 1,
        s"source ${r.getString(0)}: $n sequences vs lower bound $lb")
      val fill = r.getAs[Long]("total").toDouble / (n * 256.0)
      info(f"source ${r.getString(0)}: $n seqs, fill ${fill * 100}%.1f%% (LB $lb)")
      assert(fill >= 0.85, f"fill factor $fill%.2f below 0.85")
    }
    // deterministic across runs
    val again = CorpusOps.packSequencesBestFit(chunks, budget = 256)
      .select("source", "doc_id", "chunk_idx", "seq_id").collect().toSet
    assert(again === packed
      .select("source", "doc_id", "chunk_idx", "seq_id").collect().toSet)
  }

  test("best-fit packing: oversize chunks isolate; tiny cells stay valid") {
    import spark.implicits._
    val odd = Seq(
      ("s", 1L, 0, 300), // larger than the budget — singleton sequence
      ("s", 2L, 0, 200), ("s", 3L, 0, 60), ("s", 4L, 0, 50),
      ("s", 5L, 0, 120), ("s", 6L, 0, 130), ("s", 7L, 0, 6))
      .toDF("source", "doc_id", "chunk_idx", "chunk_tokens")
    // cellSize 3 forces multiple cells — validity must survive cell cuts
    val packed = CorpusOps.packSequencesBestFit(odd, budget = 256, cellSize = 3)
      .cache()
    assert(packed.count() === 7)
    val seqTotals = packed.groupBy("source", "seq_id")
      .agg(sum("chunk_tokens").as("t"), count(lit(1)).as("c")).collect()
    // the oversize chunk is alone in its sequence; all other sequences obey
    // the budget
    val over = packed.filter(col("doc_id") === 1L).select("seq_id").head().getLong(0)
    seqTotals.foreach { r =>
      if (r.getLong(1) == over) assert(r.getLong(3) === 1L,
        "oversize chunk must sit alone in its sequence")
      else assert(r.getLong(2) <= 256L,
        s"sequence ${r.getLong(1)} exceeds budget: ${r.getLong(2)}")
    }
  }

  test("weighted sampling is deterministic, per-source, and hash-consistent") {
    val sampled = CorpusOps.sampleWeighted(docs,
      Map("src0" -> 30, "src1" -> 0)).cache()
    // src1 fully dropped, src0 thinned, everything else untouched
    assert(sampled.filter(col("source") === "src1").count() === 0)
    val src0Full = docs.filter(col("source") === "src0").count()
    val src0Kept = sampled.filter(col("source") === "src0").count()
    assert(src0Kept < src0Full, "weight 30 must drop some src0 docs")
    val others = docs.filter(!col("source").isin("src0", "src1")).count()
    assert(sampled.filter(!col("source").isin("src0", "src1")).count() === others)
    // the survivor set is exactly the bucket rule (same hash as withSplit)
    val bad = sampled.filter(col("source") === "src0")
      .filter(CorpusOps.hashBucket(col("text")) >= 30)
    assert(bad.count() === 0)
  }

  test("exact stratified sample takes min(n, stratum size) per stratum, reproducibly") {
    val n = 5
    val picked = CorpusOps.sampleStratifiedExact(docs, n, stratumCol = "lang")
    val perStratum = picked.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, total) =>
      assert(perStratum(lang) === math.min(n.toLong, total),
        s"stratum $lang: want min($n, $total), got ${perStratum(lang)}")
    }
    // pick_order is dense 1..n within each stratum
    val orders = picked.groupBy("lang")
      .agg(min("pick_order").as("lo"), max("pick_order").as("hi"),
        count(lit(1)).as("c")).collect()
    orders.foreach { r =>
      assert(r.getLong(1) === 1L && r.getLong(2) === r.getLong(3))
    }
    // deterministic: a second run picks the identical set
    val again = CorpusOps.sampleStratifiedExact(docs, n, stratumCol = "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === picked.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tf-idf ranks rare terms above ubiquitous ones at equal tf") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "common rare1 common filler"),
      (2L, "common rare2 other filler"),
      (3L, "common words only here")).toDF("doc_id", "text")
    val top = CorpusOps.tfIdfTopK(tiny, k = 2)
    // every doc contributes exactly k rows (docs have >= 2 distinct terms)
    assert(top.groupBy("doc_id").count().collect().forall(_.getLong(1) === 2))
    // 'common' (df=3) can never outrank a doc-unique term (df=1) at tf=1
    val doc1 = top.filter(col("doc_id") === 1).select("term")
      .collect().map(_.getString(0)).toSet
    assert(doc1.contains("rare1"))
    assert(!doc1.contains("common"), s"ubiquitous term won top-2: $doc1")
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val flagged = CorpusOps.contaminated(corpus, bench, n = 4)
    // cross-check one flagged doc really shares a 4-gram
    val row = flagged.orderBy(desc("n_shared_shingles")).head()
    val docShingles = corpus.filter(col("doc_id") === row.getLong(0))
      .select(explode(TextFunctions.tokenShingles(col("text"), 4)).as("g"))
      .collect().map(_.getString(0)).toSet
    val benchShingles = bench
      .select(explode(TextFunctions.tokenShingles(col("text"), 4)).as("g"))
      .collect().map(_.getString(0)).toSet
    val shared = docShingles.intersect(benchShingles)
    assert(shared.size.toLong === row.getLong(1))
    // a doc made of fresh vocabulary is never flagged
    import spark.implicits._
    val clean = Seq((9999L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    assert(CorpusOps.contaminated(clean, bench, n = 4).count() === 0)
  }

  test("bloom-prefiltered contamination equals the exact semi-join") {
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val exact = CorpusOps.contaminated(corpus, bench, n = 4)
    val bloom = CorpusOps.contaminatedBloom(corpus, bench, n = 4)
    // identical output: the confirm join strips Bloom false positives
    assert(bloom.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(bloom).count() === 0)
    // the probe is present as a predicate in the plan (scan-stage filter)
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // a sanity corner: tiny fpp=0.5 filter still yields exact results
    val sloppy = CorpusOps.contaminatedBloom(corpus, bench, n = 4, fpp = 0.5)
    assert(sloppy.exceptAll(exact).count() === 0)
  }

  test("temperature mix keeps all of the smallest source, sqrt-downsamples larger ones") {
    import spark.implicits._
    // synthetic 16x skew (the fixture's sources are balanced): texts vary
    // so the content-hash buckets spread
    val skewed = (
      (1 to 10).map(i => (s"tiny doc $i", "tiny")) ++
      (1 to 40).map(i => (s"mid doc content $i", "mid")) ++
      (1 to 160).map(i => (s"big corpus doc number $i", "big"))
    ).toDF("text", "source")
    val kept = CorpusOps.sampleTemperature(skewed)
    val after = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // smallest source: threshold floor(1e6 * 1.0) clears every bucket
    assert(after("tiny") === 10L)
    // larger sources: keep within binomial noise of n * sqrt(nMin/n)
    Map("mid" -> 40L, "big" -> 160L).foreach { case (s, n) =>
      val expect = n * math.sqrt(10.0 / n)
      val tol = 4 * math.sqrt(expect) + 3
      assert(math.abs(after.getOrElse(s, 0L) - expect) <= tol,
        s"source $s kept ${after.getOrElse(s, 0L)}, expected ~$expect")
    }
    // and the mix actually flattened: big was 16x tiny, now under 4.5x
    assert(after("big").toDouble / after("tiny") < 4.5)
    // deterministic: same input, same sample
    assert(CorpusOps.sampleTemperature(skewed).select("text")
      .exceptAll(kept.select("text")).count() === 0)
    // alpha=1 is a no-op mix
    assert(CorpusOps.sampleTemperature(skewed, alpha = 1.0).count() === skewed.count())
    // alpha=0 fully balances in expectation: big keeps ~nMin
    val balanced = CorpusOps.sampleTemperature(skewed, alpha = 0.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(balanced("big") <= 10L + 4 * math.sqrt(10.0) + 3)
  }

  test("segment dedup drops exactly the shared segments and rebuilds in order") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d e f"),   // shares [a b c] with doc 2, tail unique
      (2L, "a b c x y z"),   // shares [a b c] with doc 1
      (3L, "p q r s t u"),   // fully unique
      (4L, "a b c a b c"),   // the shared segment twice: both copies drop
      (5L, "")               // empty text survives as one empty segment
    ).toDF("doc_id", "text")
    val byId = CorpusOps.dropRepeatedSegments(fixture, width = 3, maxDf = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(1L) === (("d e f", 1L, 2L)))
    assert(byId(2L) === (("x y z", 1L, 2L)))
    assert(byId(3L) === (("p q r s t u", 2L, 2L)))
    // doc 4: "a b c" has df=3 (docs 1, 2, 4) — both its copies drop
    assert(byId(4L) === (("", 0L, 2L)))
    // empty doc: its single empty segment is unique (df=1) -> kept
    assert(byId(5L) === (("", 1L, 1L)))
    assert(byId.size === 5)
    // raising maxDf above the observed df keeps everything
    val loose = CorpusOps.dropRepeatedSegments(fixture, width = 3, maxDf = 3)
    assert(loose.filter(col("n_kept") =!= col("n_total")).count() === 0)
  }

  test("shuffleShard: lossless, balanced, contiguous ranks, epoch reshuffles") {
    val docs = graft.Tables.documents(spark, sfSmall)
    val n = docs.count()
    val sharded = CorpusOps.shuffleShard(docs, nShards = 16).cache()
    assert(sharded.count() === n, "sharding lost or duplicated documents")
    // every shard id in range; hash-uniform balance within loose bounds
    val perShard = sharded.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perShard.keySet.forall(s => s >= 0 && s < 16))
    assert(perShard.values.max <= 3 * (n / 16).max(1),
      s"shard skew beyond hash-uniform bounds: $perShard")
    // ord is a contiguous 1..count rank inside each shard
    val ranks = sharded.groupBy("shard")
      .agg(count(lit(1)).as("c"), min(col("ord")).as("lo"),
        max(col("ord")).as("hi"), countDistinct(col("ord")).as("d"))
      .collect()
    ranks.foreach { r =>
      assert(r.getAs[Long]("lo") === 1L)
      assert(r.getAs[Int]("hi").toLong === r.getAs[Long]("c"))
      assert(r.getAs[Long]("d") === r.getAs[Long]("c"))
    }
    // deterministic: a rerun reproduces identical (doc, shard, ord)
    val again = CorpusOps.shuffleShard(docs, nShards = 16)
    assert(again.exceptAll(sharded).isEmpty && sharded.exceptAll(again).isEmpty)
    // a different epoch is a genuinely different permutation
    val epoch1 = CorpusOps.shuffleShard(docs, nShards = 16, epoch = 1)
    val moved = epoch1.select("doc_id", "shard")
      .exceptAll(sharded.select("doc_id", "shard")).count()
    assert(moved > n / 2, s"epoch salt barely reshuffled ($moved of $n moved)")
    sharded.unpersist()
  }

  test("sampleTokenBudget: two-phase == naive window, budget respected") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sfSmall)
    val budget = 800L
    val got = CorpusOps.sampleTokenBudget(docs, budget)
      .select("doc_id", "source", "n_tokens").cache()
    // the naive form: one cumulative-sum window per whole group over the
    // SAME total order (bucket, hash, id)
    val h = md5(col("text"))
    val naive = docs
      .withColumn("__h", h)
      .withColumn("__bkt", pmod(conv(substring(col("__h"), 9, 8), 16, 10)
        .cast("long"), lit(256L)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("long"))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col("source"))
          .orderBy(col("__bkt"), col("__h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__cum") < budget)
      .select("doc_id", "source", "n_tokens")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-phase kept set differs from the naive single-window form")
    // each group spends less than budget before its last kept doc: total
    // kept tokens < budget + the largest single document (overshoot <= 1)
    val maxDoc = docs.select(max(TextFunctions.tokenCount(col("text"))))
      .head().getInt(0).toLong
    got.groupBy("source").agg(sum("n_tokens").as("spent"))
      .collect().foreach { r =>
        assert(r.getLong(1) < budget + maxDoc,
          s"${r.getString(0)} overshot: ${r.getLong(1)}")
      }
    // a budget above any group's total keeps every document
    val all = CorpusOps.sampleTokenBudget(docs, 1000000L)
    assert(all.count() === docs.count())
    got.unpersist()
  }

  test("sampleTokenBudget excludes NULL group/content rows by stated policy") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "srcA", "alpha beta gamma"),
      (2L, null.asInstanceOf[String], "null source text"),
      (3L, "srcA", null.asInstanceOf[String]),
      (4L, "srcA", "delta epsilon")
    ).toDF("doc_id", "source", "text")
    val kept = CorpusOps.sampleTokenBudget(mixed, 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // null-source and null-text rows are excluded — a CONTRACT, not a join
    // accident; everything else fits the generous budget
    assert(kept === Set(1L, 4L))
  }

  test("shard manifest describes the shuffle layout; digest flags any content change") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfSmall)
    val manifest = CorpusOps.shardManifest(docs, nShards = 16)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // counts agree with the actual shuffleShard layout, shard by shard
    val layoutCounts = CorpusOps.shuffleShard(docs, nShards = 16)
      .groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(manifest.view.mapValues(_._1).toMap === layoutCounts)
    assert(manifest.values.map(_._1).sum === docs.count())
    // deterministic across reruns
    val again = CorpusOps.shardManifest(docs, nShards = 16)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === manifest)
    // mutate ONE document: exactly that document's shard digests change
    val one = docs.select("doc_id", "text").as[(Long, String)].head()
    val mutated = docs.withColumn("text",
      when(col("doc_id") === one._1, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val after = CorpusOps.shardManifest(mutated, nShards = 16)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val changed = manifest.keySet.filter(s => manifest(s) != after.getOrElse(s, (0L, 0L, 0L)))
    assert(changed.nonEmpty && changed.size <= 2,
      s"one mutated doc should touch at most its old and new shard: $changed")
  }

  test("dsir weights separate target-like from off-target documents") {
    import spark.implicits._
    // target docs draw from vocabulary A, off-target from B; every doc is
    // scored against the target distribution estimated from the A slice
    val a = Seq("alpha beta gamma delta", "beta gamma delta alpha",
      "gamma alpha beta delta")
    val b = Seq("omega psi chi phi", "psi chi phi omega", "chi omega psi phi")
    val mixed = "alpha beta omega psi" // half target-like
    val docs = (a ++ b :+ mixed).zipWithIndex
      .map { case (t, i) => (i.toLong, t, i < a.length) }
      .toDF("doc_id", "text", "tgt")
    val w = CorpusOps.dsirWeights(docs, isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    val aW = (0 until 3).map(i => w(i.toLong)._3)
    val bW = (3 until 6).map(i => w(i.toLong)._3)
    assert(aW.min > bW.max,
      s"every target doc must out-score every off-target doc: $aW vs $bW")
    // the mixed doc sits strictly between the two blocks
    assert(w(6L)._3 < aW.min && w(6L)._3 > bW.max)
    // n_feats = tokens - 1 for every doc here (all have >= 2 tokens)
    assert(w.values.forall(_._2 === 3L))
    assert(w.values.count(_._1) === 3)
  }

  test("dsir: sub-bigram documents surface with zero features, not vanish") {
    import spark.implicits._
    val docs = Seq((1L, "solo", true), (2L, "two tokens", true),
      (3L, "", false)).toDF("doc_id", "text", "tgt")
    val w = CorpusOps.dsirWeights(docs, isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(w.keySet === Set(1L, 2L, 3L))
    assert(w(1L) === ((0L, 0.0)) && w(3L) === ((0L, 0.0)))
    assert(w(2L)._1 === 1L)
  }

  test("dsir resample: Gumbel-top-k is deterministic, k-bounded, weight-tilted") {
    import spark.implicits._
    // 10 high-weight docs and 90 near-zero docs; a weight gap of 100 dwarfs
    // Gumbel noise (|g| rarely exceeds ~6), so at T=1 the draw must pick
    // exactly the high block; at T=1000 the weights flatten and the draw is
    // Gumbel-dominated (some low-weight docs appear)
    val docs = (0 until 100).map { i =>
      (i.toLong, s"document number $i with its own text", if (i < 10) 100.0 else 0.0)
    }.toDF("doc_id", "text", "dsir_weight")
    val sharp = CorpusOps.dsirResample(docs, k = 10)
    assert(sharp.count() === 10)
    assert(sharp.select("doc_id").as[Long].collect().toSet === (0L until 10L).toSet)
    // deterministic: the same draw twice; a new epoch redraws
    val again = CorpusOps.dsirResample(docs, k = 10)
      .select("doc_id", "sample_key").collect().toSet
    assert(again === sharp.select("doc_id", "sample_key").collect().toSet)
    val flat = CorpusOps.dsirResample(docs, k = 10, temperature = 1000.0)
      .select("doc_id").as[Long].collect().toSet
    assert(flat.exists(_ >= 10L), "high temperature must flatten the draw")
    val redraw = CorpusOps.dsirResample(docs, k = 10, temperature = 1000.0,
      epoch = 1).select("doc_id").as[Long].collect().toSet
    assert(redraw !== flat, "epoch change must redraw")
  }

  test("attrition waterfall: stages partition the corpus and 'kept' equals the pipeline output") {
    val att = CorpusOps.cleanAttrition(docs).collect()
    // every document lands in exactly one stage bucket
    assert(att.map(_.getLong(2)).sum === docs.count())
    assert(att.map(_.getString(1)).toSet.subsetOf(
      Set("quality", "lang", "dedup", "kept")))
    // the kept bucket IS the cleaning pipeline's output, source by source
    val kept = att.filter(_.getString(1) == "kept")
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val pipeline = graft.SparkEntry.queries("corpus_clean_pipeline")(spark, sfTiny)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept === pipeline,
      s"attrition 'kept' diverged from the pipeline: $kept vs $pipeline")
  }

  test("attrition waterfall: duplicate survivors attribute to 'dedup', keeping the lowest id") {
    import spark.implicits._
    // a text that clears the quality floor and language-agreement gate
    val good = ("the quick brown fox and the lazy dog walk to the park " +
      "and they look at the trees for a while in the morning sun " +
      "and then the two of them walk on to the river in the valley") * 3
    val rows = Seq(
      (1L, "s", "en", good, good.length.toLong),  // kept (first survivor)
      (2L, "s", "en", good, good.length.toLong),  // dedup (same text, later id)
      (3L, "s", "en", "x", 1L))                   // quality
    val att = CorpusOps.cleanAttrition(
        rows.toDF("doc_id", "source", "lang", "text", "n_chars"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(att === Map("kept" -> 1L, "dedup" -> 1L, "quality" -> 1L),
      s"unexpected attrition: $att")
  }

  test("repeated spans: alignment-independent detection and interval merge") {
    import spark.implicits._
    val docs = Seq(
      // "a b c d e f" (6 tokens) repeats in doc 2 at a DIFFERENT alignment
      // (offset 2) — two overlapping width-5 windows merge into one span
      (1L, "a b c d e f x1 y1"),
      (2L, "p q a b c d e f r s"),
      // doc 3 repeats nothing
      (3L, "u v w aa bb cc dd ee"),
      // docs 4+5 share TWO disjoint 5-gram runs -> two spans each
      (4L, "m1 m2 m3 m4 m5 zz1 zz2 n1 n2 n3 n4 n5"),
      (5L, "m1 m2 m3 m4 m5 qq1 qq2 n1 n2 n3 n4 n5"))
      .toDF("doc_id", "text")
    val r = CorpusOps.repeatedSpans(docs, width = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // doc 1: positions 0,1 marked -> one merged span covering tokens 0..5
    assert(r(1L) === ((8L, 1L, 6L, 6L)))
    // doc 2: same 6-token run marked at positions 2,3 despite the offset
    assert(r(2L) === ((10L, 1L, 6L, 6L)))
    assert(r(3L) === ((8L, 0L, 0L, 0L)))
    // docs 4/5: two disjoint 5-token spans, never merged across the gap
    assert(r(4L) === ((12L, 2L, 10L, 5L)))
    assert(r(5L) === ((12L, 2L, 10L, 5L)))
  }

  test("repeated spans: exact adjacency merges; a width-1 gap does not") {
    import spark.implicits._
    // shared run of 10 tokens: windows at 0..5 all marked, one span of 10
    val run10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, run10), (2L, run10 + " tailA tailB"),
      // marked windows at positions 0 and 6 (gap 6 > width 5): two spans
      (3L, "g1 g2 g3 g4 g5 only3 h1 h2 h3 h4 h5"),
      (4L, "g1 g2 g3 g4 g5 only4 h1 h2 h3 h4 h5"))
      .toDF("doc_id", "text")
    val r = CorpusOps.repeatedSpans(docs, width = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) === ((1L, 10L, 10L)))
    assert(r(2L) === ((1L, 10L, 10L)))
    assert(r(3L) === ((2L, 10L, 5L)))
    assert(r(4L) === ((2L, 10L, 5L)))
  }

  test("weighted-k sample excludes null id/content rows (a NULL key would WIN the draw)") {
    import spark.implicits._
    // a null content hash yields a NULL es_key, which sorts FIRST under
    // the ascending draw order — without the filter these rows don't just
    // leak in, they displace every legitimate doc
    val rows = Seq(
      (java.lang.Long.valueOf(1L), "alpha", java.lang.Long.valueOf(10L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[String],
        java.lang.Long.valueOf(99L)),
      (null.asInstanceOf[java.lang.Long], "delta",
        java.lang.Long.valueOf(99L)),
      (java.lang.Long.valueOf(4L), "omega", java.lang.Long.valueOf(3L)))
      .toDF("doc_id", "text", "w")
    val got = CorpusOps.sampleWeightedK(rows, k = 2, weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L),
      s"null id/content rows must be excluded from the draw, got $got")
  }

  test("weighted-k sample: E-S keys match a hand replay; weight doubles, key halves") {
    import spark.implicits._
    val fix = Seq((1L, "alpha beta", 10L), (2L, "gamma delta", 20L),
      (3L, "epsilon zeta", 5L)).toDF("doc_id", "text", "w")
    val got = CorpusOps.sampleWeightedK(fix, k = 3, weightCol = "w")
      .select("doc_id", "es_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay the key driver-side: u from the md5 prefix, key = -ln(u)/w
    def key(text: String, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      -math.log(u) / w
    }
    assert(got(1L) === key("alpha beta", 10L))
    assert(got(2L) === key("gamma delta", 20L))
    assert(got(3L) === key("epsilon zeta", 5L))
    // doubling a weight exactly halves the key (inclusion pressure is
    // proportional, not just monotone)
    val doubled = CorpusOps.sampleWeightedK(
        fix.withColumn("w", col("w") * 2), k = 3, weightCol = "w")
      .select("doc_id", "es_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(doubled(1L) === got(1L) / 2)
    // zero/negative/NULL weights are excluded; k caps the output
    val mixed = Seq((1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "b", java.lang.Long.valueOf(0L)),
      (3L, "c", java.lang.Long.valueOf(-4L)),
      (4L, "d", null.asInstanceOf[java.lang.Long])).toDF("doc_id", "text", "w")
    val kept = CorpusOps.sampleWeightedK(mixed, k = 10, weightCol = "w")
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // determinism + exact k on the real corpus; TakeOrdered, no full sort
    val s1 = CorpusOps.sampleWeightedK(docs, 50, "n_chars")
    assert(s1.count() === 50)
    assert(s1.select("doc_id").as[Long].collect().toSet ===
      CorpusOps.sampleWeightedK(docs, 50, "n_chars")
        .select("doc_id").as[Long].collect().toSet)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted-k must plan as TakeOrdered, not a global sort:\n$plan")
  }

  test("strip repeated spans: removes cross-doc repeats at any alignment, keeps the rest") {
    import spark.implicits._
    val fix = Seq(
      // the shared 5-run "A B C D E" sits at DIFFERENT offsets — the
      // fixed-grid segment form would miss one of these alignments
      (1L, "u1 u2 A B C D E u3"),
      (2L, "v1 A B C D E v2 v3"),
      (3L, "w1 w2 w3 w4 w5 w6"), // repeats nothing
      (4L, "s1 s2"))             // shorter than width → kept whole
      .toDF("doc_id", "text")
    val r = CorpusOps.stripRepeatedSpans(fix, width = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("u1 u2 u3", 3L, 8L)))
    assert(r(2L) === (("v1 v2 v3", 3L, 8L)))
    assert(r(3L) === (("w1 w2 w3 w4 w5 w6", 6L, 6L)))
    assert(r(4L) === (("s1 s2", 2L, 2L)))
    // a doc that is ENTIRELY a repeat survives as the empty string
    val dup = Seq((1L, "X Y Z W Q"), (2L, "X Y Z W Q")).toDF("doc_id", "text")
    val d = CorpusOps.stripRepeatedSpans(dup, width = 5)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(d === Map(1L -> "", 2L -> ""))
  }

  test("strip repeated spans: removal count equals the detector's covered_tokens") {
    // the act half must strip EXACTLY the tokens the measure half reports
    // covered, doc for doc, on the real corpus
    val stripped = CorpusOps.stripRepeatedSpans(docs, width = 5)
      .select(col("doc_id"), (col("n_tokens") - col("n_kept")).as("removed"))
    val measured = CorpusOps.repeatedSpans(docs, width = 5)
      .select(col("doc_id"), col("covered_tokens"))
    val mismatch = stripped.join(measured, "doc_id")
      .filter(col("removed") =!= col("covered_tokens"))
    assert(mismatch.count() === 0)
    assert(stripped.count() === docs.count())
  }

  test("snapshotDiff classifies every id into exactly one status") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    val curr = Seq((2L, "b"), (3L, "c-revised"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = CorpusOps.snapshotDiff(prev, curr)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff against itself is all-unchanged; against empty, all-removed") {
    import spark.implicits._
    val self = CorpusOps.snapshotDiff(docs, docs)
    assert(self.filter(col("status") =!= "unchanged").count() === 0)
    assert(self.count() === docs.count())
    val empty = docs.filter(lit(false))
    val gone = CorpusOps.snapshotDiff(docs, empty)
    assert(gone.filter(col("status") =!= "removed").count() === 0)
    assert(CorpusOps.snapshotDiff(empty, docs)
      .filter(col("status") =!= "added").count() === 0)
  }
}
