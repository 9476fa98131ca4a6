package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based property tests: each operator is re-implemented in plain
  * Scala collections (the "model") and the DataFrame result must match it
  * EXACTLY on generated corpora — boundary shapes (empty docs, all-dup
  * corpora, single-token tails, mega-groups) arise from generation instead
  * of hand-picked fixtures. Deterministic seeds (the house scalacheck
  * pattern — raw generators, no runner) keep every run identical; sizes
  * stay small because every case is a Spark job. */
class CorpusPropertySpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Seq("a", "b", "c", "d", "e", "f")
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private def cases[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => g(Gen.Parameters.default, Seed(seed + i)).get)

  // --- dropRepeatedSegments ------------------------------------------------

  /** The operator's contract, in collections: fixed-width token windows,
    * drop any segment text occurring in > maxDf distinct docs, rebuild. */
  private def segModel(docs: Seq[(Long, String)], width: Int, maxDf: Int)
    : Map[Long, (String, Long, Long)] = {
    def segs(t: String): Seq[String] = {
      val toks = t.split(" ", -1).toSeq
      val n = math.max(1, math.ceil(toks.size.toDouble / width).toInt)
      (0 until n).map(i => toks.slice(i * width, i * width + width).mkString(" "))
    }
    val df = docs.flatMap { case (id, t) => segs(t).map(s => (s, id)) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    docs.map { case (id, t) =>
      val all = segs(t)
      val kept = all.filter(s => df(s) <= maxDf)
      id -> ((kept.mkString(" "), kept.size.toLong, all.size.toLong))
    }.toMap
  }

  test("property: dropRepeatedSegments == the collections model") {
    val gen = for {
      n     <- Gen.chooseNum(1, 16)
      texts <- Gen.listOfN(n, genDoc)
      width <- Gen.chooseNum(1, 4)
      maxDf <- Gen.chooseNum(1, 3)
    } yield (texts, width, maxDf)
    cases(gen, 10, seed = 11L).foreach { case (texts, width, maxDf) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = CorpusOps.dropRepeatedSegments(
          docs.toDF("doc_id", "text"), width = width, maxDf = maxDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(out === segModel(docs, width, maxDf),
        s"diverged at width=$width maxDf=$maxDf docs=$docs")
    }
  }

  // --- sampleTemperature ---------------------------------------------------

  private def md5Bucket(text: String, buckets: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex8 = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex8, 16) % buckets
  }

  test("property: sampleTemperature == the threshold model") {
    val gen = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("s0", "s1", "s2"), genDoc)))
    cases(gen, 10, seed = 23L).foreach { rows =>
      // suffix an index so texts are distinct: duplicate content across
      // groups would make the content-hash gate legitimately
      // group-dependent and the model needlessly fiddly
      val docs = rows.zipWithIndex.map { case ((g, t), i) => (g, s"$t x$i") }
      val counts = docs.groupBy(_._1).map { case (g, xs) => g -> xs.size }
      val nMin = counts.values.min
      val expect = docs.filter { case (g, t) =>
        md5Bucket(t, 1000000L) <
          math.floor(1000000.0 * math.sqrt(nMin.toDouble / counts(g))).toLong
      }.map(_._2).toSet
      val got = CorpusOps.sampleTemperature(
          docs.toDF("source", "text"), groupCol = "source")
        .select("text").as[String].collect().toSet
      assert(got === expect, s"diverged on $docs")
    }
  }

  // --- topKPerGroup --------------------------------------------------------

  test("property: topKPerGroup == the sorted-take model") {
    val gen = for {
      n    <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(-5, 5).map(_ * 0.5)))
      k    <- Gen.chooseNum(1, 4)
    } yield (rows, k)
    cases(gen, 10, seed = 37L).foreach { case (rows, k) =>
      val docs = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val model = docs.groupBy(_._1).flatMap { case (g, xs) =>
        xs.sortBy { case (_, v, id) => (-v, id) }.take(k).zipWithIndex
          .map { case ((_, v, id), r) => (g, r + 1, v, id) }
      }.toSet
      val got = graft.operators.TopK.topKPerGroup(
          docs.toDF("g", "v", "id"),
          groupCols = Seq("g"),
          ordCols = Seq(col("v"), (-col("id")).as("__tb")),
          payload = Seq(col("id")), k = k)
        .select(col("g"), col("rank"), col("v"), col("id"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(got === model, s"diverged at k=$k rows=$docs")
    }
  }

  // --- shuffleShard / sampleTokenBudget ------------------------------------

  private def md5Hex(text: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("property: shuffleShard == the salted-hash rank model") {
    val gen = for {
      n       <- Gen.chooseNum(1, 24)
      texts   <- Gen.listOfN(n, genDoc)
      nShards <- Gen.chooseNum(1, 6)
      epoch   <- Gen.chooseNum(0, 2)
    } yield (texts, nShards, epoch)
    cases(gen, 10, seed = 41L).foreach { case (texts, nShards, epoch) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val hashed = docs.map { case (id, t) =>
        val h = md5Hex(s"$epoch:$t")
        (id, h, (java.lang.Long.parseLong(h.substring(0, 8), 16) % nShards).toInt)
      }
      val model = hashed.groupBy(_._3).flatMap { case (shard, xs) =>
        xs.sortBy { case (id, h, _) => (h, id) }.zipWithIndex
          .map { case ((id, _, _), r) => (id, shard, r + 1) }
      }.toSet
      val got = CorpusOps.shuffleShard(
          docs.toDF("doc_id", "text"), nShards, epoch)
        .select("doc_id", "shard", "ord")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got === model, s"diverged at nShards=$nShards epoch=$epoch docs=$docs")
    }
  }

  test("property: sampleTokenBudget == the prefix-rule model at small subBuckets") {
    val gen = for {
      n      <- Gen.chooseNum(1, 24)
      rows   <- Gen.listOfN(n, Gen.zip(Gen.oneOf("s0", "s1"), genDoc))
      budget <- Gen.chooseNum(1L, 40L)
      // 1-4 sub-buckets: tiny counts force every code path (whole-bucket
      // keep, whole-bucket drop, boundary window) to fire constantly
      buckets <- Gen.chooseNum(1, 4)
    } yield (rows, budget, buckets)
    cases(gen, 12, seed = 53L).foreach { case (rows, budget, buckets) =>
      // distinct texts, as in the temperature property (duplicate content
      // would tie the hash order and the model would need the id tiebreak
      // of the REAL order — which it has, but distinctness keeps the model
      // readable)
      val docs = rows.zipWithIndex.map { case ((g, t), i) =>
        (i.toLong, g, s"$t y$i") }
      val model = docs.groupBy(_._2).flatMap { case (_, xs) =>
        val ordered = xs.map { case (id, g, t) =>
          val h = md5Hex(t)
          val bkt = java.lang.Long.parseLong(h.substring(8, 16), 16) % buckets
          (id, g, t, bkt, h)
        }.sortBy { case (id, _, _, bkt, h) => (bkt, h, id) }
        var spent = 0L
        ordered.flatMap { case (id, g, t, _, _) =>
          val tok = t.split(" ", -1).length.toLong
          if (spent < budget) { spent += tok; Some((id, g, tok)) } else None
        }
      }.toSet
      val got = CorpusOps.sampleTokenBudget(
          docs.toDF("doc_id", "source", "text"), budget,
          subBuckets = buckets)
        .select("doc_id", "source", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === model,
        s"diverged at budget=$budget subBuckets=$buckets docs=$docs")
    }
  }
}
