package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SQL function surface: the same codegen'd kernels the DataFrame API
  * uses, reachable from plain `spark.sql`. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("cosine_similarity is callable from SQL and matches the column API") {
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sqlV = spark.sql("SELECT cosine_similarity(a, b) AS c FROM vecs")
      .as[Double].head()
    val colV = spark.table("vecs")
      .select(graft.functions.Similarity.cosineFast(col("a"), col("b")))
      .as[Double].head()
    assert(sqlV === colV)
    assert(math.abs(sqlV - 10.0 / 14.0) < 1e-12)
    // zero-norm contract carries over
    assert(spark.sql(
      "SELECT cosine_similarity(array(0.0F, 0.0F), array(1.0F, 1.0F))")
      .as[Double].head() === 0.0)
  }

  test("shingle_hashes is callable from SQL, n must be a literal") {
    val sqlH = spark.sql("SELECT shingle_hashes('one two three four', 3) AS h")
      .as[Seq[Long]].head()
    val colH = Seq("one two three four").toDF("text")
      .select(graft.functions.TextFunctions.shingleHashesAll(col("text"), 3))
      .as[Seq[Long]].head()
    assert(sqlH === colH)
    assert(sqlH.length === 2)
    // foldable n is accepted (constant-folds at analysis)
    assert(spark.sql("SELECT shingle_hashes('a b c', 1 + 1) AS h")
      .as[Seq[Long]].head().length === 2)
    // a per-row (non-foldable) n must be rejected
    Seq(("a b", 2)).toDF("text", "n").createOrReplaceTempView("sh_args")
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, n) FROM sh_args").collect()
    }
    assert(err.getMessage.contains("literal") ||
      Option(err.getCause).exists(_.getMessage.contains("literal")))
  }

  test("minhash_signature is callable from SQL and matches the native column form") {
    val sqlSig = spark.sql(
      "SELECT minhash_signature(shingle_hashes('one two three four five', 3), 8) AS s")
      .as[Seq[Long]].head()
    val colSig = Seq("one two three four five").toDF("text")
      .select(graft.functions.expressions.TextExpressions.minhashSignatureNative(
        graft.functions.TextFunctions.shingleHashes(col("text"), 3), 8))
      .as[Seq[Long]].head()
    assert(sqlSig === colSig)
    assert(sqlSig.length === 8)
    // a per-row (non-foldable) k must be rejected
    Seq(("a b c d", 4)).toDF("text", "k").createOrReplaceTempView("mh_args")
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(shingle_hashes(text, 2), k) FROM mh_args")
        .collect()
    }
    assert(err.getMessage.contains("literal") ||
      Option(err.getCause).exists(_.getMessage.contains("literal")))
  }

  test("hamming64 matches the Dedup column helper") {
    val df = Seq((0x0F0FL, 0x00FFL)).toDF("a", "b")
    df.createOrReplaceTempView("hs")
    val sqlV = spark.sql("SELECT hamming64(a, b) FROM hs").head().getInt(0)
    val colV = df.select(
      graft.functions.Dedup.hammingDistance(col("a"), col("b")))
      .head().getInt(0)
    assert(sqlV === colV)
    assert(sqlV === 8) // 0x0F0F ^ 0x00FF = 0x0FF0 -> 8 set bits
  }

  test("signature_agreement is callable from SQL and matches the native column form") {
    import graft.functions.expressions.VectorExpressions
    Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)))
      .toDF("a", "b").createOrReplaceTempView("sigs")
    val sqlV = spark.sql("SELECT signature_agreement(a, b) AS e FROM sigs")
      .as[Double].head()
    val colV = spark.table("sigs")
      .select(VectorExpressions.agreementNative(col("a"), col("b")))
      .as[Double].head()
    assert(sqlV === colV)
    assert(sqlV === 0.5)
  }

  test("collect_top_k is callable from SQL: largest-k, best-first, k-bounded") {
    Tables.orders(spark, sfTiny).createOrReplaceTempView("ctk_orders")
    val top = spark.sql(
      """SELECT o_custkey, collect_top_k(struct(o_totalprice, o_orderkey), 2, false) AS top
        |FROM ctk_orders GROUP BY o_custkey""".stripMargin)
      .selectExpr("o_custkey", "inline(top)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = Tables.orders(spark, sfTiny)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_totalprice", "o_orderkey")
    assert(top.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(top).count() === 0)
    // reverse=true flips to smallest-k
    val least = spark.sql(
      """SELECT collect_top_k(struct(o_totalprice, o_orderkey), 1, true)[0].o_totalprice
        |FROM ctk_orders""".stripMargin).as[Double].head()
    val trueMin = Tables.orders(spark, sfTiny)
      .agg(min("o_totalprice")).as[Double].head()
    assert(least === trueMin)
    // k must be a literal
    val err = intercept[Exception] {
      spark.sql("SELECT collect_top_k(struct(o_totalprice), o_orderkey, false) FROM ctk_orders").collect()
    }
    assert(err.getMessage.contains("literal") ||
      Option(err.getCause).exists(_.getMessage.contains("literal")))
  }

  test("int8_quantize is callable from SQL and matches the column form") {
    Seq((1L, Seq(1.0f, -0.02f, 0.02f, -1.0f))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("qvecs")
    val sql = spark.sql(
      "SELECT int8_quantize(embedding).qvec AS q, " +
        "int8_quantize(embedding).scale AS s FROM qvecs").head()
    val col = graft.functions.Quantize.toInt8(spark.table("qvecs")).head()
    assert(sql.getSeq[Byte](0) === col.getSeq[Byte](1))
    assert(sql.getFloat(1) === col.getFloat(2))
    assert(sql.getSeq[Byte](0) === Seq[Byte](127, -3, 3, -127))
  }

  test("top_freq_frac is callable from SQL and matches the scan-local signal") {
    // 4 of 6 elements are the same value -> 4/6
    val frac = spark.sql(
      "SELECT top_freq_frac(array(7L, 7L, 7L, 7L, 1L, 2L)) AS f")
      .as[Double].head()
    assert(math.abs(frac - 4.0 / 6.0) < 1e-12)
    assert(spark.sql("SELECT top_freq_frac(CAST(array() AS ARRAY<BIGINT>))")
      .as[Double].head() === 0.0)
  }

  test("hilbert_index is callable from SQL and matches the column form") {
    val sqlD = spark.sql("SELECT hilbert_index(5L, 9L, 8) AS d")
      .as[Long].head()
    val colD = Seq((5L, 9L)).toDF("a", "b")
      .select(graft.sources.ZOrder.hilbert2(col("a"), col("b"), 8))
      .as[Long].head()
    assert(sqlD === colD)
    assert(sqlD ===
      graft.functions.expressions.HilbertIndex.compute(5L, 9L, 8))
    // order is a literal contract, like shingle_hashes' n
    Seq((1L, 2L, 3)).toDF("a", "b", "o").createOrReplaceTempView("hv")
    val err = intercept[Exception] {
      spark.sql("SELECT hilbert_index(a, b, o) FROM hv").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("the SparkSessionExtensions injection registers the same builders") {
    // the hook the driver-facing config path (spark.sql.extensions) runs:
    // apply it to a fresh SparkSessionExtensions and verify every function
    // lands in a registry through the same injection list
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // a query built from each injected builder must evaluate correctly
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      assert(info.getName === id.funcName)
      assert(info.getUsage.nonEmpty, s"${id.funcName} has no usage doc")
    }
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cos = GraftExtensions.functions.find(_._1.funcName == "cosine_similarity").get._3
    val vec = Literal.create(Seq(1.0f, 0.0f), ArrayType(FloatType, containsNull = false))
    assert(cos(Seq(vec, vec)).eval(null).asInstanceOf[Double] === 1.0)
  }
}
