package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int = 3)
      : Map[String, Double] =
    Graphs.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Driver-side reference power iteration (same quantization-free math —
    * compared within 1e-9, not bit-equality, since the operator quantizes
    * sums at 1e-12). */
  private def reference(edges: Seq[(String, String, Double)],
                        iters: Int, d: Double = 0.85)
      : Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (t, es) =>
        t -> es.map(e => r(e._1) * e._3 / outW(e._1)).sum
      }
      val dm = nodes.filterNot(outW.contains).map(r).sum
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (inflow.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  test("two-node cycle stays uniform at every iteration count") {
    for (k <- Seq(0, 1, 4)) {
      val r = ranksOf(Seq("a" -> "b", "b" -> "a"), iters = k)
      assert(r("a") === 0.5 && r("b") === 0.5)
    }
  }

  test("star: the hub out-ranks the spokes, mass sums to 1") {
    val r = ranksOf(Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub",
      "hub" -> "s1"))
    assert(r("hub") > r("s1"))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r("s2") === r("s3")) // symmetric spokes tie exactly
  }

  test("dangling node: mass is redistributed, total stays 1") {
    // b has no out-edges — without the dangling term the graph would
    // leak 85% of b's rank every iteration
    val r = ranksOf(Seq("a" -> "b"), iters = 5)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r("b") > r("a")) // b receives a's rank, a only teleport+spread
  }

  test("all-zero-out-weight node is dangling: mass stays 1, nothing nulls") {
    // b's only out-edge weighs 0 — it must behave exactly like a node
    // with NO out-edges (teleport its whole rank) instead of feeding a
    // 0/0 division that silently drops its mass from the sum.
    val withZero = Graphs.pageRank(
        Seq(("a", "b", 1.0), ("b", "c", 0.0), ("c", "a", 1.0))
          .toDF("src", "dst", "w"), iterations = 5,
        weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 3 nodes × 6-dp output rounding ⇒ up to 1.5e-6 of benign skew
    assert(math.abs(withZero.values.sum - 1.0) < 2e-6,
      s"mass leaked: ${withZero.values.sum}")
    // identical to the same graph with the zero edge absent entirely
    // (c still appears as a node via a's... it doesn't — so compare to
    // the 3-node graph where b is explicitly dangling)
    val explicit = Graphs.pageRank(
        Seq(("a", "b", 1.0), ("c", "a", 1.0), ("b", "b", 0.0))
          .toDF("src", "dst", "w"), iterations = 5,
        weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(withZero === explicit)
  }

  test("matches the driver-side reference on an irregular weighted graph") {
    val edges = Seq(
      ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
      ("d", "a", 5.0), ("d", "d", 1.0), ("e", "a", 1.0), ("b", "e", 1.0))
    val got = Graphs.pageRank(edges.toDF("src", "dst", "w"),
        iterations = 4, weightCol = Some("w"), outScale = 9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = reference(edges, iters = 4)
    for ((v, r) <- want)
      assert(math.abs(got(v) - r) < 1e-8, s"node $v: got ${got(v)}, want $r")
  }

  test("weights tilt: heavier edge carries more rank") {
    val edges = Seq(("a", "b", 9.0), ("a", "c", 1.0))
    val r = Graphs.pageRank(edges.toDF("src", "dst", "w"),
        weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") > r("c"))
  }

  test("multi-edge equals explicit weight") {
    val multi = ranksOf(Seq("a" -> "b", "a" -> "b", "a" -> "c"))
    val weighted = Graphs.pageRank(
        Seq(("a", "b", 2.0), ("a", "c", 1.0)).toDF("src", "dst", "w"),
        weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(multi === weighted)
  }

  test("iteration 0 returns the uniform prior") {
    val r = ranksOf(Seq("a" -> "b", "b" -> "c"), iters = 0)
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6))
  }

  test("null endpoints are dropped, invalid args refused") {
    val df = Seq((Some("a"), Some("b")), (None, Some("c")), (Some("d"), None))
      .toDF("src", "dst")
    val r = Graphs.pageRank(df, iterations = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set("a", "b"))
    intercept[IllegalArgumentException] {
      Graphs.pageRank(df, iterations = -1)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(df, damping = 1.0)
    }
  }

  test("deterministic across runs") {
    val edges = Seq(("a", "b", 3.0), ("b", "c", 2.0), ("c", "a", 1.0),
      ("d", "a", 5.0))
    def run() = Graphs.pageRank(edges.toDF("src", "dst", "w"),
        iterations = 5, weightCol = Some("w"), outScale = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run() === run())
  }
}
