package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Default path (tiny edge lists take the driver union-find). */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Forced distributed min-label propagation. */
  private def ccDist(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b",
        maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap

  test("chains, triangles, and isolated pairs collapse to min-id groups (both paths)") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),      // path: indirect dups must merge
      (11L, 10L),                         // reversed edge direction
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle (redundant edge)
      (30L, 30L))                         // self-loop: dropped, node vanishes
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(cc(edges) === want)
    assert(ccDist(edges) === want)
  }

  test("random graph: driver union-find == distributed propagation == reference") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(250)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    // reference: textbook union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // canonicalize: min node id per root
    val byRoot = parent.keys.groupBy(find)
    val want = byRoot.flatMap { case (_, nodes) =>
      val m = nodes.min; nodes.map(_ -> m)
    }.toMap
    assert(cc(edges) === want)
    assert(ccDist(edges) === want)
  }

  test("a long path converges within the iteration budget (distributed path)") {
    val path = (0L until 16L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = ccDist(path)
    assert(got.size === 16)
    assert(got.values.toSet === Set(0L), s"path did not fully converge: $got")
    assert(cc(path) === got, "driver path diverged from propagation on a chain")
  }

  test("an exhausted iteration budget throws instead of returning split components") {
    val path = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val df = path.toDF("a", "b")
    // budget only binds on the distributed path; the driver path has no rounds
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(df, "a", "b", maxIter = 3,
        maxDriverEdges = 0)
    }
    assert(e.getMessage.contains("did not converge"))
    // the same graph under a sufficient budget is fine
    val ok = Components.connectedComponents(df, "a", "b", maxIter = 20,
        maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet === Set(0L))
  }
}
