package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair edge list — the step that
  * turns pairwise near-duplicate evidence (LSH buckets, n-gram Jaccard,
  * simhash bands) into DEDUP GROUPS: doc X ~ Y and Y ~ Z must collapse to
  * one group even when X ≁ Z directly, or a corpus keeps both ends of every
  * chain. The reference has no equivalent (rigatoni never joins documents);
  * this extends the §7.4 dedup surface to group-level semantics.
  */
object Components {

  /** (node, component) for every node incident to an edge, where component
    * is the minimum node id reachable from it (a canonical representative —
    * "keep lowest id" falls out directly).
    *
    * TWO execution paths behind one exact semantics, picked from the
    * OBSERVED edge count — the same adaptive reasoning AQE applies to
    * broadcast joins:
    *
    *  - model-sized edge lists (≤ `maxDriverEdges`, default 2²⁰ pairs —
    *    with tuple/HashMap boxing that is a transient ~100-150 MB on the
    *    driver, fine for the GB-sized drivers Spark defaults to; lower
    *    the bound for skinny drivers): a driver union-find. Thresholded
    *    candidate pairs are usually orders of magnitude smaller than the
    *    corpus, and replacing O(diameter) shuffle rounds with
    *    microseconds of pointer chasing is exactly what a bounded,
    *    counted collect is FOR. This is not a data-sized collect: the
    *    bound is enforced before anything moves.
    *  - larger edge lists: iterative min-label propagation. Every node
    *    starts labeled with itself; each round takes the min of its own
    *    label and its neighbors' labels; fixpoint after O(diameter) rounds.
    *    Per round: two hash shuffles of the edge list — no driver-side
    *    graph state, no pair explosion, so it runs at any scale the edge
    *    list itself fits. Near-dup components have tiny diameters, so
    *    rounds ≈ 3-5 in practice; `maxIter` bounds the pathological chain.
    *    Edge list and per-round labels are localCheckpointed: the lineage
    *    would otherwise double per round and replay the (expensive)
    *    candidate-pair job every iteration.
    *
    * `maxDriverEdges = 0` forces the distributed path (the equality of the
    * two paths is asserted in ComponentsSpec).
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 50,
                          maxDriverEdges: Long = 1L << 20): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    val sym = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .union(edges.select(col(dst).cast("long").as("u"), col(src).cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    if (maxDriverEdges > 0 && sym.count() <= maxDriverEdges)
      return driverUnionFind(sym)
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("v2"), col("label")), col("v") === col("v2"))
        .groupBy(col("u"))
        .agg(min(col("label")).as("nbr_label"))
      val updated = labels
        .join(nbrMin.select(col("u").as("node2"), col("nbr_label")),
          col("node") === col("node2"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("new_label"))
        .localCheckpoint()
      converged = updated.filter(col("new_label") < col("label")).isEmpty
      labels = updated.select(col("node"), col("new_label").as("label"))
      iter += 1
    }
    // truncated labels would silently split one component in two — the
    // exact failure this operator exists to prevent — so refuse to return
    // them; the caller raises maxIter (rounds scale with graph diameter)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds; " +
        "the edge list contains a chain with diameter > maxIter — raise maxIter")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Min-union + path-halving union-find over a bounded, already-counted
    * edge list. Min-union (the smaller root adopts the larger) makes every
    * root the minimum id of its component by construction, so the contract
    * (component = min reachable node id) is byte-identical to the
    * propagation path; path halving keeps amortized find near-constant at
    * this bound. */
  private def driverUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val es = sym.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        val gp = parent.get(parent.get(x))
        parent.put(x, gp) // path halving
        x = gp
      }
      x
    }
    es.foreach { case (u, v) =>
      parent.putIfAbsent(u, u)
      parent.putIfAbsent(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
    }
    // roots are already component minima (union always keeps the smaller
    // id as the root), so find(x) IS the min reachable id
    val out = new Array[(Long, Long)](parent.size())
    val it = parent.keySet().iterator()
    var i = 0
    while (it.hasNext) { val n = it.next(); out(i) = (n, find(n)); i += 1 }
    spark.createDataset(out.toIndexedSeq)
      .toDF("node", "component")
  }
}
