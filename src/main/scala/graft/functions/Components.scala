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
    * Algorithm: iterative min-label propagation. Every node starts labeled
    * with itself; each round takes the min of its own label and its
    * neighbors' labels; a fixpoint is reached after O(diameter) rounds.
    * Per round: two hash shuffles of the edge list (by dst to fetch labels,
    * by src to aggregate) — no driver-side graph state, no pair explosion,
    * so it runs at any scale the edge list itself fits. Near-dup components
    * have tiny diameters (dups of a doc are dups of each other, plus short
    * chains), so rounds ≈ 3-5 in practice; `maxIter` bounds the pathological
    * chain. Both the edge list and each round's labels are localCheckpointed:
    * the lineage would otherwise double per round and replay the (expensive)
    * candidate-pair job every iteration.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    val sym = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .union(edges.select(col(dst).cast("long").as("u"), col(src).cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
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
}
