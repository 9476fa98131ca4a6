package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-derived curation signals. Web-scale pipelines rank HOSTS before
  * they rank documents (Common Crawl publishes host-level harmonic/PageRank
  * centralities; curation recipes keep pages from well-linked hosts and
  * drop link-farm islands) — the graph is orders of magnitude smaller than
  * the corpus, so a few power iterations over the host graph are cheap
  * next to one corpus scan. */
object Graphs {

  /** Fixed-iteration weighted PageRank over a directed edge list.
    *
    * Power iteration with damping `d` and uniform teleport:
    * `r'(v) = (1-d)/N + d * (inflow(v) + danglingMass/N)` where
    * `inflow(v) = sum over edges (u,v,w) of r(u) * w / outWeight(u)` and
    * dangling (no-out-edge) nodes spread their whole rank uniformly —
    * total mass stays 1 every iteration.
    *
    * A FIXED iteration count (not convergence detection) keeps the whole
    * computation declarative and replayable: the DuckDB oracle unrolls the
    * same `iterations` as chained CTEs and must hash-match. Rank sums are
    * decimal-quantized (DECIMAL(38,12)) so accumulation order is
    * irrelevant; multiplications/divisions are IEEE-identical across
    * engines, so every iteration is bit-reproducible.
    *
    * Scale shape: per iteration, ONE edge-keyed shuffle (contributions
    * grouped by dst) + a 1-row dangling-mass broadcast; out-weights are
    * computed once. Ranks are localCheckpointed each round — O(diameter)
    * lineage never builds up (same discipline as
    * [[Components.connectedComponents]] label propagation). Multi-edges
    * are honored as extra weight; self-loops are legal.
    *
    * `edges` must carry (srcCol, dstCol) and, if `weightCol` is set, a
    * non-negative numeric weight (unweighted = every edge weighs 1).
    * Edges with zero (or null) weight carry no rank mass: they are
    * excluded from the transition structure BEFORE out-weights are
    * computed, so a node whose out-edges all weigh 0 is treated as
    * dangling (its rank teleports uniformly) instead of silently losing
    * its mass to a 0/0 division — total mass stays exactly 1. Their
    * endpoints still count as graph nodes.
    * Output: (node, pagerank) over every node appearing as src or dst,
    * pagerank rounded to `outScale` dp. */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: Option[String] = None,
               outScale: Int = 6): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0 (got $iterations)")
    require(damping >= 0.0 && damping < 1.0,
      s"damping must be in [0,1) (got $damping)")
    val eAll = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
          .as("__w"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .localCheckpoint()
    val nodes = eAll.select(col("__src").as("node"))
      .union(eAll.select(col("__dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")
    val nD = lit(n.toDouble)
    // zero/null-weight edges carry no mass — drop them BEFORE out-weights
    // so an all-zero-out node lands in the dangling anti-join below
    val e = eAll.filter(col("__w") > 0.0).localCheckpoint()
    val outW = e.groupBy(col("__src"))
      .agg(sum(col("__w").cast("decimal(38,12)")).cast("double").as("__outw"))
      .localCheckpoint()

    var ranks = nodes.withColumn("__r", lit(1.0) / nD)
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "__src"), "__src")
        .join(outW, "__src")
        .select(col("__dst"),
          (col("__r") * col("__w") / col("__outw")).as("__c"))
      val inflow = contrib.groupBy(col("__dst"))
        .agg(sum(col("__c").cast("decimal(38,12)")).cast("double")
          .as("__in"))
      val dangling = ranks
        .join(outW.select(col("__src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("__r").cast("decimal(38,12)")).cast("double"),
          lit(0.0)).as("__dm"))
      ranks = nodes
        .join(inflow.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / nD + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dm") / nD))
            .as("__r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("__r"), outScale).as("pagerank"))
  }
}
