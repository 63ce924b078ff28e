package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics beyond the dedup components fixpoint
 * ([[Dedup.connectedComponents]]): integer-exact PageRank over an edge
 * frame — the canonical "importance over a link graph" signal a crawl
 * pipeline uses for source weighting and seed selection.
 */
object Graph {

  /** Rank fixed-point scale: ranks are longs in units of 2^-30. Chosen so
    * per-node inbound mass stays inside a long even adversarially — total
    * mass is N·2^30, so N up to ~8e9 nodes cannot overflow 2^63 even if one
    * node received ALL of it. */
  val RankScale: Long = 1L << 30

  /**
   * PageRank with damping 17/20 (=0.85) for a fixed iteration count, in
   * exact integer arithmetic end-to-end:
   *
   *  - ranks are scaled longs (units of 2^-30, [[RankScale]]);
   *  - each node's per-edge contribution is `rank div outdeg` (truncating
   *    long division — floor on non-negatives, identical in every engine);
   *  - inbound mass is an exact long sum, order-independent under parallel
   *    aggregation (the reason for integers: a double formulation's sums
   *    would be partition-order-dependent and unverifiable cross-engine);
   *  - damping applies as `(inb div 20)·17 + ((inb mod 20)·17) div 20` —
   *    exactly floor(inb·17/20) without ever forming the overflow-prone
   *    product inb·17.
   *
   * Semantics notes, pinned deliberately: dangling mass is DROPPED (nodes
   * without out-edges contribute nothing — the common simplified variant;
   * the bipartite both-direction construction used by the catalog has no
   * dangling nodes), and nodes with no in-edges settle at the base rank
   * 0.15·scale. Floor losses make total mass decrease by ≤1 ulp per node
   * per iteration — deterministic everywhere.
   *
   * Scale shape per iteration: one broadcast-or-shuffle equi-join of ranks
   * to out-degrees, one shuffle of contributions on dst (map-side combined
   * sum), one left join back to the node set. O(iterations) rounds of fully
   * distributed work, no driver-side state; the standard power-iteration
   * dataflow. `edges` should be deduplicated; self-loops are legal.
   */
  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = (RankScale * 3) / 20 // floor(0.15 · scale)
    var ranks = nodes.withColumn("rank", lit(RankScale))
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .join(outdeg, col("node") === col("src"))
        .selectExpr("src", "rank div outdeg AS contrib")
      val inbound = e.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inb"))
      ranks = nodes
        .join(inbound, col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("inb"), lit(0L)).as("inb"))
        .selectExpr("node",
          s"${base}L + (inb div 20) * 17 + ((inb % 20) * 17) div 20 AS rank")
    }
    ranks.withColumn("rank_norm", col("rank").cast("double") / lit(RankScale.toDouble))
  }
}
