package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Graph}

/**
 * Structural checks for the integer-exact PageRank and the quantized label
 * centroids (their corpus-scale outputs are oracle-gated by graph_pagerank /
 * emb_label_centroids in the catalog).
 */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric 2-cycle keeps equal ranks at full mass") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3)
      .orderBy("node").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
    // perfect symmetry: both nodes identical; mass conserved up to floor
    // loss (≤ 1 unit per node per iteration)
    assert(r(0).getLong(1) == r(1).getLong(1))
    assert(math.abs(r(0).getLong(1) - Graph.RankScale) <= 3)
  }

  test("pageRank: star center outranks leaves; leaves tie exactly") {
    // leaves point at the center; center points back at every leaf
    val leaves = (1 to 4).map(i => s"l$i")
    val edges = (leaves.map(_ -> "hub") ++ leaves.map("hub" -> _))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(leaves.map(r).distinct.size == 1, "leaves must tie exactly")
    assert(r("hub") > r(leaves.head), "hub collects the leaves' mass")
  }

  test("pageRank: node with no in-edges settles at the base rank") {
    // a -> b, b -> b(self): a receives nothing
    val edges = Seq(("a", "b"), ("b", "b")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("a") == (Graph.RankScale * 3) / 20)
    assert(r("b") > r("a"))
  }

  test("pageRank: partition-count invariant (exact longs, no FP drift)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val one = Graph.pageRank(edges.repartition(1), iterations = 4)
      .orderBy("node").collect().map(_.getLong(1)).toSeq
    val many = Graph.pageRank(edges.repartition(7), iterations = 4)
      .orderBy("node").collect().map(_.getLong(1)).toSeq
    assert(one == many)
  }

  test("labelCentroids: hand-computed quantized means") {
    val docs = Seq(
      (0, Seq(1.0f, -2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(0.5f, 0.25f))
    ).toDF("label", "embedding")
    val r = Embeddings.labelCentroids(docs, col("label"), col("embedding"), dim = 2)
      .orderBy("label").collect()
    // label 0: exact values → centroid = ((1+3)/2, (-2+4)/2) = (2, 1)
    assert(r(0).getLong(1) == 2L)
    val c0 = r(0).getSeq[Double](3)
    assert(c0 == Seq(2.0, 1.0))
    assert(r(0).getLong(2) == (4L + 2L) * (1L << 20)) // qsum of exact ints
    // label 1: 0.5 and 0.25 are exact in binary → centroid exact
    val c1 = r(1).getSeq[Double](3)
    assert(c1 == Seq(0.5, 0.25))
  }
}
