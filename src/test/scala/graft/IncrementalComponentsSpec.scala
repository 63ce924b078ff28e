package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * [[Dedup.admitComponents]] — incremental components admission against a
 * persisted label artifact. The contract under test: given labels computed
 * on corpus A and a batch B (ids all greater, append-only discipline) with
 * verified edges touching at least one new side, the admitted labels
 * hash-equal a from-scratch [[Dedup.connectedComponents]] over A∪B.
 *
 * Randomized over many seeds because the interesting structure is
 * combinatorial: batches that MERGE multiple old components, chains that
 * thread old–new–old, new-only clusters, isolated new docs, and old
 * components untouched by the batch must all land on the exact from-scratch
 * minima.
 */
class IncrementalComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Random edge set over [0, n) with ~avgDeg·n/2 edges. */
  private def randomEdges(n: Int, nEdges: Int, rng: scala.util.Random): Seq[(Long, Long)] =
    (0 until nEdges).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
    }.filter { case (a, b) => a != b }

  private def fullLabels(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n.toLong).toDF("id")
    val pairs = edges.toDF("doc_a", "doc_b")
    Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("admitComponents ≡ from-scratch recompute on A∪B (randomized)") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val n = 300
      val cut = 240L // A = [0, 240), B = [240, 300)
      val edges = randomEdges(n, 260, rng)
      val (oldEdges, mixedEdges) = edges.partition { case (a, b) => a < cut && b < cut }
      val oldLabels = {
        val nodesA = (0L until cut).toDF("id")
        Dedup.connectedComponents(nodesA, oldEdges.toDF("doc_a", "doc_b"))
      }
      val got = Dedup.admitComponents(
          oldLabels,
          (cut until n.toLong).toDF("id"),
          mixedEdges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = fullLabels(n, edges)
      assert(got.size == n, s"seed=$seed: every doc must carry a label")
      assert(got == want, s"seed=$seed: incremental labels diverge from recompute: " +
        (got.toSet -- want.toSet).take(5).toString)
    }
  }

  test("local union-find tier ≡ distributed star rounds (forced via maxLocalEdges=0)") {
    val rng = new scala.util.Random(97)
    val n = 200
    val cut = 150L
    val edges = randomEdges(n, 180, rng)
    val (oldEdges, mixedEdges) = edges.partition { case (a, b) => a < cut && b < cut }
    val oldLabels = Dedup.connectedComponents(
      (0L until cut).toDF("id"), oldEdges.toDF("doc_a", "doc_b"))
      .localCheckpoint()
    val batchIds = (cut until n.toLong).toDF("id")
    val viaLocal = Dedup.admitComponents(oldLabels, batchIds,
        mixedEdges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = Dedup.admitComponents(oldLabels, batchIds,
        mixedEdges.toDF("doc_a", "doc_b"), maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLocal == viaStars)
  }

  test("batch merging several old components relabels ALL their members") {
    // A: three separate chains 0-1-2, 10-11-12, 20-21-22 (+ singleton 30);
    // B: doc 100 links chains 0 and 10; doc 101 links 20 only; 102 isolated
    val oldEdges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L)).toDF("doc_a", "doc_b")
    val oldNodes = (Seq(0L, 1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L, 30L)).toDF("id")
    val labels = Dedup.connectedComponents(oldNodes, oldEdges)
    val newEdges = Seq((2L, 100L), (100L, 12L), (101L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.admitComponents(labels, Seq(100L, 101L, 102L).toDF("id"), newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merged mega-cluster: {0,1,2,10,11,12,100} → 0 (including old docs of
    // the FORMER component 10, which only the remap join can reach)
    Seq(0L, 1L, 2L, 10L, 11L, 12L, 100L).foreach(i =>
      assert(got(i) == 0L, s"doc $i must relabel to 0, got ${got(i)}"))
    Seq(20L, 21L, 22L, 101L).foreach(i => assert(got(i) == 20L))
    assert(got(30L) == 30L, "untouched old singleton keeps its label")
    assert(got(102L) == 102L, "isolated new doc labels itself")
  }

  test("new-only cluster labels at its own minimum") {
    val labels = Dedup.connectedComponents(
      Seq(0L, 1L).toDF("id"), Seq((0L, 1L)).toDF("doc_a", "doc_b"))
    val got = Dedup.admitComponents(labels, Seq(50L, 51L, 52L).toDF("id"),
        Seq((51L, 52L), (52L, 50L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(50L, 51L, 52L).foreach(i => assert(got(i) == 50L))
    assert(got(0L) == 0L && got(1L) == 0L)
  }

  test("empty batch is the identity on the artifact") {
    val labels = Dedup.connectedComponents(
      Seq(0L, 1L, 2L).toDF("id"), Seq((0L, 2L)).toDF("doc_a", "doc_b"))
    val got = Dedup.admitComponents(labels,
        spark.emptyDataset[Long].toDF("id"),
        spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }
}
