package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * Large-diameter stress for [[Dedup.connectedComponents]]: a pathological
 * chain corpus (every doc near-dups ONLY its neighbor) is the worst case
 * for naive min-label propagation — O(diameter) rounds, i.e. 10k shuffle
 * epochs for a 10k-doc chain. The large-star/small-star rewrite bounds it
 * at O(log² n) rounds: this spec pins a 10 000-node id-SEQUENTIAL chain
 * within 16 star rounds and (the adversarial case that broke the previous
 * pointer-jumping design) a 2 000-node id-PERMUTED chain within the
 * default budget. Near-clique dup graphs (the common case) close in a
 * handful of rounds either way.
 */
class ComponentsScaleSpec extends SparkSpec {
  import spark.implicits._

  test("10k-node chain converges within the log-diameter bound (16 rounds)") {
    val n = 10000L
    val nodes = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val t0 = System.nanoTime()
    // maxIter=16 IS the assertion: plain propagation would need 9 999
    // rounds; the star rewrites must close the chain in O(log² n).
    // maxLocalEdges=0 forces the DISTRIBUTED path — the driver union-find
    // tier would otherwise absorb this graph and the spec would stress
    // nothing
    val comp = Dedup.connectedComponentsWithRounds(nodes, pairs,
      maxIter = 16, maxLocalEdges = 0L)._1
    val labels = comp.select(col("component")).distinct().as[Long].collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"10k chain: $sec%.1f s wall, converged within 16 rounds")
    assert(labels == Seq(1L), s"chain must collapse to one component, got $labels")
    assert(comp.count() == n)
  }

  test("id-PERMUTED chain converges fast (the r10 non-convergence class)") {
    // The id-sequential chain above is secretly easy: min-ids travel with
    // graph edges. With ids RANDOMLY PERMUTED along the chain — the shape
    // a mutual-kNN graph actually produces — plain min-label propagation
    // moves the component min ONE edge-hop per round (the r10 bug:
    // corpus_pipeline_v5's graph blew past maxIter and the bench recorded
    // the 142 s failure as a plausible time). The large-star/small-star
    // rewrites (Kiveris et al. 2014) contract the permuted chain in
    // O(log² n) rounds; a 2 000-node permuted chain must close inside the
    // default 30-round budget (measured ~10 — plain propagation needs 2 000).
    val n = 2000
    val rng = new scala.util.Random(41)
    val perm = rng.shuffle((0L until n.toLong).toVector)
    val nodes = perm.toDF("id")
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1))).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponentsWithRounds(nodes, pairs,
      maxLocalEdges = 0L)._1 // force the star rounds — the spec's subject
    val labels = comp.select(col("component")).distinct().as[Long].collect().toSeq
    assert(labels == Seq(0L), s"permuted chain must collapse to component 0, got $labels")
    assert(comp.count() == n.toLong)
  }

  test("20k id-PERMUTED chain: round headroom holds at 10x the adversarial size") {
    // the advisor's headroom concern: the 2k permuted chain leaves margin
    // under the default 30-round budget, but does the margin survive a 10×
    // larger adversarial input? O(log² n) says yes — pin it with an
    // explicit 20-round cap (plain propagation would need 20 000 rounds).
    val n = 20000
    val rng = new scala.util.Random(43)
    val perm = rng.shuffle((0L until n.toLong).toVector)
    val nodes = perm.toDF("id")
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1))).toDF("doc_a", "doc_b")
    val (comp, rounds) = Dedup.connectedComponentsWithRounds(nodes, pairs,
      maxIter = 20, maxLocalEdges = 0L)
    val labels = comp.select(col("component")).distinct().as[Long].collect().toSeq
    info(s"20k permuted chain converged in $rounds star rounds")
    assert(labels == Seq(0L), s"must collapse to component 0, got $labels")
    assert(comp.count() == n.toLong)
    assert(rounds <= 20)
  }

  test("branching structure: star + chain + clique mix resolves to exact minima") {
    // star centered at 100, a chain 200..220, a 5-clique 300..304, singletons
    val star = (101L to 120L).map(i => (100L, i))
    val chain = (200L until 220L).map(i => (i, i + 1))
    val clique = (for { a <- 300L to 304L; b <- 300L to 304L if a < b } yield (a, b))
    val nodes = ((100L to 120L) ++ (200L to 220L) ++ (300L to 304L) ++ Seq(400L)).toDF("id")
    val pairs = (star ++ chain ++ clique).toDF("doc_a", "doc_b")
    // BOTH tiers must land on the exact minima — the default local
    // union-find and the forced star rounds
    val gotLocal = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotStars = Dedup.connectedComponentsWithRounds(nodes, pairs,
        maxLocalEdges = 0L)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLocal == gotStars, "tiers disagree")
    (100L to 120L).foreach(i => assert(gotLocal(i) == 100L))
    (200L to 220L).foreach(i => assert(gotLocal(i) == 200L))
    (300L to 304L).foreach(i => assert(gotLocal(i) == 300L))
    assert(gotLocal(400L) == 400L)
  }
}
