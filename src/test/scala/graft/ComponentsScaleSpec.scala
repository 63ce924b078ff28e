package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * Large-diameter stress for [[Dedup.connectedComponents]]: a pathological
 * chain corpus (every doc near-dups ONLY its neighbor) is the worst case
 * for min-label propagation — O(diameter) rounds, i.e. 10k rounds for a
 * 10k-doc chain, each a full shuffle epoch on a real cluster. The
 * per-round pointer-shortcutting (path halving) step bounds it at
 * O(log diameter): this spec pins a 10 000-node chain converging within 16
 * rounds (halving active from round 2; 2^14 ≫ 10^4), labels exact. Near-clique dup graphs (the common
 * case) are unaffected — they close in 2-4 rounds either way.
 */
class ComponentsScaleSpec extends SparkSpec {
  import spark.implicits._

  test("10k-node chain converges within the log-diameter bound (16 rounds)") {
    val n = 10000L
    val nodes = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val t0 = System.nanoTime()
    // maxIter=16 IS the assertion: plain propagation would need 9 999
    // rounds; path halving (from round 2) must close the chain in
    // ceil(log2(d)) + epsilon
    val comp = Dedup.connectedComponents(nodes, pairs, maxIter = 16)
    val labels = comp.select(col("component")).distinct().as[Long].collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"10k chain: $sec%.1f s wall, converged within 16 rounds")
    assert(labels == Seq(1L), s"chain must collapse to one component, got $labels")
    assert(comp.count() == n)
  }

  test("branching structure: star + chain + clique mix resolves to exact minima") {
    // star centered at 100, a chain 200..220, a 5-clique 300..304, singletons
    val star = (101L to 120L).map(i => (100L, i))
    val chain = (200L until 220L).map(i => (i, i + 1))
    val clique = (for { a <- 300L to 304L; b <- 300L to 304L if a < b } yield (a, b))
    val nodes = ((100L to 120L) ++ (200L to 220L) ++ (300L to 304L) ++ Seq(400L)).toDF("id")
    val pairs = (star ++ chain ++ clique).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 120L).foreach(i => assert(got(i) == 100L))
    (200L to 220L).foreach(i => assert(got(i) == 200L))
    (300L to 304L).foreach(i => assert(got(i) == 300L))
    assert(got(400L) == 400L)
  }
}
