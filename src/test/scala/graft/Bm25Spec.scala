package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** BM25 retrieval semantics (the oracle gate checks cross-engine values;
  * this spec checks the ranking properties that make it BM25). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "join join join filter pad pad pad pad"),  // high tf for join
    (2L, "join filter pad pad pad pad pad pad"),    // one join, same length
    (3L, "pad pad pad pad pad pad pad pad"),        // no query terms
    (4L, "join filter"),                            // short doc, same tf as 2
    (5L, "scan pad pad pad pad pad pad pad")        // rare term
  ).toDF("doc_id", "text")

  test("more occurrences rank higher at equal length; absent docs excluded") {
    val scores = TextOps.bm25(corpus, col("text"), col("doc_id"),
        Seq("join", "filter", "scan"))
      .as[(Long, Double)].collect().toMap
    assert(!scores.contains(3L), "doc without any query term must be absent")
    assert(scores(1L) > scores(2L), "tf=3 must outrank tf=1 at equal length")
    assert(scores(4L) > scores(2L), "same tf in a shorter doc must rank higher")
    assert(scores.values.forall(_ > 0.0))
  }

  test("rarer terms contribute more (df inversion)") {
    // 'scan' appears in 1 doc, 'join' in 3 → doc 5's single scan must beat
    // doc 2's single join at comparable length
    val scores = TextOps.bm25(corpus, col("text"), col("doc_id"),
        Seq("join", "filter", "scan"))
      .as[(Long, Double)].collect().toMap
    assert(scores(5L) > scores(2L) - scores(2L) / 2,
      "sanity: rare-term doc competitive") // loose: doc 2 also has 'filter'
    val joinOnly = TextOps.bm25(corpus, col("text"), col("doc_id"), Seq("join"))
      .as[(Long, Double)].collect().toMap
    val scanOnly = TextOps.bm25(corpus, col("text"), col("doc_id"), Seq("scan"))
      .as[(Long, Double)].collect().toMap
    assert(scanOnly(5L) > joinOnly(2L),
      "df=1 term must score above df=3 term at same tf and length")
  }

  test("deterministic under repartitioning") {
    val base = TextOps.bm25(corpus, col("text"), col("doc_id"),
        Seq("join", "filter", "scan")).as[(Long, Double)].collect().toSet
    val shuffled = TextOps.bm25(corpus.repartition(7), col("text"), col("doc_id"),
        Seq("join", "filter", "scan")).as[(Long, Double)].collect().toSet
    assert(base == shuffled) // bit-identical scores, any layout
  }

  test("rejects empty or duplicate query terms") {
    intercept[IllegalArgumentException] {
      TextOps.bm25(corpus, col("text"), col("doc_id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextOps.bm25(corpus, col("text"), col("doc_id"), Seq("join", "join"))
    }
  }

  test("bm25Multi is bit-identical to per-query bm25, at one corpus pass") {
    val queries = Seq(
      ("q1", Seq("join", "filter")),
      ("q2", Seq("scan", "pad")),
      ("q3", Seq("filter")))
    val multi = TextOps.bm25Multi(corpus, col("text"), col("doc_id"), queries)
      .as[(String, Long, Double)].collect().toSet
    val single = queries.flatMap { case (qid, terms) =>
      TextOps.bm25(corpus, col("text"), col("doc_id"), terms)
        .as[(Long, Double)].collect().map { case (d, s) => (qid, d, s) }
    }.toSet
    // exact Double equality: the term_score expression and the per-query
    // mix order are identical by construction
    assert(multi == single && single.nonEmpty)
  }

  test("bm25Multi rejects empty query sets and duplicate terms") {
    intercept[IllegalArgumentException] {
      TextOps.bm25Multi(corpus, col("text"), col("doc_id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextOps.bm25Multi(corpus, col("text"), col("doc_id"),
        Seq(("q", Seq("join", "join"))))
    }
  }
}
