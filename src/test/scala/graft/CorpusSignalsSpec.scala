package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/**
 * Hand-computed unit checks for the corpus-signal operators added for the
 * training-data pipeline: within-doc repetition, cross-doc boilerplate,
 * train/test contamination, and bigram LM scoring. (Their corpus-scale
 * behavior is oracle-gated by text_repetition / text_boilerplate /
 * text_contamination / text_lm_score in the catalog.)
 */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed bigram ratios") {
    // "a b a b a" → bigrams [a b, b a, a b, b a]: n=4, top=2, all duplicated
    val docs = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs, col("text"), col("doc_id"), 2)
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 4L)
    assert(r(0).getDouble(2) == 0.5)  // top_2gram_ratio
    assert(r(0).getDouble(3) == 1.0)  // dup_2gram_ratio
    // "x y z w": 3 distinct bigrams, no repetition
    assert(r(1).getLong(1) == 3L)
    assert(r(1).getDouble(2) == 1.0 / 3.0)
    assert(r(1).getDouble(3) == 0.0)
  }

  test("ngrams: docs shorter than n yield no grams (and drop from stats)") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs, col("text"), col("doc_id"), 3)
      .collect()
    assert(r.map(_.getLong(0)).toSet == Set(2L), "2-token doc must drop")
    assert(r.head.getLong(1) == 1L) // "a b c" has exactly one trigram
  }

  test("boilerplateStats: shared shingle flagged at minDf") {
    // one trigram ("x y z") present in all 3 docs; the rest unique
    val docs = Seq(
      (1L, "x y z a b"),   // shingles: x y z, y z a, z a b
      (2L, "x y z c d"),
      (3L, "x y z e f")
    ).toDF("doc_id", "text")
    val r = TextOps.boilerplateStats(docs, col("text"), col("doc_id"),
        n = 3, minDf = 3)
      .orderBy("doc_id").collect()
    r.foreach { row =>
      assert(row.getLong(1) == 3L)               // n_shingles
      assert(row.getLong(2) == 1L)               // n_boiler (just "x y z")
      assert(row.getDouble(3) == 1.0 / 3.0)      // boiler_ratio
    }
  }

  test("contamination: duplicated test doc flagged, novel doc clean") {
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val test = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (11L, "completely novel held out material here")       // disjoint
    ).toDF("doc_id", "text")
    val r = TextOps.contamination(test, train, col("text"), col("doc_id"),
        n = 3, threshold = 0.9)
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(3) == 1.0 && r(0).getInt(4) == 1)
    assert(r(1).getDouble(3) == 0.0 && r(1).getInt(4) == 0)
  }

  test("lmScore: hand-computed bigram probabilities") {
    // corpus bigrams: "a b" ×1, "a c" ×1 → P(b|a) = P(c|a) = 1/2 exactly;
    // each doc's mean = 0.5 (the 2^30 quantization is exact for 1/2)
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextOps.lmScore(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getLong(1) == 1L)     // n_bigrams
      assert(row.getDouble(2) == 0.5)  // lm_score
    }
  }

  test("lmScore: repeated bigram dominates the conditional mass") {
    // "a b a b a b" → bigrams: a b ×3, b a ×2; c1(a)=3, c1(b)=2
    // P(b|a)=1, P(a|b)=1 → every bigram scores 1.0 → mean 1.0
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextOps.lmScore(docs, col("text"), col("doc_id")).collect()
    assert(r.head.getLong(1) == 5L)
    assert(r.head.getDouble(2) == 1.0)
  }
}
