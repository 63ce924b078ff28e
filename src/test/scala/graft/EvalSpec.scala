package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact: perfect separation is 1, anti-separation is 0") {
    val perfect = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("score", "label")
    val p = Eval.aucExact(perfect, col("score"), col("label"))
      .select("n_pos", "n_neg", "auc_num2", "auc_den2", "auc")
      .as[(Long, Long, Long, Long, Double)].collect()(0)
    assert(p == ((2L, 2L, 8L, 8L, 1.0)))
    val anti = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("score", "label")
    assert(Eval.aucExact(anti, col("score"), col("label"))
      .select("auc").as[Double].collect()(0) == 0.0)
  }

  test("aucExact: ties take average ranks (hand-computed 2x integers)") {
    // scores [1,1,2,2] labels [0,1,0,1]: avg ranks 1.5 / 3.5 for the tied
    // groups -> U = 2, AUC = 0.5; in 2x form num2 = 4, den2 = 8
    val df = Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1)).toDF("score", "label")
    val r = Eval.aucExact(df, col("score"), col("label"))
      .select("n_pos", "n_neg", "auc_num2", "auc_den2", "auc")
      .as[(Long, Long, Long, Long, Double)].collect()(0)
    assert(r == ((2L, 2L, 4L, 8L, 0.5)))
  }

  test("aucExact: single-class input yields null auc, zero denominator") {
    val df = Seq((1L, 1), (2L, 1)).toDF("score", "label")
    val r = Eval.aucExact(df, col("score"), col("label")).collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(3) == 0L && r.isNullAt(4))
  }

  test("aucExact agrees with the per-row rank definition on random data") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 300).map { _ =>
      val s = rng.nextInt(20).toLong // heavy ties
      (s, if (rng.nextDouble() < (s + 1) / 25.0) 1 else 0)
    }
    val df = rows.toDF("score", "label")
    val got = Eval.aucExact(df, col("score"), col("label"))
      .select("auc").as[Double].collect()(0)
    // reference: average-rank Mann-Whitney computed driver-side
    val sorted = rows.sortBy(_._1)
    val ranks = scala.collection.mutable.Map[Long, Double]()
    var i = 0
    while (i < sorted.length) {
      val s = sorted(i)._1
      val j = sorted.indexWhere(_._1 != s, i) match { case -1 => sorted.length case x => x }
      ranks(s) = (i + 1 + j).toDouble / 2 // avg of ranks i+1..j
      i = j
    }
    val nPos = rows.count(_._2 == 1); val nNeg = rows.length - nPos
    val sumPos = rows.filter(_._2 == 1).map(r => ranks(r._1)).sum
    val expected = (sumPos - nPos.toDouble * (nPos + 1) / 2) / (nPos.toDouble * nNeg)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("aucExact is invariant under strictly increasing score transforms") {
    val rng = new scala.util.Random(29)
    val rows = (1 to 200).map(_ => (rng.nextInt(30).toLong - 15, rng.nextInt(2)))
    val df = rows.toDF("score", "label")
    val base = Eval.aucExact(df, col("score"), col("label"))
      .select("auc").as[Double].collect()(0)
    // AUC is rank-based: any strictly increasing transform preserves it
    val scaled = Eval.aucExact(df, col("score") * 3 + 7, col("label"))
      .select("auc").as[Double].collect()(0)
    assert(scaled == base)
    val cubed = Eval.aucExact(df,
        col("score") * col("score") * col("score"), col("label"))
      .select("auc").as[Double].collect()(0)
    assert(cubed == base)
    // ...and a DECREASING transform flips it around 1/2
    val negated = Eval.aucExact(df, -col("score"), col("label"))
      .select("auc").as[Double].collect()(0)
    assert(math.abs((negated + base) - 1.0) < 1e-12)
  }

  test("calibrationBins: fixed-width integer bins with counts and rates") {
    val df = (0L until 10L).map(s => (s, if (s >= 5) 1 else 0)).toDF("score", "label")
    val got = Eval.calibrationBins(df, col("score"), col("label"), nBins = 5)
      .orderBy("bin")
      .select("bin", "n", "n_pos", "score_lo", "score_hi", "pos_rate")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 0L, 1L, 0.0), (1L, 2L, 0L, 2L, 3L, 0.0),
      (2L, 2L, 1L, 4L, 5L, 0.5), (3L, 2L, 2L, 6L, 7L, 1.0),
      (4L, 2L, 2L, 8L, 9L, 1.0)))
  }

  test("calibrationBins: constant score degenerates to one bin") {
    val df = Seq((7L, 0), (7L, 1), (7L, 1)).toDF("score", "label")
    val got = Eval.calibrationBins(df, col("score"), col("label"), nBins = 10)
      .select("bin", "n", "n_pos").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L)))
  }

  test("prCurve: hand-computed confusion counts at every distinct score") {
    // scores desc: 9(+), 7(-), 7(+), 5(-)  -> n_pos = 2
    val df = Seq((9L, 1), (7L, 0), (7L, 1), (5L, 0)).toDF("score", "label")
    val got = Eval.prCurve(df, col("score"), col("label"))
      .orderBy(col("threshold").desc)
      .select("threshold", "tp", "fp", "fn", "precision_at", "recall_at", "f1_at")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (9L, 1L, 0L, 1L, 1.0, 0.5, 2.0 / 3.0),   // predict >=9: tp 1 of pp 1
      (7L, 2L, 1L, 0L, 2.0 / 3.0, 1.0, 0.8),   // >=7: tp 2, fp 1
      (5L, 2L, 2L, 0L, 0.5, 1.0, 2.0 * 2 / 6))) // >=5: everything positive
  }

  test("prCurve: no positives -> recall/f1 null, precision still defined") {
    val df = Seq((3L, 0), (1L, 0)).toDF("score", "label")
    val rows = Eval.prCurve(df, col("score"), col("label"))
      .orderBy(col("threshold").desc).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(1) == 0L)) // tp = 0 everywhere
    assert(rows.forall(r => r.getDouble(4) == 0.0)) // precision 0/pp = 0
    assert(rows.forall(_.isNullAt(5)), "recall undefined with no positives")
    // f1 = 2tp/(n_pos+pp): n_pos = 0 but pp > 0, so denominator nonzero -> 0
    assert(rows.forall(r => r.getDouble(6) == 0.0))
  }

  test("prCurve: curve ends at (recall 1, precision = base rate)") {
    val df = (0L until 100L).map(s => (s, if (s % 3 == 0) 1 else 0))
      .toDF("score", "label")
    val last = Eval.prCurve(df, col("score"), col("label"))
      .orderBy(col("threshold").asc).collect().head
    val nPos = (0L until 100L).count(_ % 3 == 0)
    assert(last.getLong(1) == nPos && last.getDouble(5) == 1.0)
    assert(last.getDouble(4) == nPos.toDouble / 100.0)
  }

  test("ndcgAtK: hand-computed DCG/IDCG from the plan-literal weight table") {
    val w = Eval.dcgWeights(3)
    val hits = Seq(
      ("q", 1L, 10.0, 0L), ("q", 2L, 9.0, 2L), ("q", 3L, 8.0, 1L),
      ("q", 4L, 7.0, 0L), ("q", 5L, 6.0, 3L))
      .toDF("query", "doc", "score", "rel")
    val row = Eval.ndcgAtK(hits, col("query"), col("doc"), col("score"),
      col("rel"), k = 3).head()
    val dcg = 2L * w(1) + 1L * w(2)          // ranks: rel 0, 2, 1 | 0, 3
    val idcg = 3L * w(0) + 2L * w(1) + 1L * w(2) // ideal: 3, 2, 1
    assert(row.getAs[Long]("dcg_scaled") == dcg)
    assert(row.getAs[Long]("idcg_scaled") == idcg)
    assert(row.getAs[Long]("ndcg_scaled") == (dcg * (1L << 20)) / idcg)
    assert(row.getAs[Double]("ndcg") == dcg.toDouble / idcg)
    assert(row.getAs[Int]("first_rel_rank") == 2)
    assert(row.getAs[Long]("rr_scaled") == (1L << 20) / 2)
  }

  test("ndcgAtK: perfect ranking scores 1; no-relevant query yields nulls") {
    val hits = Seq(
      ("good", 1L, 9.0, 3L), ("good", 2L, 8.0, 2L), ("good", 3L, 7.0, 1L),
      ("dry", 4L, 9.0, 0L), ("dry", 5L, 8.0, 0L))
      .toDF("query", "doc", "score", "rel")
    val got = Eval.ndcgAtK(hits, col("query"), col("doc"), col("score"),
        col("rel"), k = 3)
      .select(col("query"), col("ndcg"), col("rr_scaled"))
      .as[(String, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("good") == ((Some(1.0), Some(1L << 20))))
    assert(got("dry") == ((None, None)))
  }

  test("retrievalEvalSummary: exact fixed-point mean, dry queries count as zero") {
    val hits = Seq(
      ("a", 1L, 9.0, 1L), ("a", 2L, 8.0, 0L),   // ndcg 1, rr 1
      ("b", 3L, 9.0, 0L), ("b", 4L, 8.0, 1L),   // first rel at rank 2
      ("c", 5L, 9.0, 0L))                        // dry: contributes 0
      .toDF("query", "doc", "score", "rel")
    val perQ = Eval.ndcgAtK(hits, col("query"), col("doc"), col("score"),
      col("rel"), k = 2)
    val s = Eval.retrievalEvalSummary(perQ).head()
    val S = (1L << 20).toDouble
    assert(s.getAs[Long]("n_queries") == 3L)
    // b's ndcg: dcg = 1·W(2), idcg = 1·W(1) -> scaled (W2<<20)/W1
    val w = Eval.dcgWeights(2)
    val bN = (w(1) * (1L << 20)) / w(0)
    assert(s.getAs[Long]("sum_ndcg_scaled") == (1L << 20) + bN)
    assert(s.getAs[Double]("mean_ndcg") == ((1L << 20) + bN) / (S * 3.0))
    assert(s.getAs[Long]("sum_rr_scaled") == (1L << 20) + (1L << 19))
    assert(s.getAs[Double]("mrr") == ((1L << 20) + (1L << 19)) / (S * 3.0))
  }

  test("recallApAtK: exact fixed-point recall and AP; empty tiers still report") {
    val S = 1L << 20
    val truth = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L))
      .toDF("query", "doc")
    // query a: hits at ranks 1 and 3 of a 3-long list; query b: no rows
    // from this tier at all — must come back with zero hits, not vanish
    val approx = Seq(("a", 1L, 1), ("a", 9L, 2), ("a", 3L, 3))
      .toDF("query", "doc", "rank")
    val got = Eval.recallApAtK(approx, truth, col("query"), col("doc"),
        col("rank"), col("query"), col("doc"))
      .select(col("query"), col("n_true"), col("n_hits"),
        col("recall_scaled"), col("ap_scaled"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: recall 2/3 -> (2S) div 3; AP = (S/1 + 2S div 3) div 3
    val apA = (1L * S / 1L + 2L * S / 3L) / 3L
    assert(got("a") == (("a", 3L, 2L, 2L * S / 3L, apA)))
    assert(got("b") == (("b", 1L, 0L, 0L, 0L)))
    // roll-up: means in exact numerator form + one final division
    val sum = Eval.recallMapSummary(
      Eval.recallApAtK(approx, truth, col("query"), col("doc"), col("rank"),
          col("query"), col("doc"))
        .withColumn("tier", lit("t")), Seq("tier")).head()
    assert(sum.getAs[Long]("n_queries") == 2L)
    assert(sum.getAs[Long]("sum_recall_scaled") == 2L * S / 3L)
    assert(sum.getAs[Double]("mean_recall") == (2L * S / 3L) / (S.toDouble * 2))
    assert(sum.getAs[Long]("sum_ap_scaled") == apA)
    assert(sum.getAs[Double]("map") == apA / (S.toDouble * 2))
  }
}
