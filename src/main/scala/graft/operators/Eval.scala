package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Classifier-evaluation primitives over scored corpora: exact AUC and
 * calibration bins. Both are defined on INTEGER scores (the catalog's
 * classifier emits exact long margins), so every intermediate is exact long
 * arithmetic and the only floating value is one final correctly-rounded IEEE
 * division — the discipline that makes the rows oracle-verifiable
 * cross-engine.
 *
 * Scale shape: both operators aggregate BY SCORE first (one map-side-combined
 * exchange on the score key), then run their windows over the DISTINCT-score
 * frame — bounded by the score domain, not the corpus. A naive per-document
 * global rank would funnel 100 TB through one sort partition; grouping first
 * makes the single-partition step O(|distinct scores|).
 */
object Eval {

  /**
   * Exact tie-aware ROC AUC of `scoreCol` predicting binary `labelCol`
   * (0/1): the Mann–Whitney U statistic with average ranks for ties, kept in
   * integer 2× form — for a tied score group with `cum` rows below it and
   * `c` members, each member's doubled average rank is 2·cum + c + 1, so
   * auc_num2 = Σ_pos 2·rank − n₊(n₊+1) and auc_den2 = 2·n₊·n₋ are exact
   * longs and auc = auc_num2 / auc_den2 (null when a class is absent).
   * Returns ONE row: (n_pos, n_neg, auc_num2, auc_den2, auc).
   */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val byScore = df.groupBy(scoreCol.as("score"))
      .agg(count(lit(1)).as("c"), sum(labelCol.cast("long")).as("p"))
    // distinct-score frame only: the unpartitioned running sum is bounded by
    // the score domain, never the corpus
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = byScore.withColumn("cum_below",
      coalesce(sum(col("c")).over(w), lit(0L)))
    cum.agg(
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cum_below") + col("c") + lit(1L)))
          .as("sum2ranks"))
      .select(col("n_pos"), col("n_neg"),
        (col("sum2ranks") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("auc_num2"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den2"))
      .withColumn("auc",
        when(col("auc_den2") =!= 0L,
          col("auc_num2").cast("double") / col("auc_den2")))
  }

  /**
   * Calibration table: fixed-width bins over the observed [min, max] integer
   * score range (`bin = (score − min) · nBins / (max − min + 1)`, exact long
   * floor division), with per-bin row count, positive count, and empirical
   * positive rate — the score-vs-outcome agreement table behind reliability
   * diagrams and threshold tuning. Empty bins are absent (no dense
   * range join needed). The min/max side is a 1-row broadcast scalar (the
   * catalog's exempted crossJoin(broadcast) pattern).
   */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val scored = df.select(scoreCol.cast("long").as("score"),
      labelCol.cast("long").as("label"))
    val bounds = scored.agg(min(col("score")).as("smin"),
      max(col("score")).as("smax"))
    scored.crossJoin(broadcast(bounds))
      // integer `div`, not `/`: Column./ is double division, whose rounding
      // is not a floor for large longs
      .withColumn("bin",
        expr(s"(score - smin) * $nBins div (smax - smin + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
        min(col("score")).as("score_lo"), max(col("score")).as("score_hi"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n"))
  }

  /**
   * Full precision/recall curve at EVERY achievable operating point: one row
   * per distinct score s, reporting the confusion counts of the classifier
   * "predict positive iff score ≥ s" — exact long tp/fp/fn (the threshold-
   * sweep artifact behind picking a corpus-filter cutoff: "what keep-rate do
   * I trade for what purity"). precision/recall/f1 are each ONE final IEEE
   * division over exact longs (f1 in the 2·tp harmonic form, so it needs no
   * intermediate ratios); recall/f1 are null when the corpus has no
   * positives.
   *
   * Same scale discipline as [[aucExact]]: aggregate by score first, run the
   * running sums on the distinct-score frame (bounded by the score domain),
   * never a per-document global sort.
   */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    // score used as-is (the aucExact convention) — a silent cast("long")
    // would truncate fractional scores and collapse distinct thresholds
    val byScore = df.groupBy(scoreCol.as("score"))
      .agg(count(lit(1)).as("c"), sum(labelCol.cast("long")).as("p"))
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byScore
      .withColumn("tp", sum(col("p")).over(desc))
      .withColumn("pp", sum(col("c")).over(desc))
      .withColumn("n_pos", sum(col("p")).over(all))
      .select(col("score").as("threshold"),
        col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("pp")).as("precision_at"),
        when(col("n_pos") =!= 0L,
          col("tp").cast("double") / col("n_pos")).as("recall_at"),
        when(col("n_pos") + col("pp") =!= 0L,
          (lit(2L) * col("tp")).cast("double") / (col("n_pos") + col("pp")))
          .as("f1_at"))
  }
}
