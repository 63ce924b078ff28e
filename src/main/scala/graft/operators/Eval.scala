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

  /** Fixed-point DCG position weights 1/log2(r+1) for ranks 1..k, scaled
    * to `scale` and floored — computed ONCE here and inlined as plan
    * literals in both the Spark plan and the DuckDB oracle (the HLL
    * ln-table precedent), so the two engines never evaluate a log at
    * query time. scale = 2^30 keeps dcg·2^20 (the ndcg fixed-point
    * numerator) far inside long range for any realistic k and grade. */
  def dcgWeights(k: Int, scale: Long = 1L << 30): Seq[Long] =
    (1 to k).map(r =>
      math.floor(scale / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /**
   * Retrieval-ranking evaluation — NDCG@k and reciprocal rank per query,
   * grading a (query, doc, score) candidate list against an integer
   * relevance label. Every intermediate is an exact long:
   *
   *  - rank = row_number by (score desc, doc) per query (the tie column
   *    makes ranking deterministic whenever scores are — the catalog's
   *    BM25 scores are bit-reproducible doubles);
   *  - DCG@k = Σ_{r≤k} rel_r · W(r) with [[dcgWeights]] plan literals —
   *    an exact, order-independent long sum; ideal DCG is the same sum
   *    over the rel-desc (tie doc) ranking OF THE CANDIDATE SET (the
   *    "ndcg of what was retrieved" convention — an unretrieved relevant
   *    doc is the recall metric's business, not the ranking metric's);
   *  - ndcg_scaled = (dcg·2^20) div idcg (exact fixed-point), ndcg = one
   *    final IEEE division; rr_scaled = 2^20 div (rank of first rel>0
   *    hit), null when the query retrieved nothing relevant.
   *
   * Scale shape: one key shuffle on query; both windows are bounded by
   * the per-query candidate count (top-k lists, never the corpus).
   * Output: (query, n_hits, dcg_scaled, idcg_scaled, ndcg_scaled, ndcg,
   * first_rel_rank, rr_scaled).
   */
  def ndcgAtK(hits: DataFrame, queryCol: Column, docCol: Column,
      scoreCol: Column, relCol: Column, k: Int,
      rrScale: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wq = Window.partitionBy(col("query"))
      .orderBy(col("score").desc, col("doc"))
    val wi = Window.partitionBy(col("query"))
      .orderBy(col("rel").desc, col("doc"))
    val wTable = array(dcgWeights(k).map(lit(_)): _*)
    def dcgOf(rank: Column): Column =
      sum(when(rank <= k, col("rel") * element_at(wTable, rank.cast("int")))
        .otherwise(0L))
    hits.select(queryCol.as("query"), docCol.as("doc"),
        scoreCol.as("score"), relCol.cast("long").as("rel"))
      .withColumn("rank", row_number().over(wq))
      .withColumn("irank", row_number().over(wi))
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_hits"),
        dcgOf(col("rank")).as("dcg_scaled"),
        dcgOf(col("irank")).as("idcg_scaled"),
        min(when(col("rel") > 0L, col("rank"))).as("first_rel_rank"))
      .select(col("query"), col("n_hits"), col("dcg_scaled"),
        col("idcg_scaled"),
        when(col("idcg_scaled") > 0L,
          expr(s"(dcg_scaled * ${rrScale}L) div idcg_scaled"))
          .as("ndcg_scaled"),
        when(col("idcg_scaled") > 0L,
          col("dcg_scaled").cast("double") / col("idcg_scaled")).as("ndcg"),
        col("first_rel_rank"),
        expr(s"${rrScale}L div first_rel_rank").as("rr_scaled"))
  }

  /**
   * Corpus roll-up of [[ndcgAtK]]: mean NDCG and MRR over queries, in
   * exact numerator/denominator form — the sums are exact longs (each
   * per-query value is already a 2^20 fixed-point long; a query with no
   * relevant hit contributes 0, the standard convention), and the means
   * are ONE final IEEE division each. Output: one row (n_queries,
   * sum_ndcg_scaled, mean_ndcg, sum_rr_scaled, mrr).
   */
  def retrievalEvalSummary(perQuery: DataFrame,
      rrScale: Long = 1L << 20): DataFrame =
    perQuery.agg(count(lit(1)).as("n_queries"),
        sum(coalesce(col("ndcg_scaled"), lit(0L))).as("sum_ndcg_scaled"),
        sum(coalesce(col("rr_scaled"), lit(0L))).as("sum_rr_scaled"))
      .select(col("n_queries"), col("sum_ndcg_scaled"),
        (col("sum_ndcg_scaled").cast("double") /
          (lit(rrScale.toDouble) * col("n_queries"))).as("mean_ndcg"),
        col("sum_rr_scaled"),
        (col("sum_rr_scaled").cast("double") /
          (lit(rrScale.toDouble) * col("n_queries"))).as("mrr"))

  /**
   * Recall@K + average precision (the MAP numerator) per query — the
   * retrieval-eval breadth beyond [[ndcgAtK]]'s graded ranking: grade an
   * approximate top-K list (`approx`: query, doc, rank) against the exact
   * ground-truth set (`truth`: query, doc — e.g. the brute-force L2 top-K),
   * every intermediate an exact long:
   *
   *  - a HIT is an approx row whose doc is in the query's truth set
   *    (equi-join, broadcastable whenever the query panel is);
   *  - recall_scaled = n_hits·scale div n_true (exact fixed point; n_true
   *    is the query's truth-set size, so ties in the truth frontier that
   *    enlarge it are graded against what the truth actually holds);
   *  - AP in the [[dcgWeights]] fixed-point discipline: at each hit rank r,
   *    precision@r = hits_upto_r / r contributes (hits_upto_r·scale) div r
   *    — floor division, bit-identical in any engine — and
   *    ap_scaled = Σ contributions div n_true (the standard AP@K with the
   *    min(|rel|, K) = n_true denominator for K-sized truth).
   *
   * One key shuffle on query; the running hit count is a window bounded by
   * the per-query list length. Queries present in `truth` but absent from
   * `approx` (a tier that returned nothing) still report, with zero hits —
   * a silent drop would inflate the tier's mean. Output: (query, n_true,
   * n_hits, recall_scaled, ap_scaled).
   *
   * Input contract (r16 advice): the truth projection is DEDUPLICATED
   * here (duplicate (query, doc) truth rows would otherwise fan out the
   * hit join — n_hits could exceed n_true); `approx` must carry unique
   * (query, doc) pairs (a top-k list by construction — duplicates would
   * double-count hits) and 1-BASED ranks — a rank of 0 makes the AP
   * contribution's floor division NULL, which sum() would silently drop.
   */
  def recallApAtK(approx: DataFrame, truth: DataFrame, queryCol: Column,
      docCol: Column, rankCol: Column, truthQueryCol: Column,
      truthDocCol: Column, scale: Long = 1L << 20): DataFrame = {
    val a = approx.select(queryCol.as("query"), docCol.as("doc"),
      rankCol.cast("long").as("rank"))
    val t = truth.select(truthQueryCol.as("query"), truthDocCol.as("doc"))
      .distinct()
      .withColumn("hit", lit(1L))
    val w = Window.partitionBy(col("query")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = a.join(t, Seq("query", "doc"), "left")
      .withColumn("hits_upto", sum(coalesce(col("hit"), lit(0L))).over(w))
      .withColumn("ap_part",
        when(col("hit").isNotNull,
          expr(s"(hits_upto * ${scale}L) div rank")).otherwise(lit(0L)))
      .groupBy(col("query"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        sum(col("ap_part")).as("ap_sum"))
    val nTrue = t.groupBy(col("query")).agg(count(lit(1)).as("n_true"))
    nTrue.join(scored, Seq("query"), "left")
      .select(col("query"), col("n_true"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(coalesce(n_hits, 0L) * ${scale}L) div n_true")
          .as("recall_scaled"),
        expr("coalesce(ap_sum, 0L) div n_true").as("ap_scaled"))
  }

  /** Corpus roll-up of [[recallApAtK]] — mean recall@K and MAP over
    * queries in exact numerator form + ONE final IEEE division each
    * (the [[retrievalEvalSummary]] shape). Group by any tier/label
    * columns the caller carried through. Output: one row per group
    * (n_queries, sum_recall_scaled, mean_recall, sum_ap_scaled, map). */
  def recallMapSummary(perQuery: DataFrame, groupCols: Seq[String],
      scale: Long = 1L << 20): DataFrame =
    perQuery.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_queries"),
        sum(col("recall_scaled")).as("sum_recall_scaled"),
        sum(col("ap_scaled")).as("sum_ap_scaled"))
      .select((groupCols.map(col) ++ Seq(col("n_queries"),
        col("sum_recall_scaled"),
        (col("sum_recall_scaled").cast("double") /
          (lit(scale.toDouble) * col("n_queries"))).as("mean_recall"),
        col("sum_ap_scaled"),
        (col("sum_ap_scaled").cast("double") /
          (lit(scale.toDouble) * col("n_queries"))).as("map"))): _*)

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
