package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series motif discovery over keyed event streams — SAX-shaped
 * (symbolic aggregate approximation) sliding-window search: which segments
 * of which series repeat the same SHAPE, across series or later in the same
 * one. The metrics/sensor-data counterpart of the text near-dup family,
 * re-expressed in the catalog's integer-exact discipline so the whole chain
 * is oracle-verifiable:
 *
 *  - readings quantize once (`floor(value · quantScale)` — exact IEEE
 *    multiply + floor in any engine);
 *  - each window's PAA segments are exact long sums over fixed row frames
 *    (one Window operator computes all of them — a single key shuffle);
 *  - symbols min-max-normalize PER WINDOW with integer floor division
 *    (shape, not level — the SAX idea without per-window z-score floats);
 *  - candidate pairs come from an equi-join on the symbol WORD, hot words
 *    (> maxWordSize members) dropped — the LSH/blocking hygiene that keeps
 *    the pair space Σ|word|² linear in the corpus when the word alphabet
 *    saturates at scale (tune segments/alphabet up with corpus size, the
 *    standard SAX practice);
 *  - verification is an exact L1 distance between finer-quantized
 *    (`shapeScale`) normalized segment vectors; trivial matches (same key,
 *    window starts closer than `minSeparation`) are excluded, the classic
 *    motif rule.
 *
 * Output: (key_a, start_a, key_b, start_b, word, l1, is_motif), start = the
 * 1-based row rank of the window's first reading within its series.
 */
object TimeSeries {

  /** The shared SAX frame pipeline: quantize → sliding-window PAA segment
    * sums (one Window operator) → per-window min-max integer symbols →
    * comma-joined word + finer `shapeScale` normalized segments + the
    * word-occupancy count. Output: (k, win_start, word, wsize,
    * ns0..ns{segments-1}) — one row per complete window. */
  private def saxFrames(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valueCol: Column, windowLen: Int, segments: Int,
      alphabet: Int, quantScale: Long, shapeScale: Long): DataFrame = {
    require(segments >= 2, "need at least two PAA segments")
    require(windowLen % segments == 0, "windowLen must divide into segments")
    require(alphabet >= 2, "need at least a binary alphabet")
    val segLen = windowLen / segments
    val byKey = Window.partitionBy(col("k")).orderBy(col("rn"))
    val s = events.select(keyCol.as("k"), tsCol.as("ts"), tieCol.as("tie"),
        floor(valueCol * quantScale).cast("long").as("qv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("k"))))
    val segCols = (0 until segments).map { j =>
      sum(col("qv")).over(byKey.rowsBetween(j.toLong * segLen,
        (j + 1).toLong * segLen - 1)).as(s"s$j")
    }
    val windows = s
      .select((Seq(col("k"), col("rn").as("win_start"), col("n")) ++ segCols): _*)
      .filter(col("win_start") + (windowLen - 1) <= col("n"))
    val segRefs = (0 until segments).map(j => col(s"s$j"))
    val lo = least(segRefs: _*)
    val hi = greatest(segRefs: _*)
    // per-window min-max shape normalization, integer floor division
    def norm(name: String, scale: Long) =
      expr(s"($name - __lo) * ${scale}L div (__hi - __lo + 1)")
    windows
      .withColumn("__lo", lo).withColumn("__hi", hi)
      // comma-SEPARATED symbols: with no separator an alphabet > 10 would
      // produce ambiguous words ('1'+'11' == '11'+'1'), merging distinct
      // shapes into one word — inflating candidate pair space and
      // mis-applying the hot-word cap (r13 advice)
      .withColumn("word", concat_ws(",", (0 until segments).map(j =>
        norm(s"s$j", alphabet.toLong).cast("string")): _*))
      .select((Seq(col("k"), col("win_start"), col("word")) ++
        (0 until segments).map(j => norm(s"s$j", shapeScale).as(s"ns$j"))): _*)
      .withColumn("wsize", count(lit(1)).over(Window.partitionBy(col("word"))))
  }

  def saxMotifs(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valueCol: Column, windowLen: Int = 16,
      segments: Int = 8, alphabet: Int = 4, quantScale: Long = 1000L,
      shapeScale: Long = 1000L, minSeparation: Int = 16,
      maxWordSize: Int = 256, maxL1: Long = 800L): DataFrame = {
    val kept = saxFrames(events, keyCol, tsCol, tieCol, valueCol, windowLen,
        segments, alphabet, quantScale, shapeScale)
      .filter(col("wsize") <= maxWordSize)
    def side(p: String) = kept.select(
      (Seq(col("word"), col("k").as(s"key_$p"), col("win_start").as(s"start_$p")) ++
        (0 until segments).map(j => col(s"ns$j").as(s"${p}ns$j"))): _*)
    val l1 = (0 until segments)
      .map(j => abs(col(s"ans$j") - col(s"bns$j")))
      .reduce(_ + _)
    side("a").join(side("b"), "word")
      .filter(col("key_a") < col("key_b") ||
        (col("key_a") === col("key_b") &&
          col("start_a") + minSeparation <= col("start_b")))
      .select(col("key_a"), col("start_a"), col("key_b"), col("start_b"),
        col("word"), l1.as("l1"))
      .withColumn("is_motif", (col("l1") <= maxL1).cast("int"))
  }

  /**
   * Time-series DISCORD discovery — the inverse of [[saxMotifs]]: windows
   * whose nearest non-trivial neighbor is FARTHEST (or absent) are the
   * anomalies, the other half of the matrix-profile story. Same SAX frames,
   * same word-bounded candidate discipline:
   *
   *  - candidates are same-WORD pairs only (the SAX heuristic), trivial
   *    neighbors excluded (same key closer than `minSeparation`); each
   *    window's nearest-neighbor L1 is a map-side-combinable `min` over
   *    that equi-join — never a corpus² scan. RECALL CAVEAT, deterministic
   *    and replayed by the oracle: a window whose true nearest neighbor
   *    holds a DIFFERENT word reports the word-local minimum (or none),
   *    which upper-bounds discord candidacy exactly like the motif side's
   *    quantization-boundary misses;
   *  - a window with NO same-word non-trivial neighbor (n_cands = 0,
   *    nn_l1 null) is the strongest discord signal — a shape seen nowhere
   *    else in the corpus;
   *  - HOT words (> maxWordSize members) are the opposite: a saturated
   *    shape bucket is by construction common, so its windows are marked
   *    non-discord without pairing (nn_l1/n_cands null, is_hot_word = 1) —
   *    the same cap that keeps the pair space Σ|word|² linear.
   *
   * Output: (key, win_start, word, is_hot_word, n_cands, nn_l1,
   * is_discord), is_discord = not hot AND (no neighbor OR nn_l1 ≥ minL1).
   */
  def saxDiscords(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valueCol: Column, windowLen: Int = 16,
      segments: Int = 8, alphabet: Int = 4, quantScale: Long = 1000L,
      shapeScale: Long = 1000L, minSeparation: Int = 16,
      maxWordSize: Int = 256, minL1: Long = 400L): DataFrame = {
    val frames = saxFrames(events, keyCol, tsCol, tieCol, valueCol, windowLen,
      segments, alphabet, quantScale, shapeScale)
    val kept = frames.filter(col("wsize") <= maxWordSize)
    def side(p: String) = kept.select(
      (Seq(col("word"), col("k").as(s"key_$p"), col("win_start").as(s"start_$p")) ++
        (0 until segments).map(j => col(s"ns$j").as(s"${p}ns$j"))): _*)
    val l1 = (0 until segments)
      .map(j => abs(col(s"ans$j") - col(s"bns$j")))
      .reduce(_ + _)
    // symmetric candidate pairs (every window is an `a` side), trivial
    // same-key overlaps excluded in BOTH directions
    val nn = side("a").join(side("b"), "word")
      .filter(col("key_a") =!= col("key_b") ||
        abs(col("start_a") - col("start_b")) >= minSeparation)
      .groupBy(col("key_a").as("k"), col("start_a").as("win_start"))
      .agg(min(l1).as("nn_l1"), count(lit(1)).as("n_cands"))
    frames.select(col("k"), col("win_start"), col("word"),
        (col("wsize") > maxWordSize).cast("int").as("is_hot_word"))
      .join(nn, Seq("k", "win_start"), "left")
      .select(col("k").as("key"), col("win_start"), col("word"),
        col("is_hot_word"),
        when(col("is_hot_word") === 0, coalesce(col("n_cands"), lit(0L)))
          .as("n_cands"),
        col("nn_l1"),
        (col("is_hot_word") === 0 &&
          (col("nn_l1").isNull || col("nn_l1") >= minL1)).cast("int")
          .as("is_discord"))
  }

  /**
   * Seasonal-profile anomaly detection — the LEVEL half of the time-series
   * story (motifs/discords match SHAPE): each reading is compared against
   * its key's seasonal norm for its phase (hour-of-day, day-of-week —
   * caller-supplied `phaseCol`), entirely in exact integer arithmetic so
   * the flag replays bit-for-bit in any engine:
   *
   *  - readings quantize once (`floor(value · quantScale)`);
   *  - the seasonal profile is (sum, count) exact longs per (key, phase) —
   *    ONE map-side-combined aggregation, never a window;
   *  - the residual is cross-multiplied instead of divided:
   *    `resid_scaled = qv·cnt − sum` (exact), and the flag is
   *    `|qv·cnt − sum| > tauScaled·cnt  ⇔  |qv − mean| > tauScaled`,
   *    no float mean ever materialized;
   *  - the join back is a (key, phase) equi-join against the profile —
   *    |keys|·|phases| rows, broadcastable whenever the key domain is.
   *
   * Output: (key, id, phase, qv, resid_scaled, s_cnt, is_anomaly).
   */
  def seasonalAnomalies(events: DataFrame, keyCol: Column, idCol: Column,
      phaseCol: Column, valueCol: Column, quantScale: Long = 1000L,
      tauScaled: Long = 200000L): DataFrame =
    scoreAgainstProfile(events,
      seasonalProfile(events, keyCol, phaseCol, valueCol, quantScale),
      keyCol, idCol, phaseCol, valueCol, quantScale, tauScaled)

  /** The persistable half of [[seasonalAnomalies]]: exact (sum, count)
    * longs per (key, phase) — one map-side-combined aggregation. Write it
    * once per base-corpus snapshot; scoring (batch or streaming) is a
    * projection + equi-join against it. Output: (k, phase, s_num, s_cnt). */
  def seasonalProfile(events: DataFrame, keyCol: Column, phaseCol: Column,
      valueCol: Column, quantScale: Long = 1000L): DataFrame =
    events.select(keyCol.as("k"), phaseCol.cast("int").as("phase"),
        floor(valueCol * quantScale).cast("long").as("qv"))
      .groupBy(col("k"), col("phase"))
      .agg(sum(col("qv")).as("s_num"), count(lit(1)).as("s_cnt"))

  /** Score readings against a (possibly persisted) [[seasonalProfile]].
    * Pure projection + LEFT equi-join — works UNCHANGED on a streaming
    * `events` frame (stream-static join, append mode, zero state), which
    * is the operational serving shape: profile trained on history, live
    * readings flagged at ingest. A reading whose (key, phase) cell is
    * absent from the profile — a novel key, arguably the most anomalous
    * input — is NOT dropped (r14 self-review find: an inner join silently
    * swallowed it): it survives with null resid_scaled/s_cnt/is_anomaly,
    * the "unscoreable" verdict the caller routes to its cold-start
    * policy. When the profile derives from the scored data itself
    * ([[seasonalAnomalies]]) every cell exists and the left join is
    * row-identical to the inner one. */
  def scoreAgainstProfile(events: DataFrame, profile: DataFrame,
      keyCol: Column, idCol: Column, phaseCol: Column, valueCol: Column,
      quantScale: Long = 1000L, tauScaled: Long = 200000L): DataFrame = {
    require(tauScaled > 0, "need a positive anomaly threshold")
    // RANGE CONTRACT (r14-advice): the cross-multiplied residual needs
    // |qv|·s_cnt (and tauScaled·s_cnt) inside long range. This is NOT a
    // silent-wrap hazard under the engine's defaults — Spark 4 ANSI mode
    // and DuckDB both RAISE on bigint overflow, so a violation surfaces as
    // an error, never a corrupted flag — but callers quantizing huge
    // values over huge cells should bound quantScale so
    // |value|·quantScale·cnt < 2^63 (a 2^20 quant of a 2^20-bounded value
    // leaves room for 2^22 rows per (key, phase) cell).
    val s = events.select(keyCol.as("k"), idCol.as("id"),
      phaseCol.cast("int").as("phase"),
      floor(valueCol * quantScale).cast("long").as("qv"))
    s.join(profile, Seq("k", "phase"), "left")
      .select(col("k").as("key"), col("id"), col("phase"), col("qv"),
        (col("qv") * col("s_cnt") - col("s_num")).as("resid_scaled"),
        col("s_cnt"),
        (abs(col("qv") * col("s_cnt") - col("s_num"))
          > lit(tauScaled) * col("s_cnt")).cast("int").as("is_anomaly"))
  }

  /**
   * Seasonal-trend DECOMPOSITION — the STL idea in the catalog's
   * integer-exact discipline (the fourth quarter of the TS story:
   * motifs/discords match SHAPE, seasonal anomalies flag LEVEL,
   * changepoints find REGIME; this splits every reading into
   * trend + seasonal + residual so each can be consumed separately):
   *
   *  - TREND is a centered moving window: `trend_num = Σ qv` over the
   *    `window` (odd) rows around the reading — kept as the exact
   *    numerator with the literal denominator `window`, never divided;
   *    edge rows (fewer than `window` neighbors) are NULL — the honest
   *    "undecomposable edge" verdict, not a shrunken-window estimate that
   *    would make edge values incomparable to interior ones;
   *  - the DETRENDED value is cross-multiplied: `d_scaled = qv·window −
   *    trend_num` (exactly `(qv − trend)·window`);
   *  - SEASONAL is the per-(key, phase) mean of the detrended values,
   *    held as exact (Σ d_scaled, count) — one map-side-combined
   *    aggregation over interior rows;
   *  - the RESIDUAL is cross-multiplied once more:
   *    `resid_scaled = d_scaled·s_cnt − s_num`, exactly
   *    `(qv − trend − seasonal)·window·s_cnt` in quant units.
   *
   * Plan shape: ONE key shuffle (the trend window), one (key, phase)
   * map-side aggregation, one broadcastable join back — no sequential
   * pass, every step a window or an aggregate. Output: (key, id, phase,
   * qv, trend_num, d_scaled, s_cnt, resid_scaled); nulls propagate from
   * edge rows through the residual.
   */
  def decompose(events: DataFrame, keyCol: Column, idCol: Column,
      tsCol: Column, tieCol: Column, phaseCol: Column, valueCol: Column,
      window: Int = 25, quantScale: Long = 1000L): DataFrame = {
    require(window >= 3 && window % 2 == 1,
      s"need an odd centered window >= 3, got $window")
    val half = window / 2
    val s = events.select(keyCol.as("k"), idCol.as("id"), tsCol.as("ts"),
      tieCol.as("tie"), phaseCol.cast("int").as("phase"),
      floor(valueCol * quantScale).cast("long").as("qv"))
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))
      .rowsBetween(-half, half)
    val dt = s
      .withColumn("t_num", sum(col("qv")).over(w))
      .withColumn("t_cnt", count(lit(1)).over(w))
      .withColumn("d_scaled",
        when(col("t_cnt") === window, col("qv") * window - col("t_num")))
    val seas = dt.filter(col("d_scaled").isNotNull)
      .groupBy(col("k"), col("phase"))
      .agg(sum(col("d_scaled")).as("s_num"), count(lit(1)).as("s_cnt"))
    dt.join(seas, Seq("k", "phase"), "left")
      .select(col("k").as("key"), col("id"), col("phase"), col("qv"),
        when(col("t_cnt") === window, col("t_num")).as("trend_num"),
        col("d_scaled"), col("s_cnt"),
        (col("d_scaled") * col("s_cnt") - col("s_num")).as("resid_scaled"))
  }

  /** Merge two [[seasonalProfile]] epochs by exact addition — the
    * incremental-artifact property (the HLL-register / dedup-index
    * precedent): profiles are (sum, count) longs per (key, phase), so
    * profile(A ∪ B) = profile(A) ⊎ profile(B) cell-wise, and a nightly
    * job can absorb an epoch without rescanning the base corpus. One
    * map-side-combined aggregation over the concatenated cells.
    * Associative and commutative — fold any number of epochs. */
  def mergeProfiles(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("k"), col("phase"))
      .agg(sum(col("s_num")).as("s_num"), sum(col("s_cnt")).as("s_cnt"))

  /** Key-level (phase-free) profile — the changepoint baseline: exact
    * (sum, count) longs per key, one map-side-combined aggregation.
    * [[seasonalProfile]] with a constant phase, kept as its own surface so
    * the CUSUM contract ("one baseline mean per key") is explicit.
    * Output: (k, s_num, s_cnt). */
  def keyProfile(events: DataFrame, keyCol: Column, valueCol: Column,
      quantScale: Long = 1000L): DataFrame =
    events.select(keyCol.as("k"),
        floor(valueCol * quantScale).cast("long").as("qv"))
      .groupBy(col("k"))
      .agg(sum(col("qv")).as("s_num"), count(lit(1)).as("s_cnt"))

  /**
   * CUSUM changepoint / level-shift detection — the REGIME half of the
   * time-series story (motifs/discords match shape, seasonal anomalies
   * flag single readings; this flags "the metric stepped and STAYED
   * there"): a two-sided cumulative-sum test of each key's readings
   * against its [[keyProfile]] baseline mean, entirely in exact integers:
   *
   *  - the per-reading deviation is cross-multiplied, never divided:
   *    `d_up = (qv·cnt − sum) − slackScaled·cnt` (exactly
   *    `(qv − mean − slack)·cnt` scaled by cnt), `d_dn` mirrored — no
   *    float mean ever materializes;
   *  - the classic CUSUM recursion `S_t = max(0, S_{t−1} + d_t)` is NOT a
   *    plain window function, but its closed form is:
   *    `S_t = P_t − min(P_0..P_t)` with `P` the running prefix sum and
   *    `P_0 = 0` — two window columns over ONE key shuffle, the same
   *    (ts, tie)-ordered frame every TS operator uses;
   *  - a shift flags when `S_t > hScaled·cnt` ⇔ the accumulated
   *    mean-excess beyond the slack exceeds h (both thresholds in the
   *    same quant units as the readings).
   *
   * The slack (reference value) makes the test ignore noise below
   * `slackScaled` per reading; `hScaled` sets how much accumulated excess
   * declares a regime change — the standard CUSUM (k, h) tuning.
   * The streaming twin ([[graft.streaming.StatefulOps.cusumStream]])
   * holds exactly (P, min P) per side per key — O(1) state — against the
   * persisted profile. Output: (key, id, qv, cusum_up, cusum_dn,
   * is_shift_up, is_shift_dn), CUSUM columns in quant·cnt units.
   */
  /** Shared quantized + (ts, tie)-ranked frame: (k, id, ts, tie, qv, rn)
    * with rn the 1-based per-key rank — the positions every forecasting
    * surface regresses against. */
  private def ranked(events: DataFrame, keyCol: Column, idCol: Column,
      tsCol: Column, tieCol: Column, valueCol: Column,
      quantScale: Long): DataFrame =
    events.select(keyCol.as("k"), idCol.as("id"), tsCol.as("ts"),
        tieCol.as("tie"), floor(valueCol * quantScale).cast("long").as("qv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))))

  /**
   * Rolling-origin one-step-ahead FORECAST — the fifth quarter of the
   * time-series story (shape, level, regime, decomposition; this projects
   * FORWARD): at every reading, fit an exact least-squares line (level +
   * trend, the Holt-linear shape) to the trailing `window` readings —
   * STRICTLY PRIOR rows, so every forecast is honest out-of-sample — and
   * report the next-step prediction in exact numerator form:
   *
   *  - positions are 1..W inside the window; the OLS normal equations
   *    over them have CONSTANT integer sums SI = ΣI = W(W+1)/2,
   *    SII = Σi² = W(W+1)(2W+1)/6, D = W·SII − SI² — plan literals;
   *  - the data sums are two sliding-window longs over ONE key shuffle:
   *    Sy = Σ qv, S2 = Σ rn·qv over rows [t−W, t−1]; the position-weighted
   *    sum re-bases exactly: Σ i·y = S2 − (rn_t − W − 1)·Sy;
   *  - slope_num = W·Σiy − SI·Sy, int_num = SII·Sy − SI·Σiy, and the
   *    one-step forecast is fc_num = int_num + slope_num·(W+1) — exactly
   *    forecast·D, never divided;
   *  - err_scaled = qv·D − fc_num is exactly (actual − forecast)·D.
   *
   * Rows with fewer than `window` prior readings report NULL forecast
   * (the decompose edge-null discipline — no shrunken-window estimate).
   * The naive one-step error (qv − previous qv, the MASE denominator) is
   * emitted alongside so the backtest roll-up is a pure aggregation.
   * One key shuffle; rank + sums are two Window passes over the same
   * (ts, tie) partitioning (the CUSUM plan shape).
   * Output: (key, id, qv, fc_num, err_scaled, naive_diff).
   */
  def forecastRolling(events: DataFrame, keyCol: Column, idCol: Column,
      tsCol: Column, tieCol: Column, valueCol: Column, window: Int = 8,
      quantScale: Long = 1000L): DataFrame = {
    require(window >= 2, s"need at least two trailing rows, got $window")
    val w = window.toLong
    val si = w * (w + 1) / 2
    val sii = w * (w + 1) * (2 * w + 1) / 6
    val s = ranked(events, keyCol, idCol, tsCol, tieCol, valueCol, quantScale)
    val trail = Window.partitionBy(col("k")).orderBy(col("rn"))
      .rowsBetween(-window.toLong, -1L)
    val siy = col("s2") - (col("rn") - (w + 1)) * col("sy")
    val slopeNum = lit(w) * siy - lit(si) * col("sy")
    val intNum = lit(sii) * col("sy") - lit(si) * siy
    s.withColumn("sy", sum(col("qv")).over(trail))
      .withColumn("s2", sum(col("rn") * col("qv")).over(trail))
      .withColumn("c", count(lit(1)).over(trail))
      .withColumn("nd", col("qv") - lag(col("qv"), 1).over(
        Window.partitionBy(col("k")).orderBy(col("rn"))))
      .withColumn("fc_num",
        when(col("c") === window, intNum + slopeNum * (w + 1)))
      .select(col("k").as("key"), col("id"), col("qv"), col("fc_num"),
        (col("qv") * (w * sii - si * si) - col("fc_num")).as("err_scaled"),
        when(col("fc_num").isNotNull, col("nd")).as("naive_diff"))
  }

  /**
   * Rolling-origin BACKTEST of [[forecastRolling]] — per-key MASE in exact
   * numerator/denominator form: over the evaluable rows (full trailing
   * window), sae_fc_scaled = Σ|err_scaled| (= D·Σ|forecast error|) and
   * sae_naive = Σ|qv_t − qv_{t−1}| (the naive one-step error over the SAME
   * rows — the same row count, so it cancels and MASE reduces to
   * sae_fc_scaled / (D·sae_naive), ONE final IEEE division; null when the
   * naive walk is flat). Keys with no evaluable rows emit no row. One
   * map-side-combined aggregation over the forecast frame.
   * Output: (key, n_eval, sae_fc_scaled, sae_naive, mase).
   */
  def forecastBacktest(events: DataFrame, keyCol: Column, idCol: Column,
      tsCol: Column, tieCol: Column, valueCol: Column, window: Int = 8,
      quantScale: Long = 1000L): DataFrame = {
    val w = window.toLong
    val d = w * (w * (w + 1) * (2 * w + 1) / 6) - (w * (w + 1) / 2) * (w * (w + 1) / 2)
    forecastRolling(events, keyCol, idCol, tsCol, tieCol, valueCol, window,
        quantScale)
      .filter(col("fc_num").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("err_scaled"))).as("sae_fc_scaled"),
        sum(abs(col("naive_diff"))).as("sae_naive"))
      .withColumn("mase",
        when(col("sae_naive") > 0L,
          col("sae_fc_scaled").cast("double") / (col("sae_naive") * d)))
  }

  /**
   * The persistable level/trend artifact (the keyProfile of the forecast
   * family): per key, the exact OLS sufficient statistics of the LAST
   * `lastN` readings — (n, Σ qv, Σ i·qv) with i = 1..n the position within
   * the retained tail. Bounding the tail is what keeps every downstream
   * product inside long range (the global-history normal equations grow
   * like n⁴·qv) AND is the right serving semantics — the projection
   * extrapolates the RECENT trend, not a decade-old regression. Two
   * window passes (rank desc to keep the tail, rank asc to position it)
   * over one key shuffle, then a map-side aggregation.
   * Output: (k, n, s_y, s_iy).
   */
  def trendProfile(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valueCol: Column, lastN: Int = 64,
      quantScale: Long = 1000L): DataFrame = {
    require(lastN >= 2, s"need at least two retained readings, got $lastN")
    events.select(keyCol.as("k"), tsCol.as("ts"), tieCol.as("tie"),
        floor(valueCol * quantScale).cast("long").as("qv"))
      .withColumn("rd", row_number().over(Window.partitionBy(col("k"))
        .orderBy(col("ts").desc, col("tie").desc)))
      .filter(col("rd") <= lastN)
      .withColumn("i", row_number().over(Window.partitionBy(col("k"))
        .orderBy(col("ts"), col("tie"))))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s_y"),
        sum(col("i") * col("qv")).as("s_iy"))
  }

  /**
   * Score readings against a (possibly persisted) [[trendProfile]] — the
   * forecast serving shape: the artifact's line, extrapolated `h` steps
   * past its training end, in exact cross-multiplied integers:
   *
   *  - SI = n(n+1)/2, SII = n(n+1)(2n+1)/6, den = n·SII − SI² — exact
   *    long expressions of the artifact's n (bounded by trendProfile's
   *    lastN, so every product stays far inside long range);
   *  - slope_num = n·s_iy − SI·s_y, int_num = SII·s_y − SI·s_iy,
   *    fc_num = int_num + slope_num·(n + h) = forecast·den;
   *  - err_scaled = qv·den − fc_num; is_surprise cross-multiplies the
   *    threshold: |err_scaled| > tauScaled·den ⇔ |actual − forecast| >
   *    tau — no division anywhere.
   *
   * Keys whose artifact holds fewer than 2 readings score NULL (a line
   * needs two points — the honest unscoreable verdict, scoreAgainstProfile
   * precedent). Pure projection + equi-join; works UNCHANGED on a
   * streaming frame (stream-static join), and the O(1)-state twin
   * ([[graft.streaming.StatefulOps.forecastScoreStream]]) holds one
   * arrival counter per key. Output: (key, id, h, qv, n, den, fc_num,
   * err_scaled, is_surprise).
   */
  def forecastAgainstProfile(events: DataFrame, profile: DataFrame,
      keyCol: Column, idCol: Column, hCol: Column, valueCol: Column,
      quantScale: Long = 1000L, tauScaled: Long = 200000L): DataFrame = {
    require(tauScaled > 0, "need a positive surprise threshold")
    // `div`, not `/`: Column./ is double division. n(n+1) and
    // n(n+1)(2n+1) are exactly divisible by 2 and 6, so integer div is
    // the identity itself, not a floor approximation.
    val si = expr("n * (n + 1) div 2")
    val sii = expr("n * (n + 1) * (2 * n + 1) div 6")
    val den = col("n") * sii - si * si
    val slopeNum = col("n") * col("s_iy") - si * col("s_y")
    val intNum = sii * col("s_y") - si * col("s_iy")
    events.select(keyCol.as("k"), idCol.as("id"), hCol.cast("long").as("h"),
        floor(valueCol * quantScale).cast("long").as("qv"))
      .join(profile, Seq("k"))
      .withColumn("den", when(col("n") >= 2L, den))
      .withColumn("fc_num",
        when(col("n") >= 2L, intNum + slopeNum * (col("n") + col("h"))))
      .select(col("k").as("key"), col("id"), col("h"), col("qv"), col("n"),
        col("den"), col("fc_num"),
        (col("qv") * col("den") - col("fc_num")).as("err_scaled"),
        when(col("den").isNotNull,
          (abs(col("qv") * col("den") - col("fc_num"))
            > lit(tauScaled) * col("den")).cast("int")).as("is_surprise"))
  }

  def cusumChangepoints(events: DataFrame, profile: DataFrame,
      keyCol: Column, idCol: Column, tsCol: Column, tieCol: Column,
      valueCol: Column, quantScale: Long = 1000L,
      slackScaled: Long = 100L, hScaled: Long = 2000L): DataFrame = {
    require(slackScaled >= 0, "need a non-negative slack")
    require(hScaled > 0, "need a positive decision threshold")
    val s = events.select(keyCol.as("k"), idCol.as("id"), tsCol.as("ts"),
      tieCol.as("tie"), floor(valueCol * quantScale).cast("long").as("qv"))
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.join(profile, Seq("k"))
      .withColumn("d_up",
        col("qv") * col("s_cnt") - col("s_num") - lit(slackScaled) * col("s_cnt"))
      .withColumn("d_dn",
        col("s_num") - col("qv") * col("s_cnt") - lit(slackScaled) * col("s_cnt"))
      .withColumn("p_up", sum(col("d_up")).over(w))
      .withColumn("p_dn", sum(col("d_dn")).over(w))
      // P_0 = 0: the running min is floored at zero with least()
      .withColumn("cusum_up", col("p_up") - least(lit(0L), min(col("p_up")).over(w)))
      .withColumn("cusum_dn", col("p_dn") - least(lit(0L), min(col("p_dn")).over(w)))
      .select(col("k").as("key"), col("id"), col("qv"),
        col("cusum_up"), col("cusum_dn"),
        (col("cusum_up") > lit(hScaled) * col("s_cnt")).cast("int")
          .as("is_shift_up"),
        (col("cusum_dn") > lit(hScaled) * col("s_cnt")).cast("int")
          .as("is_shift_dn"))
  }
}
