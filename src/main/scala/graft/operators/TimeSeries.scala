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
