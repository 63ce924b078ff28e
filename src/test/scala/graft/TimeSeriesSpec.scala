package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/**
 * Hand-series checks for SAX motif discovery (corpus-scale output is
 * oracle-gated by `events_sax_motifs`): shape-not-level matching, the
 * trivial-match exclusion, flat-window stability, and hot-word hygiene.
 */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  /** One reading per second starting at t=0 for each (key, series). */
  private def df(series: Map[Long, Seq[Double]]) =
    series.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (k, i.toLong, new Timestamp(i * 1000L), v)
      }
    }.toDF("key", "tie", "ts", "value")

  private def motifs(series: Map[Long, Seq[Double]], maxWordSize: Int = 256)
      : Set[(Long, Long, Long, Long, Int)] =
    TimeSeries.saxMotifs(df(series), col("key"), col("ts"), col("tie"),
        col("value"), windowLen = 4, segments = 2, alphabet = 4,
        quantScale = 10L, shapeScale = 100L, minSeparation = 4,
        maxWordSize = maxWordSize, maxL1 = 10L)
      .select(col("key_a"), col("start_a"), col("key_b"), col("start_b"),
        col("is_motif"))
      .as[(Long, Long, Long, Long, Int)].collect().toSet

  test("saxMotifs: the same shape at a different LEVEL matches (min-max symbols)") {
    // rising-then-flat shape at level ~1 and level ~100: per-window
    // normalization makes them the same word and l1 = 0
    val got = motifs(Map(
      1L -> Seq(1.0, 1.0, 5.0, 5.0),
      2L -> Seq(100.0, 100.0, 500.0, 500.0)))
    assert(got == Set((1L, 1L, 2L, 1L, 1)))
  }

  test("saxMotifs: different shapes share no word") {
    val got = motifs(Map(
      1L -> Seq(1.0, 1.0, 5.0, 5.0),    // rising
      2L -> Seq(5.0, 5.0, 1.0, 1.0)))   // falling
    assert(got.isEmpty)
  }

  test("saxMotifs: trivial same-series overlaps are excluded, separated repeats match") {
    // series repeats its shape at start 1 and start 9 (separation 8 >= 4);
    // intermediate overlapping windows of the periodic middle also repeat —
    // every reported same-key pair must respect the separation rule
    val wave = Seq(1.0, 1.0, 5.0, 5.0, 1.0, 1.0, 5.0, 5.0, 1.0, 1.0, 5.0, 5.0)
    val got = motifs(Map(1L -> wave))
    assert(got.nonEmpty)
    assert(got.forall { case (_, sa, _, sb, _) => sb - sa >= 4 })
    assert(got.contains((1L, 1L, 1L, 9L, 1)))
  }

  test("saxMotifs: flat windows are stable; hot words drop") {
    // all-constant series: hi == lo, symbols all 0, no crash; two flat
    // series match each other
    val flat = motifs(Map(1L -> Seq(3.0, 3.0, 3.0, 3.0),
      2L -> Seq(7.0, 7.0, 7.0, 7.0)))
    assert(flat == Set((1L, 1L, 2L, 1L, 1)))
    // with maxWordSize 1 every shared word is hot -> nothing pairs
    assert(motifs(Map(1L -> Seq(3.0, 3.0, 3.0, 3.0),
      2L -> Seq(7.0, 7.0, 7.0, 7.0)), maxWordSize = 1).isEmpty)
  }

  /** (key, win_start, is_hot_word, n_cands, nn_l1, is_discord) rows. */
  private def discords(series: Map[Long, Seq[Double]], maxWordSize: Int = 256,
      minL1: Long = 10L)
      : Set[(Long, Long, Int, Option[Long], Option[Long], Int)] =
    TimeSeries.saxDiscords(df(series), col("key"), col("ts"), col("tie"),
        col("value"), windowLen = 4, segments = 2, alphabet = 4,
        quantScale = 10L, shapeScale = 100L, minSeparation = 4,
        maxWordSize = maxWordSize, minL1 = minL1)
      .select(col("key"), col("win_start"), col("is_hot_word"),
        col("n_cands"), col("nn_l1"), col("is_discord"))
      .as[(Long, Long, Int, Option[Long], Option[Long], Int)]
      .collect().toSet

  test("saxDiscords: a window with no same-word neighbor is a discord") {
    val got = discords(Map(
      1L -> Seq(1.0, 1.0, 5.0, 5.0),    // rising — alone in its word
      2L -> Seq(5.0, 5.0, 1.0, 1.0)))   // falling — alone in its word
    assert(got == Set((1L, 1L, 0, Some(0L), None, 1),
      (2L, 1L, 0, Some(0L), None, 1)))
  }

  test("saxDiscords: a close neighbor suppresses the discord flag") {
    val got = discords(Map(
      1L -> Seq(1.0, 1.0, 5.0, 5.0),
      2L -> Seq(1.0, 1.0, 5.0, 5.0)))   // identical shape -> nn_l1 = 0
    assert(got == Set((1L, 1L, 0, Some(1L), Some(0L), 0),
      (2L, 1L, 0, Some(1L), Some(0L), 0)))
  }

  test("saxDiscords: a far same-word neighbor still flags at minL1") {
    // 3 segments (2-segment windows are degenerate after min-max: lo->0,
    // hi->top always): same coarse word "0,1,3", middle segment fine shape
    // differs -> paired (n_cands = 1), nn_l1 = 17, so minL1 10 flags both
    val got = TimeSeries.saxDiscords(df(Map(
        1L -> Seq(1.0, 1.0, 3.0, 3.0, 5.0, 5.0),
        2L -> Seq(1.0, 1.0, 2.3, 2.3, 5.0, 5.0))),
        col("key"), col("ts"), col("tie"), col("value"),
        windowLen = 6, segments = 3, alphabet = 4, quantScale = 10L,
        shapeScale = 100L, minSeparation = 6, maxWordSize = 256, minL1 = 10L)
      .select(col("key"), col("win_start"), col("is_hot_word"),
        col("n_cands"), col("nn_l1"), col("is_discord"))
      .as[(Long, Long, Int, Option[Long], Option[Long], Int)]
      .collect().toSet
    assert(got == Set((1L, 1L, 0, Some(1L), Some(17L), 1),
      (2L, 1L, 0, Some(1L), Some(17L), 1)), s"got: $got")
  }

  test("seasonalAnomalies: exact residual vs the phase norm; flag at tau") {
    // key 1, phase 0: values 10, 10, 40 -> qv 100,100,400; sum 600, cnt 3;
    // resid_scaled = qv*3 - 600 = -300, -300, +600; tau 150 flags only the 400
    val df = Seq((1L, 10L, 0, 10.0), (1L, 11L, 0, 10.0), (1L, 12L, 0, 40.0),
        (1L, 13L, 1, 10.0))
      .toDF("key", "id", "phase", "value")
    val got = TimeSeries.seasonalAnomalies(df, col("key"), col("id"),
        col("phase"), col("value"), quantScale = 10L, tauScaled = 150L)
      .select(col("id"), col("resid_scaled"), col("s_cnt"), col("is_anomaly"))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((10L, -300L, 3L, 0), (11L, -300L, 3L, 0),
      (12L, 600L, 3L, 1), (13L, 0L, 1L, 0)))
  }

  test("scoreAgainstProfile: a reading with no profile cell survives, unscored") {
    // profile trained without key 2: its reading must NOT be dropped
    // (inner-join regression, r14 self-review) — it comes back with null
    // residual/count/verdict, the explicit cold-start signal
    val hist = Seq((1L, 10L, 0, 10.0)).toDF("key", "id", "phase", "value")
    val live = Seq((1L, 20L, 0, 10.0), (2L, 21L, 0, 99.0))
      .toDF("key", "id", "phase", "value")
    val profile = TimeSeries.seasonalProfile(hist, col("key"), col("phase"),
      col("value"), quantScale = 10L)
    val got = TimeSeries.scoreAgainstProfile(live, profile, col("key"),
        col("id"), col("phase"), col("value"), quantScale = 10L,
        tauScaled = 150L)
      .select(col("id"), col("s_cnt"), col("is_anomaly"))
      .as[(Long, Option[Long], Option[Int])].collect().toSet
    assert(got == Set((20L, Some(1L), Some(0)), (21L, None, None)), s"got $got")
  }

  test("saxDiscords: hot-word windows are non-discord without pairing") {
    val got = discords(Map(
      1L -> Seq(3.0, 3.0, 3.0, 3.0),
      2L -> Seq(7.0, 7.0, 7.0, 7.0)), maxWordSize = 1)
    assert(got == Set((1L, 1L, 1, None, None, 0),
      (2L, 1L, 1, None, None, 0)))
  }
}
