package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Boundary-exact contracts for the bucketed interval join: half-open
  * endpoints, multi-bucket intervals, overlapping intervals (each pair
  * exactly once — the single-bucket-per-point property), keyed scoping,
  * and inverted intervals matching nothing. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("half-open endpoints, multi-bucket spans, overlap multiplicity") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: matches
      (2L, ts("2024-01-01 10:30:00")), // interior (and in overlap zone)
      (3L, ts("2024-01-01 11:00:00")), // == end of iv A: no match on A
      (4L, ts("2024-01-01 23:59:59"))) // far outside
      .toDF("point_id", "p_ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // A
      (200L, ts("2024-01-01 10:15:00"), ts("2024-01-01 12:15:00")), // B overlaps A, spans buckets
      (300L, ts("2024-01-01 12:00:00"), ts("2024-01-01 11:00:00"))) // inverted: empty
      .toDF("iv_id", "start_ts", "end_ts")
    // small bucket (10 min) forces B across 13 buckets — every pair must
    // still appear exactly once
    val got = IntervalJoin.intervalJoin(points, intervals, "p_ts",
        "start_ts", "end_ts", keys = Nil, bucketWidthSec = 600L)
      .select("point_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("keys scope the join; matches equal the naive theta-join") {
    val points = (1L to 60L).map(i =>
      (i, i % 5, ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00")))
      .toDF("point_id", "k", "p_ts")
    val intervals = (1L to 20L).map(i =>
      (100L + i, i % 5, ts(f"2024-01-01 ${(i * 3) % 22}%02d:00:00"),
        ts(f"2024-01-01 ${(i * 3) % 22 + 2}%02d:00:00")))
      .toDF("iv_id", "k", "start_ts", "end_ts")
    val got = IntervalJoin.intervalJoin(points, intervals, "p_ts",
        "start_ts", "end_ts", keys = Seq("k"), bucketWidthSec = 1800L)
      .select("point_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
      .select("point_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got == naive, s"bucketed=$got naive=$naive")
  }

  test("colliding non-key columns are rejected at construction") {
    val p = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "t")
    val iv = Seq((2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      IntervalJoin.intervalJoin(p, iv, "t", "s", "e")
    }
  }
}
