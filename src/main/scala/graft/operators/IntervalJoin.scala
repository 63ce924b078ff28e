package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: attach each point row to every interval row
 * containing it — half-open `start <= t < end` — optionally within equal
 * join keys. Spark has no native range join, and the naive theta-join
 * (`ON t >= start AND t < end`) plans a BroadcastNestedLoopJoin — a per-key
 * cartesian that dies at scale. This is the bucketed equi-join form:
 *
 *   1. tile time into `bucketWidthSec` buckets,
 *   2. each INTERVAL registers in every bucket it overlaps (explode of a
 *      per-row sequence — bounded by ceil(span/W)+1),
 *   3. each POINT lands in exactly ONE bucket,
 *   4. EQUI-join on (keys…, bucket), then the exact range predicate filters.
 *
 * Because a point occupies a single bucket, every matching (point,
 * interval) pair is produced exactly once — no post-join dedup (and none of
 * the double-count hazard tiled self-joins usually carry).
 *
 * Cost model at 100 TB: the shuffle is hash(keys…, bucket) on |P| + |I| ·
 * replication rows, where replication = ceil(span/W)+1 — pick W near the
 * typical interval span so replication stays O(1). Join output = true
 * matches + bucket-collision slack killed by the filter; per-task skew is
 * the data's own per-bucket overlap density, not an artifact of the plan.
 * Bucket arithmetic is integer floor-division on epoch seconds (truncating
 * a timestamp to whole seconds cannot change floor(t/W) for integer W, so
 * the predicate — evaluated on the ORIGINAL timestamps — never loses a
 * match to the tiling).
 */
object IntervalJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointTime: String, startCol: String, endCol: String,
      keys: Seq[String] = Nil, bucketWidthSec: Long = 600L): DataFrame = {
    require(bucketWidthSec >= 1, "need a positive bucket width")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns appear on both sides: ${overlap.mkString(", ")}")
    val pB = points.withColumn("__bucket",
      expr(s"cast(`$pointTime` as long) div ${bucketWidthSec}L"))
    val iB = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"cast(`$startCol` as long) div ${bucketWidthSec}L"),
        expr(s"cast(`$endCol` as long) div ${bucketWidthSec}L"))))
    pB.join(iB, keys :+ "__bucket")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bucket")
  }
}
