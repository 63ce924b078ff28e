package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/**
 * Bounds the `percentile_approx`-based sketch ([[Profile.approxPercentiles]]
 * and the opt-in `columnProfile` percentiles) against the EXACT rank-based
 * formulation the `events_value_percentiles` catalog oracle uses
 * (row_number over (value, event_id), rank = max(ceil(n*p), 1)).
 *
 * The sketch's contract is a RANK bound, not a value bound: the returned
 * value is a real element whose rank is within n/accuracy of the requested
 * rank. With ties a value occupies a rank interval [n_lt+1, n_le]; the check
 * is interval-distance from the target rank.
 */
class PercentileSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val ps = Seq(0.5, 0.9)
  private val accuracy = 10000

  private lazy val events = Tables.events(spark, sfDir)
    .select(col("event_type"), col("value").cast("double").as("value"))
    .filter(col("value").isNotNull)

  /** Assert `approx` sits within rank `eps` of pct `p` among `vals`. */
  private def assertRankBounded(vals: Array[Double], approx: Double,
      p: Double, eps: Long, what: String): Unit = {
    val n = vals.length.toLong
    val target = math.max(math.ceil(n * p).toLong, 1L)
    val nLt = vals.count(_ < approx).toLong
    val nLe = vals.count(_ <= approx).toLong
    assert(nLe > nLt, s"$what: approx value $approx is not a real element")
    val dist =
      if (target < nLt + 1) nLt + 1 - target
      else if (target > nLe) target - nLe
      else 0L
    assert(dist <= eps,
      s"$what: approx $approx has rank [${nLt + 1},$nLe], target $target, " +
        s"distance $dist > bound $eps (n=$n)")
  }

  test("grouped sketch is rank-bounded against the exact oracle per event_type") {
    val approx = Profile.approxPercentiles(
        events, col("value"), Seq(col("event_type")), ps, accuracy)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("pct")) ->
        r.getAs[Double]("approx_value")).toMap
    val byType = events.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(byType.nonEmpty && approx.size == byType.size * ps.size)
    byType.foreach { case (t, vals) =>
      val eps = math.max(1L, vals.length.toLong / accuracy)
      ps.foreach { p =>
        assertRankBounded(vals, approx((t, p)), p, eps, s"$t@p$p")
      }
    }
  }

  test("columnProfile percentiles: numeric columns sketched, others null") {
    val prof = Profile.columnProfile(
        events, exact = true, percentiles = ps, accuracy = accuracy)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof("event_type").getAs[scala.collection.Seq[Double]]("approx_percentiles") == null)
    val got = prof("value").getAs[scala.collection.Seq[Double]]("approx_percentiles")
    assert(got != null && got.size == ps.size)
    val all = events.select(col("value")).collect()
      .map(_.getDouble(0)).sorted
    val eps = math.max(1L, all.length.toLong / accuracy)
    ps.zip(got).foreach { case (p, v) =>
      assertRankBounded(all, v, p, eps, s"columnProfile value@p$p")
    }
  }

  test("columnProfile without percentiles keeps its historical schema") {
    assert(Profile.columnProfile(events).columns.toSeq ==
      Seq("column_name", "n_rows", "n_nulls", "n_distinct", "null_ratio"))
  }

  test("a coarse sketch still honors its (looser) rank bound") {
    // accuracy=100 on ~10k rows: bound is n/100 ≈ tens of ranks — the point
    // is the CONTRACT holds at low accuracy, where the sketch actually
    // approximates rather than degenerating to exact.
    val all = events.select(col("value")).collect()
      .map(_.getDouble(0)).sorted
    val coarse = Profile.approxPercentiles(
        events, col("value"), Nil, ps, accuracy = 100)
      .collect().map(r => r.getAs[Double]("pct") -> r.getAs[Double]("approx_value"))
      .toMap
    val eps = math.max(1L, all.length.toLong / 100)
    ps.foreach { p => assertRankBounded(all, coarse(p), p, eps, s"coarse@p$p") }
  }
}
