package graft

import org.apache.spark.sql.functions._
import graft.operators.FlightOps

/** Semantics pinned to the reference (FlightEventAggregator.java:37-72 etc.). */
class FlightOpsSpec extends SparkSpec {
  import spark.implicits._

  private def raw(jsons: String*) = jsons.toDF("value")

  private val okEvent =
    """{"flightId":"F1","flightNumber":"AA-100","airline":"AA","origin":"SFO",
      |"destination":"JFK","scheduledArrival":"2024-01-01T10:00:00",
      |"actualArrival":"2024-01-01T10:45:00","delayed":true,"userId":"u1"}"""
      .stripMargin.replace("\n", "")

  test("parse extracts all fields and derives delay_minutes") {
    val rows = FlightOps.parseFlightEvents(raw(okEvent)).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("flight_id") == "F1")
    assert(r.getAs[String]("airline") == "AA")
    assert(r.getAs[Int]("is_delayed") == 1)
    assert(r.getAs[Long]("delay_minutes") == 45L)
  }

  test("delay flag union: boolean `delayed` wins over `status`") {
    val e = okEvent.replace("\"delayed\":true", "\"delayed\":false,\"status\":\"DELAYED\"")
    val r = FlightOps.parseFlightEvents(raw(e)).collect()(0)
    assert(r.getAs[Int]("is_delayed") == 0) // boolean false beats status DELAYED
  }

  test("delay flag union: status fallback is case-insensitive") {
    val e1 = okEvent.replace("\"delayed\":true,", "") // no flag at all → 0
    val e2 = okEvent.replace("\"delayed\":true", "\"status\":\"delayed\"")
    val e3 = okEvent.replace("\"delayed\":true", "\"status\":\"ON_TIME\"")
    val got = FlightOps.parseFlightEvents(raw(e1, e2, e3))
      .select("is_delayed").as[Int].collect().toSeq
    assert(got == Seq(0, 1, 0))
  }

  test("early arrivals give negative delay_minutes (truncation toward zero)") {
    // 90 seconds early → Duration.toMinutes = -1 (not -2)
    val e = okEvent.replace("\"actualArrival\":\"2024-01-01T10:45:00\"",
      "\"actualArrival\":\"2024-01-01T09:58:30\"")
    val r = FlightOps.parseFlightEvents(raw(e)).collect()(0)
    assert(r.getAs[Long]("delay_minutes") == -1L)
  }

  test("records missing a required field are dropped, visible as rejects") {
    val missing = okEvent.replace("\"flightId\":\"F1\",", "")
    val garbage = "not json at all"
    val df = raw(okEvent, missing, garbage)
    assert(FlightOps.parseFlightEvents(df).count() == 1)
    assert(FlightOps.rejectedFlightEvents(df).count() == 2)
  }

  test("notification payload matches the reference's shape and message") {
    val json = FlightOps.delayNotifications(FlightOps.parseFlightEvents(raw(okEvent)))
      .as[String].collect()(0)
    assert(json.contains(""""flightId":"F1""""))
    assert(json.contains(""""route":"SFO-JFK""""))
    assert(json.contains(""""message":"Your flight AA-100 is delayed by 45 minutes""""))
  }

  test("notifications only include delayed flights") {
    val onTime = okEvent.replace("\"delayed\":true", "\"delayed\":false")
    val df = FlightOps.parseFlightEvents(raw(okEvent, onTime))
    assert(FlightOps.delayNotifications(df).count() == 1)
  }

  test("airlineStats: counts, conditional count, mean over ALL flights, rate") {
    // 3 AA flights in one 2-min window: delays 10, 30 (delayed), -5 (early, not delayed)
    def ev(id: String, sched: String, act: String, delayed: Boolean) =
      s"""{"flightId":"$id","flightNumber":"AA-1","airline":"AA","origin":"A",
         |"destination":"B","scheduledArrival":"$sched","actualArrival":"$act",
         |"delayed":$delayed,"userId":"u"}""".stripMargin.replace("\n", "")
    val df = FlightOps.parseFlightEvents(raw(
      ev("1", "2024-01-01T10:00:10", "2024-01-01T10:10:10", true),
      ev("2", "2024-01-01T10:00:20", "2024-01-01T10:30:20", true),
      ev("3", "2024-01-01T10:01:50", "2024-01-01T09:56:50", false)))
    val r = FlightOps.airlineStats(df, col("scheduled_time"), "2 minutes").collect()(0)
    assert(r.getAs[Long]("total_flights") == 3L)
    assert(r.getAs[Long]("delayed_flights") == 2L)
    // mean of (10, 30, -5) = 35/3 — all flights, negatives included
    assert(math.abs(r.getAs[Double]("avg_delay_minutes") - 35.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("delay_rate") - 200.0 / 3) < 1e-12)
    assert(r.getAs[java.sql.Timestamp]("window_start").toString == "2024-01-01 10:00:00.0")
    assert(r.getAs[java.sql.Timestamp]("window_end").toString == "2024-01-01 10:02:00.0")
  }

  test("routeStats groups by composed route key with origin/destination carried") {
    val df = FlightOps.parseFlightEvents(raw(okEvent))
    val r = FlightOps.routeStats(df, col("scheduled_time"), "3 minutes").collect()(0)
    assert(r.getAs[String]("route") == "SFO-JFK")
    assert(r.getAs[String]("origin") == "SFO")
    assert(r.getAs[String]("destination") == "JFK")
    assert(r.getAs[Long]("total_flights") == 1L)
    assert(r.schema.fieldNames.toSet.intersect(Set("delayed_flights")).isEmpty)
  }

  test("hourlyStats keys on the scheduled hour (event field)") {
    val r = FlightOps.hourlyStats(FlightOps.parseFlightEvents(raw(okEvent)),
      col("scheduled_time"), "5 minutes").collect()(0)
    assert(r.getAs[Int]("hour_of_day") == 10)
  }

  test("compatSinkBounds reproduces the reference's now()-derived bounds; default stays true bounds") {
    val stats = FlightOps.airlineStats(
      FlightOps.parseFlightEvents(raw(okEvent)), col("scheduled_time"), "2 minutes")
    // default mode: TRUE window bounds (event-derived, not wall clock)
    val trueRow = stats.collect()(0)
    assert(trueRow.getAs[java.sql.Timestamp]("window_start").toString == "2024-01-01 10:00:00.0")
    // compat mode: window_end = now() per query execution, start = end - 2 min
    // (FlightEventAggregator.java:103-104 stamps exactly this at the sink)
    val t0 = System.currentTimeMillis()
    val compatRow = FlightOps.compatSinkBounds(stats, "2 minutes").collect()(0)
    val t1 = System.currentTimeMillis()
    val start = compatRow.getAs[java.sql.Timestamp]("window_start").getTime
    val end = compatRow.getAs[java.sql.Timestamp]("window_end").getTime
    assert(end - start == 2 * 60 * 1000L)
    assert(end >= t0 - 1000 && end <= t1 + 1000, s"window_end $end not within [$t0,$t1]")
    // all non-bounds columns are untouched, column order preserved
    assert(compatRow.getAs[Long]("total_flights") == trueRow.getAs[Long]("total_flights"))
    assert(stats.columns.toSeq ==
      FlightOps.compatSinkBounds(stats, "2 minutes").columns.toSeq)
  }
}
