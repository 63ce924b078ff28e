package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sinks.EventSink
import graft.sources.EventSource
import graft.streaming.FlightStreamJob
import graft.streaming.FlightStreamJob.TimeMode

/** End-to-end Structured Streaming: MemoryStream JSON → full topology →
  * memory sinks, in deterministic event-time mode (SURVEY §5.4). */
class StreamingSpec extends SparkSpec {

  private def ev(id: String, airline: String, sched: String, act: String,
      delayed: Boolean) =
    s"""{"flightId":"$id","flightNumber":"$airline-9","airline":"$airline",
       |"origin":"AAA","destination":"BBB","scheduledArrival":"$sched",
       |"actualArrival":"$act","delayed":$delayed,"userId":"u-$id"}"""
      .stripMargin.replace("\n", "")

  test("five-branch topology end-to-end over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-stream-cp").toString

    val branches = FlightStreamJob.start(
      spark,
      EventSource.Existing(input.toDF()),
      TimeMode.Event("scheduled_time"),
      cp,
      _ => EventSink.Memory())

    try {
      input.addData(
        ev("1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true),
        ev("2", "AA", "2024-01-01T10:00:50", "2024-01-01T10:10:50", false),
        ev("3", "BB", "2024-01-01T10:01:10", "2024-01-01T09:51:10", false))
      Seq(branches.notifications, branches.airlineStats, branches.routeStats,
        branches.hourlyStats, branches.rawEvents).foreach(_.processAllAvailable())

      // Raw passthrough and stateless notification branches emit immediately.
      assert(spark.table("raw_events").count() == 3)
      val notes = spark.table("notifications").as[String].collect()
      assert(notes.length == 1 && notes(0).contains(""""flightId":"1""""))

      // Watermarked windows emit once the watermark passes the window end —
      // push a much later sentinel event to close the 10:00 windows.
      input.addData(ev("99", "ZZ", "2024-01-01T12:00:00", "2024-01-01T12:00:00", false))
      Seq(branches.airlineStats, branches.routeStats, branches.hourlyStats)
        .foreach(_.processAllAvailable())

      val airline = spark.table("airline_stats")
        .filter(col("airline") === "AA").collect()(0)
      assert(airline.getAs[Long]("total_flights") == 2L)
      assert(airline.getAs[Long]("delayed_flights") == 1L)
      assert(math.abs(airline.getAs[Double]("avg_delay_minutes") - 15.0) < 1e-12)
      assert(math.abs(airline.getAs[Double]("delay_rate") - 50.0) < 1e-12)

      val route = spark.table("route_stats").filter(col("route") === "AAA-BBB")
      assert(route.count() >= 1) // both airlines share the route; 3-min windows
      val hourly = spark.table("hourly_stats").filter(col("hour_of_day") === 10)
      assert(hourly.select(sum("total_flights")).as[Long].collect()(0) == 3L)
    } finally {
      Seq(branches.notifications, branches.airlineStats, branches.routeStats,
        branches.hourlyStats, branches.rawEvents).foreach(_.stop())
    }
  }

  test("fused single-query topology: one read, five branches, mergeable partials") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-fused-cp").toString
    val out = scala.collection.mutable.Map[String, Seq[org.apache.spark.sql.Row]]()
      .withDefaultValue(Seq.empty)

    val q = FlightStreamJob.startFused(spark, EventSource.Existing(input.toDF()),
      col("scheduled_time"), cp,
      (name, df) => out.synchronized { out(name) = out(name) ++ df.collect().toSeq })
    try {
      // two micro-batches touching the SAME 2-minute window
      input.addData(ev("1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true))
      q.processAllAvailable()
      input.addData(ev("2", "AA", "2024-01-01T10:00:50", "2024-01-01T10:10:50", false))
      q.processAllAvailable()

      assert(out("raw_events").size == 2)
      assert(out("notifications").size == 1)
      // per-batch partials: two rows for the same (window, AA) that MERGE by
      // summation to the true totals
      val aa = out("airline_stats").filter(_.getAs[String]("airline") == "AA")
      assert(aa.size == 2)
      assert(aa.map(_.getAs[Long]("total_flights")).sum == 2L)
      assert(aa.map(_.getAs[Long]("delayed_flights")).sum == 1L)
      assert(aa.map(_.getAs[Long]("delay_minutes_total")).sum == 30L)
    } finally q.stop()
  }

  test("processing-time mode runs the topology (stateless branches emit)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-proc-cp").toString
    val branches = FlightStreamJob.start(spark, EventSource.Existing(input.toDF()),
      TimeMode.Processing, cp, _ => EventSink.Memory())
    try {
      input.addData(ev("P1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true))
      Seq(branches.notifications, branches.airlineStats, branches.routeStats,
        branches.hourlyStats, branches.rawEvents).foreach(_.processAllAvailable())
      // stateless branches emit immediately; windowed branches hold state
      // until their wall-clock windows close (not awaited here)
      assert(spark.table("raw_events").count() == 1)
      assert(spark.table("notifications").count() == 1)
      assert(Seq(branches.airlineStats, branches.routeStats, branches.hourlyStats)
        .forall(_.isActive))
    } finally
      Seq(branches.notifications, branches.airlineStats, branches.routeStats,
        branches.hourlyStats, branches.rawEvents).foreach(_.stop())
  }

  test("compatBounds=true streams reference-style now()-derived bounds to the stats sinks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-compat-cp").toString
    val branches = FlightStreamJob.start(spark, EventSource.Existing(input.toDF()),
      TimeMode.Event("scheduled_time"), cp, _ => EventSink.Memory(),
      compatBounds = true)
    try {
      val t0 = System.currentTimeMillis()
      input.addData(
        ev("C1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true),
        ev("C2", "ZZ", "2024-01-01T12:00:00", "2024-01-01T12:00:00", false))
      Seq(branches.airlineStats, branches.routeStats, branches.hourlyStats)
        .foreach(_.processAllAvailable())
      val t1 = System.currentTimeMillis()
      val r = spark.table("airline_stats").filter(col("airline") === "AA").collect()(0)
      val start = r.getAs[java.sql.Timestamp]("window_start").getTime
      val end = r.getAs[java.sql.Timestamp]("window_end").getTime
      // bounds are the micro-batch's wall clock, not the 2024 event times
      assert(end - start == 2 * 60 * 1000L)
      assert(end >= t0 - 1000 && end <= t1 + 1000)
    } finally
      Seq(branches.notifications, branches.airlineStats, branches.routeStats,
        branches.hourlyStats, branches.rawEvents).foreach(_.stop())
  }

  test("JDBC sink writes micro-batches to an embedded Derby table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-jdbc-cp").toString
    val db = Files.createTempDirectory("graft-derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"

    val parsed = graft.operators.FlightOps.parseFlightEvents(input.toDF())
    val q = EventSink.Jdbc(url, "flights_raw").start(parsed, cp, "jdbc_raw")
    try {
      input.addData(ev("1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true))
      q.processAllAvailable()
      input.addData(ev("2", "BB", "2024-01-01T11:00:10", "2024-01-01T11:05:10", false))
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "flights_raw", new java.util.Properties())
      assert(back.count() == 2)
      assert(back.filter(col("IS_DELAYED") === 1).count() == 1)
    } finally q.stop()
  }

  test("idempotent JDBC sink: a replayed epoch leaves exactly one copy") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-jdbc-idem-cp").toString
    val db = Files.createTempDirectory("graft-derby-idem").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"

    val sink = EventSink.JdbcIdempotent(url, "flights_idem")
    val parsed = graft.operators.FlightOps.parseFlightEvents(input.toDF())
    val q = sink.start(parsed, cp, "jdbc_idem")
    try {
      input.addData(ev("1", "AA", "2024-01-01T10:00:10", "2024-01-01T10:20:10", true))
      q.processAllAvailable()
      input.addData(ev("2", "BB", "2024-01-01T11:00:10", "2024-01-01T11:05:10", false))
      q.processAllAvailable()
      val props = new java.util.Properties()
      assert(spark.read.jdbc(url, "flights_idem", props).count() == 2)
      // simulate a restart re-delivering one epoch: three deliveries of the
      // same (epoch, batch) must leave exactly one copy of its rows
      val replayBatch = graft.operators.FlightOps.parseFlightEvents(
        Seq(ev("3", "CC", "2024-01-01T12:00:10", "2024-01-01T12:05:10", false)).toDF("value"))
      sink.writeEpoch(replayBatch, 100L)
      sink.writeEpoch(replayBatch, 100L)
      sink.writeEpoch(replayBatch, 100L)
      val back = spark.read.jdbc(url, "flights_idem", props)
      assert(back.count() == 3, "replayed epoch duplicated rows")
      assert(back.filter(col("BATCH_ID") === 100).count() == 1)
    } finally q.stop()
  }
}
