package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.FlightOps
import graft.sources.EventSource

/** Streaming joins — beyond the reference's surface but core to a complete
  * streaming engine: stream-static enrichment and watermarked stream-stream
  * interval joins. */
class StreamJoinSpec extends SparkSpec {

  private def ev(id: String, airline: String, sched: String, act: String,
      delayed: Boolean) =
    s"""{"flightId":"$id","flightNumber":"$airline-9","airline":"$airline",
       |"origin":"AAA","destination":"BBB","scheduledArrival":"$sched",
       |"actualArrival":"$act","delayed":$delayed,"userId":"u-$id"}"""
      .stripMargin.replace("\n", "")

  test("stream-static join enriches events with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val dim = Seq(("AA", "Alpha Air"), ("BB", "Beta Blue")).toDF("airline", "airline_name")
    val enriched = FlightOps.parseFlightEvents(input.toDF())
      .join(broadcast(dim), Seq("airline"), "left")
    val q = enriched.writeStream.format("memory").queryName("enriched_out")
      .option("checkpointLocation", Files.createTempDirectory("sj-cp").toString)
      .start()
    try {
      input.addData(
        ev("1", "AA", "2024-01-01T10:00:00", "2024-01-01T10:30:00", true),
        ev("2", "ZZ", "2024-01-01T10:00:00", "2024-01-01T10:00:00", false))
      q.processAllAvailable()
      val got = spark.table("enriched_out")
        .select("flight_id", "airline_name").as[(String, Option[String])]
        .collect().toMap
      assert(got("1").contains("Alpha Air"))
      assert(got("2").isEmpty) // left join keeps unknown airlines
    } finally q.stop()
  }

  test("notification routing runs as a stream-static join over a users dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val users = Seq(
      ("u-1", "u1@example.com", "+1-1", 1, 0, "email", 1), // email-routed
      ("u-2", "u2@example.com", "+1-2", 0, 1, "email", 1), // sms fallback
      ("u-3", "u3@example.com", "+1-3", 1, 1, "email", 0)) // opted out
      .toDF("user_id", "email", "phone", "notify_email", "notify_sms",
        "preferred_channel", "opt_in")
    val routed = graft.operators.Notify.route(
      FlightOps.delayNotificationFields(FlightOps.parseFlightEvents(input.toDF())),
      broadcast(users))
    val q = routed.writeStream.format("memory").queryName("notify_out")
      .option("checkpointLocation", Files.createTempDirectory("nr-cp").toString)
      .start()
    try {
      input.addData(
        ev("1", "AA", "2024-01-01T10:00:00", "2024-01-01T10:30:00", true),
        ev("2", "AA", "2024-01-01T10:00:00", "2024-01-01T10:30:00", true),
        ev("3", "AA", "2024-01-01T10:00:00", "2024-01-01T10:30:00", true),
        ev("4", "AA", "2024-01-01T10:00:00", "2024-01-01T10:00:00", false)) // not delayed
      q.processAllAvailable()
      val got = spark.table("notify_out")
        .select("user_id", "channel", "contact").as[(String, String, String)]
        .collect().toSet
      assert(got == Set(
        ("u-1", "email", "u1@example.com"),
        ("u-2", "sms", "+1-2")))
    } finally q.stop()
  }

  test("watermarked stream-stream interval join pairs delays with later arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val left = MemoryStream[String]
    val right = MemoryStream[String]
    val delayed = FlightOps.parseFlightEvents(left.toDF())
      .filter(col("is_delayed") === 1)
      .select(col("flight_id").as("d_id"), col("airline").as("d_airline"),
        col("scheduled_time").as("d_time"))
      .withWatermark("d_time", "1 hour")
    val arrivals = FlightOps.parseFlightEvents(right.toDF())
      .select(col("flight_id").as("a_id"), col("airline").as("a_airline"),
        col("scheduled_time").as("a_time"))
      .withWatermark("a_time", "1 hour")
    // same airline, arrival scheduled within 2 hours after the delayed flight
    val joined = delayed.join(arrivals,
      col("d_airline") === col("a_airline") &&
        col("a_time") > col("d_time") &&
        col("a_time") <= col("d_time") + expr("INTERVAL 2 HOURS"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", Files.createTempDirectory("ssj-cp").toString)
      .start()
    try {
      left.addData(ev("D1", "AA", "2024-01-01T10:00:00", "2024-01-01T11:00:00", true))
      right.addData(
        ev("A1", "AA", "2024-01-01T11:30:00", "2024-01-01T11:30:00", false), // within 2h
        ev("A2", "AA", "2024-01-01T14:30:00", "2024-01-01T14:30:00", false), // outside
        ev("A3", "BB", "2024-01-01T11:00:00", "2024-01-01T11:00:00", false)) // other airline
      q.processAllAvailable()
      val pairs = spark.table("ssj_out").select("d_id", "a_id")
        .as[(String, String)].collect().toSet
      assert(pairs == Set(("D1", "A1")))
    } finally q.stop()
  }
}
