package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.FlightOps
import graft.streaming.StatefulOps

class StatefulOpsSpec extends SparkSpec {

  private def ev(id: String, airline: String, sched: String, delayMin: Int) = {
    val act = java.time.LocalDateTime.parse(sched).plusMinutes(delayMin)
    s"""{"flightId":"$id","flightNumber":"$airline-1","airline":"$airline",
       |"origin":"A","destination":"B","scheduledArrival":"$sched",
       |"actualArrival":"$act","delayed":${delayMin > 0},"userId":"u"}"""
      .stripMargin.replace("\n", "")
  }

  test("streaming dedup drops re-deliveries within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val deduped = StatefulOps.dedupStream(
      FlightOps.parseFlightEvents(input.toDF()),
      "scheduled_time", "1 hour", Seq("flight_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", Files.createTempDirectory("dedup-cp").toString)
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev("F1", "AA", "2024-01-01T10:00:00", 20))
      q.processAllAvailable()
      input.addData(
        ev("F1", "AA", "2024-01-01T10:00:00", 20), // duplicate delivery
        ev("F2", "AA", "2024-01-01T10:05:00", 0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("flight_id").as[String].collect().sorted
      assert(ids.toSeq == Seq("F1", "F2"))
    } finally q.stop()
  }

  test("runningAirlineTotals accumulates across micro-batches (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val totals = StatefulOps.runningAirlineTotals(
      StatefulOps.typed(FlightOps.parseFlightEvents(input.toDF())))
    val q = totals.writeStream.format("memory").queryName("totals_out")
      .option("checkpointLocation", Files.createTempDirectory("totals-cp").toString)
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(ev("F1", "AA", "2024-01-01T10:00:00", 20))
      q.processAllAvailable()
      input.addData(
        ev("F2", "AA", "2024-01-01T11:00:00", 10),
        ev("F3", "BB", "2024-01-01T11:00:00", -5))
      q.processAllAvailable()
      val latest = spark.table("totals_out")
        .groupBy("airline")
        .agg(max(struct(col("total_flights"), col("delayed_flights"),
          col("total_delay_minutes"))).as("s"))
        .select(col("airline"), col("s.*"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(latest("AA") == ((2L, 2L, 30L))) // state carried across batches
      assert(latest("BB") == ((1L, 0L, -5L)))
    } finally q.stop()
  }
}
