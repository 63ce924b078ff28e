package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.FlightOps
import graft.sources.EventSource
import graft.sinks.EventSink

/**
 * The reference's whole job (FlightEventAggregator.java:27-181) as a
 * Structured Streaming topology: one parsed stream fanned out to five sinks —
 *
 *   1. delayed-flight notifications            (filter → format → sink)
 *   2. per-airline 2-min windowed delay stats  (keyed window agg → sink)
 *   3. per-route 3-min windowed stats          (keyed window agg → sink)
 *   4. per-hour-of-day 5-min windowed stats    (keyed window agg → sink)
 *   5. raw parsed events                       (passthrough persist)
 *
 * Architectural decision (SURVEY §7.3): five independent StreamingQuerys, one
 * per sink — each with its own checkpoint and its own windowed state, exactly
 * mirroring the per-branch accumulator state of the reference. The
 * read-amplification (each query reads the source) is a non-goal at test
 * scale; a single-query `foreachBatch` fan-out variant is the 100 TB design.
 *
 * Time semantics (SURVEY §7.4): the reference windows on *processing* time
 * (`TumblingProcessingTimeWindows`, no watermarks). `TimeMode.Processing`
 * reproduces that by stamping `current_timestamp()` at ingest;
 * `TimeMode.Event(col)` windows on an event field with a watermark —
 * deterministic, and what tests and the batch oracle use. Both modes run the
 * *same* operator code.
 */
object FlightStreamJob {

  sealed trait TimeMode
  object TimeMode {
    /** Faithful to the reference: wall-clock tumbling windows. */
    case object Processing extends TimeMode
    /** Deterministic: event-time windows with a watermark. */
    final case class Event(timeCol: String, watermark: String = "0 seconds") extends TimeMode
  }

  final case class Branches(
      notifications: StreamingQuery,
      airlineStats: StreamingQuery,
      routeStats: StreamingQuery,
      hourlyStats: StreamingQuery,
      rawEvents: StreamingQuery)

  /** Parse the raw source and stamp the window time column per mode. */
  def parsedStream(spark: SparkSession, source: EventSource, mode: TimeMode): (DataFrame, Column) = {
    val parsed = FlightOps.parseFlightEvents(source.load(spark))
    mode match {
      case TimeMode.Processing =>
        (parsed.withColumn("proc_time", current_timestamp())
          .withWatermark("proc_time", "0 seconds"), col("proc_time"))
      case TimeMode.Event(tc, wm) =>
        (parsed.withWatermark(tc, wm), col(tc))
    }
  }

  /**
   * The 100 TB variant (SURVEY §7.3 option b): ONE StreamingQuery whose
   * foreachBatch persists each parsed micro-batch and fans out to all five
   * destinations — the source is read once per trigger regardless of branch
   * count, which is the property that matters when the source is 100 TB of
   * Kafka backlog.
   *
   * Semantics difference vs [[start]] (documented, inherent to the shape):
   * the three stats branches emit *per-batch partial* window aggregates —
   * each trigger appends that batch's contribution to every window it
   * touches. Downstream stores merge partials (sum counts, sum delay
   * totals), which is why `avg` is decomposed into `delay_minutes_total` —
   * averages of averages don't merge, sums do. This mirrors how the
   * reference's ClickHouse tables would be declared as SummingMergeTree.
   */
  def startFused(
      spark: SparkSession,
      source: EventSource,
      timeCol: Column,
      checkpoint: String,
      writeBranch: (String, DataFrame) => Unit): StreamingQuery = {
    val parsed = FlightOps.parseFlightEvents(source.load(spark))
    parsed.writeStream
      .queryName("flight_fused")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          writeBranch("raw_events", batch)
          writeBranch("notifications", FlightOps.delayNotifications(batch))
          def partial(keys: Seq[(String, Column)], dur: String) =
            batch.groupBy((window(timeCol, dur) +: keys.map { case (n, c) => c.as(n) }): _*)
              .agg(count(lit(1)).as("total_flights"),
                sum(col("is_delayed")).cast("long").as("delayed_flights"),
                sum(col("delay_minutes")).as("delay_minutes_total"))
              .select((col("window.start").as("window_start") +:
                col("window.end").as("window_end") +:
                keys.map { case (n, _) => col(n) } :+ col("total_flights") :+
                col("delayed_flights") :+ col("delay_minutes_total")): _*)
          writeBranch("airline_stats",
            partial(Seq("airline" -> col("airline")), "2 minutes"))
          writeBranch("route_stats", partial(Seq(
            "route" -> concat_ws("-", col("origin"), col("destination")),
            "origin" -> col("origin"), "destination" -> col("destination")), "3 minutes"))
          writeBranch("hourly_stats",
            partial(Seq("hour_of_day" -> hour(col("scheduled_time"))), "5 minutes"))
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /**
   * Wire and start all five branches. `sinkFor` maps branch name →
   * sink ("notifications", "airline_stats", "route_stats", "hourly_stats",
   * "raw_events"), so tests plug Memory sinks where production plugs
   * Kafka/JDBC.
   */
  def start(
      spark: SparkSession,
      source: EventSource,
      mode: TimeMode,
      checkpointRoot: String,
      sinkFor: String => EventSink,
      compatBounds: Boolean = false): Branches = {
    val (parsed, timeCol) = parsedStream(spark, source, mode)

    def cp(name: String) = s"$checkpointRoot/$name"
    // compatBounds reproduces the reference's now()-derived sink bounds
    // (FlightOps.compatSinkBounds); default = true window bounds.
    def bounds(stats: DataFrame, dur: String) =
      if (compatBounds) FlightOps.compatSinkBounds(stats, dur) else stats

    Branches(
      notifications = sinkFor("notifications").start(
        FlightOps.delayNotifications(parsed), cp("notifications"), "notifications"),
      airlineStats = sinkFor("airline_stats").start(
        bounds(FlightOps.airlineStats(parsed, timeCol, "2 minutes"), "2 minutes"),
        cp("airline_stats"), "airline_stats"),
      routeStats = sinkFor("route_stats").start(
        bounds(FlightOps.routeStats(parsed, timeCol, "3 minutes"), "3 minutes"),
        cp("route_stats"), "route_stats"),
      hourlyStats = sinkFor("hourly_stats").start(
        bounds(FlightOps.hourlyStats(parsed, timeCol, "5 minutes"), "5 minutes"),
        cp("hourly_stats"), "hourly_stats"),
      rawEvents = sinkFor("raw_events").start(
        parsed, cp("raw_events"), "raw_events"))
  }
}
