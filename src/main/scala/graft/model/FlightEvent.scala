package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical data model for the flight-event analytics surface.
 *
 * The reference engine (`/root/reference`) hard-codes this schema in its
 * JSON field extraction (FlightEventAggregator.java:43-59) and duplicates the
 * record type twice (KafkaUtils.java:47-58, FlightEventAggregator.java:183-194).
 * We define it exactly once, as a case class (for typed `Dataset[FlightEvent]`
 * views) plus an explicit `StructType` (the contract every untyped DataFrame
 * operator consumes).
 *
 * Timestamps are zone-less in the reference (`java.time.LocalDateTime`,
 * ISO-8601). We map them to Spark `TimestampType` with the session time zone
 * pinned to UTC (build.sbt), which is value-identical for all arithmetic the
 * engine performs.
 */
final case class FlightEvent(
    flight_id: String,
    flight_number: String,
    airline: String,
    origin: String,
    destination: String,
    scheduled_time: java.sql.Timestamp,
    actual_time: java.sql.Timestamp,
    is_delayed: Int, // 0|1, matches ClickHouse UInt8 in reference DDL (readme.txt:18)
    user_id: String,
    delay_minutes: Long // signed: early arrivals are negative (Duration.toMinutes)
)

object FlightEvent {

  /** Parsed-event contract — every operator in graft.operators consumes this. */
  val schema: StructType = StructType(Seq(
    StructField("flight_id", StringType, nullable = false),
    StructField("flight_number", StringType, nullable = false),
    StructField("airline", StringType, nullable = false),
    StructField("origin", StringType, nullable = false),
    StructField("destination", StringType, nullable = false),
    StructField("scheduled_time", TimestampType, nullable = false),
    StructField("actual_time", TimestampType, nullable = false),
    StructField("is_delayed", IntegerType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("delay_minutes", LongType, nullable = false)
  ))

  /**
   * Wire (JSON) schema for `from_json`. The delay flag is a union in the
   * reference (FlightEventAggregator.java:51-57): boolean `delayed` wins if
   * present, else string `status` compared case-insensitively to "DELAYED",
   * else not-delayed. Both union members are declared so either shape parses.
   */
  val wireSchema: StructType = StructType(Seq(
    StructField("flightId", StringType),
    StructField("flightNumber", StringType),
    StructField("airline", StringType),
    StructField("origin", StringType),
    StructField("destination", StringType),
    StructField("scheduledArrival", StringType),
    StructField("actualArrival", StringType),
    StructField("delayed", BooleanType),
    StructField("status", StringType),
    StructField("userId", StringType)
  ))
}
