package graft

import graft.operators.FlightOps
import graft.sinks.ClickHouseDialect
import graft.sources.{FlightGen => FlightGenSrc}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Pins [[ClickHouseDialect]] to the reference deployment's DDL
 * (/root/reference/readme.txt:41-70 plus the flights.flights ALTERs at
 * :36-38): identifier quoting, the scalar type map, and — per sink frame —
 * that every column this library writes maps to a ClickHouse type that is
 * insert-compatible with the column type the reference's tables declare.
 *
 * "Insert-compatible" matters because the reference pre-creates its tables:
 * Spark's JDBC writer only uses `getJDBCType` names on CREATE; on append it
 * binds values by JDBC type. Three deliberate widenings are pinned here:
 *   - counts are Spark `long` → `Int64` create-type, inserted into the
 *     reference's `UInt64` columns (counts are non-negative by construction);
 *   - `hour_of_day` is Spark `int` → `Int32`, inserted into `UInt8`
 *     (range 0-23 by construction of `hour()`);
 *   - timestamps are `DateTime64(3)` create-type vs the reference's
 *     second-precision `DateTime` (sub-second precision is truncated by CH
 *     on insert — lossless for the reference's whole-second window bounds).
 */
class ClickHouseDialectSpec extends SparkSpec {

  // ---- reference DDL, transcribed ---------------------------------------
  private val airlineDdl = Map(
    "airline" -> "String", "total_flights" -> "UInt64",
    "delayed_flights" -> "UInt64", "avg_delay_minutes" -> "Float64",
    "delay_rate" -> "Float64", "window_start" -> "DateTime",
    "window_end" -> "DateTime")
  private val routeDdl = Map(
    "route" -> "String", "origin" -> "String", "destination" -> "String",
    "total_flights" -> "UInt64", "avg_delay_minutes" -> "Float64",
    "window_start" -> "DateTime", "window_end" -> "DateTime")
  private val hourlyDdl = Map(
    "hour_of_day" -> "UInt8", "total_flights" -> "UInt64",
    "delayed_flights" -> "UInt64", "avg_delay_minutes" -> "Float64",
    "window_start" -> "DateTime", "window_end" -> "DateTime")
  // flights.flights base columns are implied by the parse schema; the readme
  // pins airline String and delay_minutes Int64 via ALTER (readme.txt:36-38)
  private val rawDdl = Map(
    "flight_id" -> "String", "flight_number" -> "String",
    "airline" -> "String", "origin" -> "String", "destination" -> "String",
    "scheduled_time" -> "DateTime", "actual_time" -> "DateTime",
    "is_delayed" -> "UInt8", "user_id" -> "String",
    "delay_minutes" -> "Int64")

  /** Spark-created CH type → reference-declared CH type compatibility. */
  private def insertCompatible(created: String, declared: String): Boolean =
    created == declared || ((created, declared) match {
      case ("Int64", "UInt64") => true // non-negative counts
      case ("Int32", "UInt8") => true // hour_of_day 0-23, is_delayed 0/1
      case ("DateTime64(3)", "DateTime") => true // whole-second values
      case _ => false
    })

  private def chType(dt: DataType): String =
    ClickHouseDialect.getJDBCType(dt)
      .getOrElse(fail(s"dialect has no mapping for $dt")).databaseTypeDefinition

  private lazy val events: DataFrame =
    FlightOps.parseFlightEvents {
      import spark.implicits._
      (0L until 200L).map(FlightGenSrc.eventJson).toDF("value")
    }

  test("canHandle matches clickhouse JDBC URLs only") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://ch:8123/flights"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:t"))
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://h/db"))
  }

  test("identifiers are backtick-quoted (CH rejects double quotes)") {
    assert(ClickHouseDialect.quoteIdentifier("window_start") == "`window_start`")
    assert(ClickHouseDialect.quoteIdentifier("batch_id") == "`batch_id`")
  }

  test("scalar type map is pinned") {
    assert(chType(StringType) == "String")
    assert(chType(TimestampType) == "DateTime64(3)")
    assert(chType(IntegerType) == "Int32")
    assert(chType(LongType) == "Int64")
    assert(chType(DoubleType) == "Float64")
  }

  private def assertFrameMatchesDdl(frame: DataFrame, ddl: Map[String, String],
      what: String): Unit = {
    val schema = frame.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema.keySet == ddl.keySet,
      s"$what columns ${schema.keySet} != reference DDL ${ddl.keySet}")
    ddl.foreach { case (colName, declared) =>
      val created = chType(schema(colName))
      assert(insertCompatible(created, declared),
        s"$what.$colName: dialect maps to $created, reference declares " +
          s"$declared — not insert-compatible")
    }
  }

  test("airline_delay_stats frame matches readme.txt:42-50 DDL") {
    assertFrameMatchesDdl(
      FlightOps.airlineStats(events, col("scheduled_time")),
      airlineDdl, "airline_delay_stats")
  }

  test("route_delay_stats frame matches readme.txt:52-60 DDL") {
    assertFrameMatchesDdl(
      FlightOps.routeStats(events, col("scheduled_time")),
      routeDdl, "route_delay_stats")
  }

  test("hourly_delay_stats frame matches readme.txt:62-70 DDL") {
    assertFrameMatchesDdl(
      FlightOps.hourlyStats(events, col("scheduled_time")),
      hourlyDdl, "hourly_delay_stats")
  }

  test("raw flights frame matches the flights.flights column set") {
    assertFrameMatchesDdl(events, rawDdl, "flights.flights")
  }
}
