package graft

import graft.operators.FlightOps
import graft.sinks.EventSink
import graft.sources.EventSource
import graft.sources.{FlightGen => FlightGenSrc}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The spark-sql-kafka connector is absent in this offline container, so the
 * Kafka I/O boundary cannot run end-to-end here. These tests pin the exact
 * option maps and the value-cast contract instead, so a production
 * deployment (where the connector IS present) cannot silently drift from the
 * reference's consumer/producer semantics (KafkaUtils.java:15-38).
 */
class KafkaContractSpec extends SparkSpec {

  test("Kafka source reader options pin the reference consumer contract") {
    // defaults = the reference's hard-coded source (KafkaUtils.java:15-28):
    // bootstrap kafka:9092, topic flight-events, start at latest offsets.
    // failOnDataLoss=false is the Spark spelling of the reference's loss
    // tolerance (auto.offset.reset=latest + throwaway group id,
    // KafkaUtils.java:17,23): aged-out offsets reset, they don't kill the job.
    assert(EventSource.Kafka().readerOptions == Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "subscribe" -> "flight-events",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false"))
    // parameters flow through verbatim — no hidden rewriting
    val custom = EventSource.Kafka(
      "broker-1:9093,broker-2:9093", "other-topic", "earliest", failOnDataLoss = true)
    assert(custom.readerOptions == Map(
      "kafka.bootstrap.servers" -> "broker-1:9093,broker-2:9093",
      "subscribe" -> "other-topic",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true"))
    // the throwaway flight-consumer-<epochMillis> group id is deliberately
    // absent: Spark's source manages group ids and checkpointed resume
    assert(!custom.readerOptions.keys.exists(_.contains("group")))
  }

  test("value-only string deserialization: Kafka wire rows → one string value column") {
    import spark.implicits._
    // shape of rows the connector returns: binary key/value + metadata
    val wire = Seq((
      "k".getBytes("UTF-8"), """{"flightId":"F1"}""".getBytes("UTF-8"),
      "flight-events", 0, 7L))
      .toDF("key", "value", "topic", "partition", "offset")
    val out = EventSource.Kafka.valueAsString(wire)
    assert(out.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("value", "string")))
    assert(out.as[String].collect().toSeq == Seq("""{"flightId":"F1"}"""))
  }

  test("Kafka sink writer options pin the reference producer contract") {
    // the reference's notification producer (KafkaUtils.java:30-38)
    assert(EventSink.Kafka("kafka:9092", "flight-delay-notifications").writerOptions == Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "topic" -> "flight-delay-notifications"))
  }

  // ---- Wire-level serialization round-trip -------------------------------
  // The Kafka broker is absent offline, but the BYTES that would cross it
  // are fully testable: FlightGen emits the reference's ingress wire format
  // (KafkaUtils.java:40-45 field set) and delayNotifications emits the
  // egress payload documented at readme.txt:77-86. These tests prove the
  // serialization identity a live round-trip would: produced JSON → parse →
  // notify → re-parse loses nothing and matches the documented payload.

  private val notificationSchema = StructType(Seq(
    StructField("flightId", StringType), StructField("userId", StringType),
    StructField("flightNumber", StringType), StructField("airline", StringType),
    StructField("route", StringType), StructField("delayMinutes", LongType),
    StructField("message", StringType)))

  test("wire round-trip: FlightGen JSON → parse → notify → re-parse is lossless") {
    import spark.implicits._
    // 400 generator events cover both delay encodings (boolean `delayed` and
    // string `status`), early arrivals (negative minutes) and all airlines.
    val wire = (0L until 400L).map(FlightGenSrc.eventJson).toDF("value")
    val events = FlightOps.parseFlightEvents(wire)
    // the pre-JSON field frame is the ground truth the payload must carry
    val expected = FlightOps.delayNotificationFields(events).collect()
      .map(_.toString).sorted.toSeq
    // what a consumer of topic flight-delay-notifications would decode
    val reparsed = FlightOps.delayNotifications(events)
      .select(from_json(col("value"), notificationSchema).as("n"))
      .select(col("n.*"))
    val got = reparsed.collect().map(_.toString).sorted.toSeq
    assert(got.size == expected.size && got.nonEmpty,
      s"round-trip changed row count: ${got.size} vs ${expected.size}")
    assert(got == expected, "round-trip altered at least one field value")
    // nothing decodes to null: every payload field survives serialization
    assert(reparsed.filter(
      notificationSchema.fieldNames.map(col(_).isNull).reduce(_ || _)).count() == 0)
  }

  test("notification payload matches readme.txt:77-86 byte-for-byte") {
    import spark.implicits._
    // the documented example payload, as an ingress event that produces it
    val wire = Seq(
      """{"flightId":"ABC123","flightNumber":"AA100","airline":"American",""" +
        """"origin":"NYC","destination":"LAX",""" +
        """"scheduledArrival":"2024-01-01T10:00:00","actualArrival":"2024-01-01T10:45:00",""" +
        """"delayed":true,"userId":"user456"}""").toDF("value")
    val out = FlightOps.delayNotifications(FlightOps.parseFlightEvents(wire))
      .as[String].collect()
    // Same fields, same key ORDER, same message template as the reference's
    // String.format producer (KafkaUtils.java:41-44) and the documented JSON
    // (readme.txt:77-86) — for quote-free fields the bytes are identical.
    assert(out.toSeq == Seq(
      """{"flightId":"ABC123","userId":"user456","flightNumber":"AA100",""" +
        """"airline":"American","route":"NYC-LAX","delayMinutes":45,""" +
        """"message":"Your flight AA100 is delayed by 45 minutes"}"""))
  }

  test("egress improves on the reference: quotes in fields stay valid JSON") {
    import spark.implicits._
    // The reference string-formats with NO escaping — a quote in any field
    // corrupts its payload (KafkaUtils.java:41-44). Ours must stay parseable.
    val wire = Seq(
      """{"flightId":"F\"1","flightNumber":"N1","airline":"A\"line",""" +
        """"origin":"O","destination":"D",""" +
        """"scheduledArrival":"2024-01-01T10:00:00","actualArrival":"2024-01-01T10:30:00",""" +
        """"status":"DELAYED","userId":"u1"}""").toDF("value")
    val reparsed = FlightOps.delayNotifications(
        FlightOps.parseFlightEvents(wire))
      .select(from_json(col("value"), notificationSchema).as("n"))
      .select(col("n.*")).collect()
    assert(reparsed.length == 1)
    assert(reparsed.head.getAs[String]("flightId") == "F\"1")
    assert(reparsed.head.getAs[String]("airline") == "A\"line")
  }
}
