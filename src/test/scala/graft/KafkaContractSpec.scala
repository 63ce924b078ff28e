package graft

import graft.sinks.EventSink
import graft.sources.EventSource

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
    // bootstrap kafka:9092, topic flight-events, start at latest offsets
    assert(EventSource.Kafka().readerOptions == Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "subscribe" -> "flight-events",
      "startingOffsets" -> "latest"))
    // parameters flow through verbatim — no hidden rewriting
    val custom = EventSource.Kafka("broker-1:9093,broker-2:9093", "other-topic", "earliest")
    assert(custom.readerOptions == Map(
      "kafka.bootstrap.servers" -> "broker-1:9093,broker-2:9093",
      "subscribe" -> "other-topic",
      "startingOffsets" -> "earliest"))
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
}
