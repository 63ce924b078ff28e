package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source abstraction for the streaming engine. The reference hard-codes one
 * Kafka source (KafkaUtils.java:15-28: topic `flight-events`, value-only
 * string deserialization, latest offsets, throwaway consumer group). Here the
 * source is a small ADT so the same pipeline runs from Kafka in production
 * and from files / rate / memory streams in tests — every variant produces a
 * single string `value` column, the contract [[graft.operators.FlightOps
 * .parseFlightEvents]] consumes.
 *
 * Offset semantics divergence (documented, deliberate): the reference's fresh
 * `flight-consumer-<epochMillis>` group id means "start from now, never
 * resume". Spark's checkpointed source supersedes that with exactly-once
 * resume; passing `startingOffsets=latest` with a fresh checkpoint dir
 * reproduces the reference behavior when wanted.
 */
sealed trait EventSource {
  def load(spark: SparkSession): DataFrame
}

object EventSource {

  /** Kafka topic → `value: string`. Requires the spark-sql-kafka connector on
    * the classpath (not present in this offline test container — the code
    * path is exercised in production deployments only). */
  final case class Kafka(
      bootstrapServers: String = "kafka:9092",
      topic: String = "flight-events",
      startingOffsets: String = "latest") extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load()
        .select(col("value").cast("string").as("value"))
  }

  /** Newline-delimited JSON files appearing in a directory. */
  final case class FileDir(path: String, maxFilesPerTrigger: Int = 16) extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path)
        .select(col("value"))
  }

  /** Synthetic rate source mapped to flight-event JSON — load/perf testing
    * without Kafka. Deterministic given the rate stream's (timestamp, value). */
  final case class Rate(rowsPerSecond: Int = 1000) extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond)
        .load()
        .select(to_json(struct(
          concat(lit("F"), col("value")).as("flightId"),
          concat(lit("FL-"), col("value") % 1000).as("flightNumber"),
          concat(lit("AL"), col("value") % 7).as("airline"),
          concat(lit("O"), col("value") % 11).as("origin"),
          concat(lit("D"), col("value") % 13).as("destination"),
          date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("scheduledArrival"),
          date_format(col("timestamp") + expr("make_interval(0,0,0,0,0,cast(value % 120 - 30 as int),0)"),
            "yyyy-MM-dd'T'HH:mm:ss").as("actualArrival"),
          (col("value") % 3 === 0).as("delayed"),
          concat(lit("u"), col("value") % 100).as("userId")
        )).as("value"))
  }

  /** A pre-built streaming DataFrame (e.g. MemoryStream.toDF in tests). */
  final case class Existing(df: DataFrame) extends EventSource {
    def load(spark: SparkSession): DataFrame = df.select(col("value").cast("string").as("value"))
  }
}
