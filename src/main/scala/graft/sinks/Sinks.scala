package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/**
 * Sink abstraction. The reference writes to ClickHouse over JDBC with batch
 * size 1 (!) and to Kafka (FlightEventAggregator.java:94-110, KafkaUtils
 * .java:30-38). Structured Streaming has no native streaming JDBC writer, so
 * the idiomatic bridge is `foreachBatch` → batch `DataFrameWriter.jdbc` —
 * which also replaces the reference's row-at-a-time INSERT with whole-
 * micro-batch batched writes (orders of magnitude fewer round trips; the
 * "batch size 1" anti-optimization is deliberately not reproduced).
 */
sealed trait EventSink {
  /** Attach this sink to a streaming frame and start the query. */
  def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery
}

object EventSink {

  private def base(df: DataFrame, checkpoint: String, queryName: String): DataStreamWriter[Row] =
    df.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("0 seconds"))

  /** Kafka topic sink (expects a `value` string column). Needs the
    * spark-sql-kafka connector (production only; absent in this container —
    * the option map is pinned by `KafkaContractSpec` against the reference's
    * producer contract, KafkaUtils.java:30-38). */
  final case class Kafka(bootstrapServers: String, topic: String) extends EventSink {
    /** Exact `writeStream.format("kafka")` option map (value-only string
      * serialization is Spark's default for a single `value` column). */
    def writerOptions: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic)
    def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery =
      base(df, checkpoint, queryName)
        .format("kafka")
        .options(writerOptions)
        .start()
  }

  /** JDBC append sink via foreachBatch (ClickHouse, Derby, Postgres, ...). */
  final case class Jdbc(url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()) extends EventSink {
    def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery =
      base(df, checkpoint, queryName).foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(SaveMode.Append).jdbc(url, table, properties)
      }.start()
  }

  /**
   * Idempotent JDBC sink: per-micro-batch exactly-once under retries. Rows
   * carry the epoch id; a re-delivered epoch (restart after a mid-write
   * failure) first deletes its own rows, then re-appends — so the table
   * converges to exactly one copy of every batch regardless of how many
   * times foreachBatch ran. The delete+append per epoch is the standard
   * transactional-outbox bridge for stores without streaming transactions.
   *
   * ClickHouse note: classic DELETE is async there — production CH
   * deployments get the same property from ReplacingMergeTree keyed on
   * (batch_id, row key) instead; this delete-based variant is exercised
   * against Derby offline.
   */
  final case class JdbcIdempotent(url: String, table: String,
      properties: java.util.Properties = new java.util.Properties()) extends EventSink {

    /** The foreachBatch body, exposed so tests can replay an epoch. The two
      * halves are individually exposed ([[deleteEpoch]] / [[appendEpoch]]) so
      * the recovery spec can inject a crash at the exact point between them —
      * the worst-case failure for a delete-then-append outbox. */
    def writeEpoch(batch: DataFrame, epochId: Long): Unit = {
      deleteEpoch(epochId)
      appendEpoch(batch, epochId)
    }

    /** Step 1: remove any rows a previous (crashed, partial, or duplicate)
      * delivery of this epoch already wrote. */
    def deleteEpoch(epochId: Long): Unit = {
      // Spark's JDBC writer creates columns with dialect-quoted (exact-case)
      // names, so the delete must quote the same way
      val col = JdbcDialects.get(url).quoteIdentifier("batch_id")
      val conn = java.sql.DriverManager.getConnection(url, properties)
      try {
        // probe table existence via metadata (identifier case differs by
        // database) so ONLY the legitimate first-epoch absence skips the
        // delete — any real DELETE failure (lock timeout, connection drop)
        // must propagate, or a replay would silently duplicate the epoch
        val meta = conn.getMetaData
        val exists = Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
          val rs = meta.getTables(null, null, t, null)
          try rs.next() finally rs.close()
        }
        if (exists) {
          val st = conn.createStatement()
          try st.executeUpdate(s"DELETE FROM $table WHERE $col = $epochId")
          finally st.close()
        }
      } finally conn.close()
    }

    /** Step 2: append the epoch's rows, tagged with its id. */
    def appendEpoch(batch: DataFrame, epochId: Long): Unit =
      batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(epochId))
        .write.mode(SaveMode.Append).jdbc(url, table, properties)

    def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery =
      base(df, checkpoint, queryName).foreachBatch(writeEpoch _).start()
  }

  /** Parquet append sink (the offline stand-in for the raw-persist branch). */
  final case class Parquet(path: String) extends EventSink {
    def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery =
      base(df, checkpoint, queryName)
        .format("parquet")
        .option("path", path)
        .start()
  }

  /** In-memory table sink (tests / debugging). */
  final case class Memory(outputMode: String = "append") extends EventSink {
    def start(df: DataFrame, checkpoint: String, queryName: String): StreamingQuery =
      base(df, checkpoint, queryName)
        .format("memory")
        .outputMode(outputMode)
        .start()
  }
}

/**
 * Minimal ClickHouse JDBC dialect (SURVEY §7.5): Spark's generic dialect
 * quotes identifiers with double quotes and maps StringType to TEXT, both of
 * which ClickHouse rejects. Register once via [[ClickHouseDialect.register]]
 * before writing to a `jdbc:clickhouse:` URL. (Offline tests use Derby; this
 * dialect is exercised only against a live ClickHouse.)
 */
object ClickHouseDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:clickhouse")
  override def quoteIdentifier(colName: String): String = s"`$colName`"
  override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.jdbc.JdbcType] = {
    import org.apache.spark.sql.jdbc.JdbcType
    import org.apache.spark.sql.types._
    dt match {
      case StringType => Some(JdbcType("String", java.sql.Types.VARCHAR))
      case TimestampType => Some(JdbcType("DateTime64(3)", java.sql.Types.TIMESTAMP))
      case IntegerType => Some(JdbcType("Int32", java.sql.Types.INTEGER))
      case LongType => Some(JdbcType("Int64", java.sql.Types.BIGINT))
      case DoubleType => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
      case _ => None
    }
  }
  def register(): Unit = JdbcDialects.registerDialect(this)
}
