package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 connector: a deterministic flight-event generator with the
 * SAME surface as the Kafka source (a single `value` string column carrying
 * the reference's JSON wire format — KafkaUtils.java:40-45 field set), so it
 * slots into the pipeline exactly where Kafka would:
 *
 *   spark.read.format("flight-gen").option("numRows", 10000).load()
 *   spark.readStream.format("flight-gen")
 *     .option("rowsPerBatch", 1000).option("numRows", 10000).load()
 *
 * Batch reads split the row range over `numPartitions` input partitions;
 * the micro-batch stream advances a row-count offset by `rowsPerBatch` per
 * trigger until `numRows` (finite for tests; set numRows huge for soak
 * runs). Every event is a pure function of its global row index — reads are
 * reproducible across runs, partitionings, and restarts, which is what makes
 * connector-level exactly-once testable offline.
 */
class FlightGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "flight-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FlightGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new FlightGenTable
}

object FlightGen {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))

  /** Deterministic wire-format event for global row index `i`: covers the
    * boolean-flag AND status-string delay encodings plus signed delays (early
    * arrivals), mirroring the reference's dual input schema. */
  def eventJson(i: Long): String = {
    val airline = s"AL${i % 8}"
    val origin = s"AP${i % 16}"
    val dest = s"AP${(i / 16) % 16 + 16}"
    val sched = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusSeconds(i * 30)
    val delayMin = (i % 90) - 30 // -30..59: early, on-time and delayed
    val actual = sched.plusMinutes(delayMin)
    val delayed = delayMin > 0
    // alternate between the two delay encodings the reference accepts
    val delayField =
      if (i % 2 == 0) s""""delayed":$delayed"""
      else s""""status":"${if (delayed) "DELAYED" else "ON_TIME"}""""
    s"""{"flightId":"FL$i","flightNumber":"$airline-${i % 1000}","airline":"$airline",""" +
      s""""origin":"$origin","destination":"$dest","scheduledArrival":"$sched",""" +
      s""""actualArrival":"$actual",$delayField,"userId":"user${i % 64}"}"""
  }
}

class FlightGenTable extends Table with SupportsRead {
  override def name(): String = "flight-gen"
  override def schema(): StructType = FlightGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FlightGenScan(
      options.getLong("numRows", 1000L),
      options.getInt("numPartitions", 4),
      options.getLong("rowsPerBatch", 1000L))
}

class FlightGenScan(numRows: Long, numPartitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = FlightGen.schema
  override def toBatch: Batch = new FlightGenBatch(numRows, numPartitions)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlightGenMicroBatch(numRows, numPartitions, rowsPerBatch)
}

/** [start, end) row range — one reader's work unit. */
case class FlightGenPartition(start: Long, end: Long) extends InputPartition

class FlightGenBatch(numRows: Long, numPartitions: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    FlightGenBatch.split(0L, numRows, numPartitions)
  override def createReaderFactory(): PartitionReaderFactory = new FlightGenReaderFactory
}

object FlightGenBatch {
  def split(start: Long, end: Long, numPartitions: Int): Array[InputPartition] = {
    val total = math.max(0L, end - start)
    val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
    (start until end by per).map(s =>
      FlightGenPartition(s, math.min(end, s + per)): InputPartition).toArray
  }
}

class FlightGenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FlightGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(FlightGen.eventJson(i))))
      override def close(): Unit = ()
    }
  }
}

case class RowCountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class FlightGenMicroBatch(numRows: Long, numPartitions: Int, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = RowCountOffset(0L)
  // Admission control: the engine hands us the committed start offset, so
  // per-trigger pacing needs no connector-side state (and cannot race the
  // engine's commit cycle).
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    RowCountOffset(math.min(numRows, start.asInstanceOf[RowCountOffset].n + rowsPerBatch))
  override def latestOffset(): Offset = RowCountOffset(numRows)
  override def reportLatestOffset(): Offset = RowCountOffset(numRows)
  override def deserializeOffset(json: String): Offset = RowCountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    FlightGenBatch.split(start.asInstanceOf[RowCountOffset].n,
      end.asInstanceOf[RowCountOffset].n, numPartitions)
  override def createReaderFactory(): PartitionReaderFactory = new FlightGenReaderFactory
  override def stop(): Unit = ()
}
