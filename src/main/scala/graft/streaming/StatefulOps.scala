package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.FlightEvent

/**
 * Stateful streaming operators beyond the reference's window accumulators —
 * the pieces a production event pipeline needs that the reference lacks:
 *
 *  - exact streaming dedup with bounded state (watermark + dropDuplicates):
 *    the streaming analogue of the batch dedup family in
 *    [[graft.operators.Dedup]];
 *  - running per-key totals via mapGroupsWithState (the
 *    `KeyValueGroupedDataset` custom-state path — Flink's
 *    KeyedProcessFunction analogue) with processing-time state timeout.
 *
 * State sizing at scale: dedup state is bounded by (watermark horizon ×
 * arrival rate); running totals are bounded by live key cardinality ×
 * timeout. Both live in the checkpointed StateStore (RocksDB on a real
 * cluster), spilling off-heap — no driver-side state anywhere.
 */
object StatefulOps {

  /** Exact dedup on `idCols` with state bounded by the watermark horizon:
    * events older than the watermark can no longer create duplicates, so
    * their keys age out of the store. */
  def dedupStream(parsed: DataFrame, timeCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    parsed.withWatermark(timeCol, watermark)
      .dropDuplicates(idCols :+ timeCol)

  final case class RunningTotals(
      airline: String, total_flights: Long, delayed_flights: Long,
      total_delay_minutes: Long)

  /**
   * Running (non-windowed) per-airline totals — state the reference cannot
   * express at all (its aggregates reset every window). Emits the updated
   * totals for each airline seen in the micro-batch; state for airlines idle
   * past `timeout` is dropped.
   */
  def runningAirlineTotals(parsed: Dataset[FlightEvent],
      timeout: Option[String] = None): Dataset[RunningTotals] = {
    import parsed.sparkSession.implicits._
    // Note: a processing-time timeout makes the engine schedule continuous
    // no-data batches to fire expirations — correct in production, but it
    // never quiesces, so deterministic harnesses (processAllAvailable) use
    // NoTimeout. State then lives until the query stops.
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    parsed.groupByKey(_.airline)
      .mapGroupsWithState[RunningTotals, RunningTotals](mode) {
        (airline: String, events: Iterator[FlightEvent], state: GroupState[RunningTotals]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(RunningTotals(airline, 0L, 0L, 0L))
            val next = events.foldLeft(prev) { (acc, e) =>
              RunningTotals(airline,
                acc.total_flights + 1,
                acc.delayed_flights + e.is_delayed,
                acc.total_delay_minutes + e.delay_minutes)
            }
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Typed view of the parsed stream for the stateful operators. */
  def typed(parsed: DataFrame): Dataset[FlightEvent] = {
    import parsed.sparkSession.implicits._
    parsed.select(
      col("flight_id"), col("flight_number"), col("airline"), col("origin"),
      col("destination"), col("scheduled_time"), col("actual_time"),
      col("is_delayed"), col("user_id"), col("delay_minutes")
    ).as[FlightEvent]
  }
}
