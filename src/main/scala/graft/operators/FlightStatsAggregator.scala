package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.FlightEvent

/**
 * Bit-faithful port of the reference's incremental-mean aggregation
 * (AirlineStatsAggregator, FlightEventAggregator.java:219-248): the running
 * mean is updated per record as `avg = (avg * n + x) / (n + 1)` (:228) and
 * merged as the weighted mean (:243) — the exact FP operation order of the
 * reference, unlike the algebraically equivalent sum/count that the engine's
 * primary (built-in, faster) formulation uses. Kept as the SURVEY §7.5
 * cross-check: the two agree to FP-rounding tolerance, and this class is the
 * template for porting any Flink AggregateFunction that built-ins can't
 * express (Flink's {createAccumulator,add,getResult,merge} ≅ Spark's
 * Aggregator {zero,reduce,finish,merge}).
 */
object FlightStatsAggregator {

  final case class StatsBuf(total: Long, delayed: Long, avg: Double)
  final case class Stats(
      total_flights: Long, delayed_flights: Long,
      avg_delay_minutes: Double, delay_rate: Double)

  val airline: Aggregator[FlightEvent, StatsBuf, Stats] =
    new Aggregator[FlightEvent, StatsBuf, Stats] {
      def zero: StatsBuf = StatsBuf(0L, 0L, 0.0)
      // FlightEventAggregator.java:224-231
      def reduce(b: StatsBuf, e: FlightEvent): StatsBuf = StatsBuf(
        b.total + 1,
        b.delayed + (if (e.is_delayed == 1) 1 else 0),
        (b.avg * b.total + e.delay_minutes) / (b.total + 1))
      // FlightEventAggregator.java:237-247 (weighted mean)
      def merge(a: StatsBuf, b: StatsBuf): StatsBuf = {
        val total = a.total + b.total
        StatsBuf(total, a.delayed + b.delayed,
          if (total == 0) 0.0 else (a.avg * a.total + b.avg * b.total) / total)
      }
      // FlightEventAggregator.java:229 (rate), :233 (result passthrough)
      def finish(b: StatsBuf): Stats = Stats(
        b.total, b.delayed, b.avg,
        if (b.total == 0) 0.0 else b.delayed.toDouble / b.total * 100.0)
      def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
      def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
