package graft

import org.apache.spark.sql.functions._
import graft.model.FlightEvent
import graft.operators.{FlightOps, FlightStatsAggregator}

/** SURVEY §7.5: the bit-faithful incremental-mean Aggregator agrees with the
  * engine's built-in sum/count formulation to FP tolerance. */
class AggregatorCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  test("incremental-mean Aggregator matches built-in airline stats") {
    val rng = new scala.util.Random(7)
    val events = (1 to 2000).map { i =>
      val sched = java.sql.Timestamp.valueOf(f"2024-01-01 ${rng.nextInt(24)}%02d:00:00")
      FlightEvent(s"F$i", s"FN-$i", s"AL${rng.nextInt(5)}", "A", "B",
        sched, sched, if (rng.nextBoolean()) 1 else 0, s"u$i",
        rng.nextInt(200) - 50L)
    }
    val ds = events.toDS()

    val custom = ds.groupByKey(_.airline)
      .agg(FlightStatsAggregator.airline.toColumn.name("stats"))
      .select(col("key").as("airline"), col("stats.*"))
      .collect()
      .map(r => r.getAs[String]("airline") ->
        (r.getAs[Long]("total_flights"), r.getAs[Long]("delayed_flights"),
          r.getAs[Double]("avg_delay_minutes"), r.getAs[Double]("delay_rate")))
      .toMap

    val builtin = ds.toDF().groupBy(col("airline"))
      .agg(count(lit(1)).as("t"), sum(col("is_delayed")).cast("long").as("d"),
        avg(col("delay_minutes")).as("a"))
      .collect()
      .map(r => r.getAs[String]("airline") ->
        (r.getAs[Long]("t"), r.getAs[Long]("d"), r.getAs[Double]("a")))
      .toMap

    assert(custom.keySet == builtin.keySet)
    custom.foreach { case (k, (t, d, a, rate)) =>
      val (bt, bd, ba) = builtin(k)
      assert(t == bt && d == bd)
      assert(math.abs(a - ba) < 1e-9, s"$k: $a vs $ba")
      assert(math.abs(rate - d.toDouble / t * 100.0) < 1e-12)
    }
  }
}
