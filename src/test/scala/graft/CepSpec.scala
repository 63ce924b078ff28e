package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Cep

/**
 * Hand-stream checks for the CEP sequence matcher (corpus-scale output is
 * oracle-gated by `events_cep_match`): skip-till-last selection, negation
 * windows, time-bound expiry, and ordering strictness.
 */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** (id, type, second) events for one user; returns matched
    * (close_id, a_second, gap_seconds). */
  private def run(events: Seq[(Long, String, Long)], window: Long = 3600L)
      : Seq[(Long, Long, Long)] = {
    val df = events.map { case (id, t, sec) => (1L, id, t, ts(sec)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    Cep.lastSeqMatch(df, col("user_id"), col("ts"), col("event_id"),
        stepA = col("event_type") === "a", stepB = col("event_type") === "b",
        stepC = col("event_type") === "c", negation = col("event_type") === "n",
        windowSeconds = window)
      .select(col("close_id"),
        expr("unix_micros(a_ts) div 1000000"), col("gap_seconds"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("a -> b -> c in order and in window closes a match") {
    assert(run(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
      == Seq((3L, 10L, 20L)))
  }

  test("skip-till-last: the LATEST a and b chain, and each close reports once") {
    // two views: the later one (t=15) is the matched A; gap measured from it
    val got = run(Seq((1L, "a", 10), (2L, "a", 15), (3L, "b", 20), (4L, "c", 30)))
    assert(got == Seq((4L, 15L, 15L)))
    // two closes -> two independent matches off the same running state
    val two = run(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "c", 40)))
    assert(two.map(_._1) == Seq(3L, 4L))
  }

  test("negation between the matched A and the close blocks; before A does not") {
    assert(run(Seq((1L, "a", 10), (2L, "n", 15), (3L, "b", 20), (4L, "c", 30)))
      .isEmpty, "error inside the span must block")
    assert(run(Seq((0L, "n", 5), (1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
      .nonEmpty, "error before the matched A is irrelevant")
    // negation between an EARLIER a and the latest a is also irrelevant
    assert(run(Seq((1L, "a", 5), (2L, "n", 7), (3L, "a", 10), (4L, "b", 20),
      (5L, "c", 30))) == Seq((5L, 10L, 20L)))
  }

  test("window expiry and ordering strictness") {
    assert(run(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 4000)))
      .isEmpty, "c beyond windowSeconds of a must not match")
    assert(run(Seq((1L, "b", 10), (2L, "a", 20), (3L, "c", 30)))
      .isEmpty, "b before a is not the pattern")
    assert(run(Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 30)))
      .isEmpty, "equal timestamps do not chain (strict order)")
  }
}
