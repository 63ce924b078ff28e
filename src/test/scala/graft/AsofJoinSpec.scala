package graft

import java.sql.Timestamp
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLast picks the latest right row at-or-before each left row per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // after p2 → p2
      (2L, "u1", ts("2024-01-01 08:30:00")), // between p1 and p2 → p1
      (3L, "u1", ts("2024-01-01 07:00:00")), // before any purchase → null
      (4L, "u2", ts("2024-01-01 10:00:00")), // other key → p3
      (5L, "u3", ts("2024-01-01 10:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), 101L, 10.0), // p1
      ("u1", ts("2024-01-01 09:00:00"), 102L, 20.0), // p2
      ("u2", ts("2024-01-01 09:30:00"), 103L, 30.0)  // p3
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")

    val got = AsofJoin.asofLast(left, right, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_purchase_id")).map(_.toLong))
      .toMap
    assert(got == Map(1L -> Some(102L), 2L -> Some(101L), 3L -> None,
      4L -> Some(103L), 5L -> None))
  }

  test("asofLast is inclusive: equal timestamps match") {
    val left = Seq((1L, "u1", ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 7L)).toDF("user_id", "ts", "pid")
    val got = AsofJoin.asofLast(left, right, Seq("user_id"), "ts", "ts", Seq("pid"))
      .collect()(0)
    assert(got.getAs[Long]("asof_pid") == 7L)
  }
}
