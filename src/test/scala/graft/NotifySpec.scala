package graft

import org.apache.spark.sql.functions._
import graft.operators.Notify

/** Channel routing per the reference DDL's users table (readme.txt):
  * opt-in gate, preferred-channel-if-enabled, email→sms fallback. */
class NotifySpec extends SparkSpec {
  import spark.implicits._

  private def notif(userId: String) = Seq(
    ("F1", userId, "AA-9", "AA", "AAA-BBB", 20L, "Your flight AA-9 is delayed by 20 minutes"))
    .toDF("flightId", "userId", "flightNumber", "airline", "route", "delayMinutes", "message")

  private def user(id: String, email: Int, sms: Int, pref: String, optIn: Int) =
    (id, s"$id@example.com", s"+1-$id", email, sms, pref, optIn)

  private def users(rows: (String, String, String, Int, Int, String, Int)*) =
    rows.toDF("user_id", "email", "phone", "notify_email", "notify_sms",
      "preferred_channel", "opt_in")

  private def routeOne(u: (String, String, String, Int, Int, String, Int)) =
    Notify.route(notif(u._1), users(u)).collect()

  test("preferred channel wins when enabled") {
    val r = routeOne(user("u1", email = 1, sms = 1, pref = "sms", optIn = 1))
    assert(r.length == 1)
    assert(r(0).getAs[String]("channel") == "sms")
    assert(r(0).getAs[String]("contact") == "+1-u1")
  }

  test("disabled preferred channel falls back to an enabled one (email first)") {
    val r = routeOne(user("u2", email = 1, sms = 1, pref = "pigeon", optIn = 1))
    assert(r(0).getAs[String]("channel") == "email")
    assert(r(0).getAs[String]("contact") == "u2@example.com")
    val sms = routeOne(user("u3", email = 0, sms = 1, pref = "email", optIn = 1))
    assert(sms(0).getAs[String]("channel") == "sms")
  }

  test("opted-out users and users with no enabled channel get nothing") {
    assert(routeOne(user("u4", email = 1, sms = 1, pref = "email", optIn = 0)).isEmpty)
    assert(routeOne(user("u5", email = 0, sms = 0, pref = "email", optIn = 1)).isEmpty)
  }

  test("output shape matches the reference notifications table; id is deterministic") {
    val r = routeOne(user("u6", email = 1, sms = 0, pref = "email", optIn = 1))
    assert(r(0).schema.fieldNames.toSeq == Seq(
      "notification_id", "user_id", "flight_id", "channel", "contact", "message", "status"))
    assert(r(0).getAs[String]("status") == "pending")
    val again = routeOne(user("u6", email = 1, sms = 0, pref = "email", optIn = 1))
    assert(r(0).getAs[String]("notification_id") == again(0).getAs[String]("notification_id"))
  }
}
