package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Notification delivery routing: enrich delay-notification payloads with the
 * user's contact preferences and pick a channel — the capability the
 * reference's DDL sketches but never implements (readme.txt `users` /
 * `notifications` tables: user_id, email, phone, notify_email, notify_sms,
 * preferred_channel, opt_in → notification_id, user_id, flight_id, channel,
 * contact, status). No reference *code* performs this join; the routing rule
 * below is the deterministic reading of those columns:
 *
 *   1. `opt_in = 0` → no notification at all.
 *   2. the preferred channel wins if it is enabled (`preferred_channel =
 *      'email'` requires `notify_email = 1`, same for sms);
 *   3. otherwise fall back to any enabled channel, email before sms;
 *   4. no enabled channel → no notification.
 *
 * Scale shape: one stream-static (or dim) equi-join on user_id. The users
 * side is a slowly-changing dimension — broadcast it when it fits
 * (`broadcast(users)` at the call site), shuffle-hash otherwise; the
 * notification stream is never re-keyed afterwards. `notification_id` is an
 * md5 of (flight, user, channel) — deterministic and engine-independent
 * (DDL's UUID would break replay idempotence and oracle verification).
 */
object Notify {

  /** The users-dimension columns [[route]] consumes. */
  val userColumns: Seq[String] = Seq(
    "user_id", "email", "phone", "notify_email", "notify_sms",
    "preferred_channel", "opt_in")

  /**
   * Route notification payloads ([[FlightOps.delayNotificationFields]] shape:
   * flightId, userId, flightNumber, airline, route, delayMinutes, message)
   * against a users dimension → reference `notifications`-table rows.
   */
  def route(notifications: DataFrame, users: DataFrame): DataFrame = {
    val canEmail = col("notify_email") === 1
    val canSms = col("notify_sms") === 1
    val channel =
      when(col("preferred_channel") === "email" && canEmail, "email")
        .when(col("preferred_channel") === "sms" && canSms, "sms")
        .when(canEmail, "email")
        .when(canSms, "sms")
    notifications
      .join(users.select(userColumns.map(col): _*),
        notifications("userId") === users("user_id"))
      .filter(col("opt_in") === 1)
      .withColumn("channel", channel)
      .filter(col("channel").isNotNull)
      .select(
        md5(concat_ws(":", col("flightId"), col("user_id"), col("channel"))
          .cast("binary")).as("notification_id"),
        col("user_id"),
        col("flightId").as("flight_id"),
        col("channel"),
        when(col("channel") === "email", col("email"))
          .otherwise(col("phone")).as("contact"),
        col("message"),
        lit("pending").as("status"))
  }
}
