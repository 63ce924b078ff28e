package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Queries._

/** Flight-event reference surface + core event rows — one slice of the driver-facing catalog, mechanically moved out
  * of Queries.scala in the round-15 maintainability split (verdict-r14
  * item 8). Rows are UNCHANGED; shared helpers and the cross-engine
  * determinism conventions live in [[Queries]]; the one `queries` map is
  * composed there. */
object QueriesCore {
  private[graft] def rows
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(


    // ---- P1: parse/project (JSON wire → typed event frame) ----------------
    ("flight_parse",
      (s: SparkSession, d: String) =>
        parsedFlights(s, d)
          .withColumn("scheduled_time", ntz(col("scheduled_time")))
          .withColumn("actual_time", ntz(col("actual_time"))),
      Some(flightCte + "SELECT * FROM flights")),

    // ---- P1b: strict-field rejection (dead-letter observability) ----------
    // The reference NPEs the whole job on a missing required field; we drop
    // the record into a rejected view instead. Corrupt every 97th record
    // (flightId removed) and check both sides of the split.
    ("flight_reject_stats",
      (s: SparkSession, d: String) => {
        val corrupt = {
          val ev = Tables.events(s, d)
          // same wire as wireFlightJson, but flightId nulled for %97 == 0
          wireFlightJson(ev.withColumn("event_id",
            when(col("event_id") % 97 === 0, lit(null).cast("long"))
              .otherwise(col("event_id"))))
        }
        val parsed = FlightOps.parseFlightEvents(corrupt)
          .select(lit("parsed").as("kind"))
        val rejected = FlightOps.rejectedFlightEvents(corrupt)
          .select(lit("rejected").as("kind"))
        parsed.unionAll(rejected).groupBy(col("kind")).agg(count(lit(1)).as("n"))
      },
      Some(
        """SELECT kind, count(*) AS n FROM (
          |  SELECT CASE WHEN event_id % 97 = 0 THEN 'rejected' ELSE 'parsed' END AS kind
          |  FROM events)
          |GROUP BY 1""".stripMargin)),

    // ---- P2: predicate filter ---------------------------------------------
    ("flight_delayed",
      (s: SparkSession, d: String) =>
        FlightOps.delayedOnly(parsedFlights(s, d))
          .select(col("flight_id"), col("airline"), col("origin"),
            col("destination"), col("delay_minutes")),
      Some(flightCte +
        """SELECT flight_id, airline, origin, destination, delay_minutes
          |FROM flights WHERE is_delayed = 1""".stripMargin)),

    // ---- P3: scalar projection / notification formatting ------------------
    ("flight_notifications",
      (s: SparkSession, d: String) =>
        FlightOps.delayNotificationFields(parsedFlights(s, d)),
      Some(flightCte +
        """SELECT flight_id AS "flightId", user_id AS "userId",
          |       flight_number AS "flightNumber", airline,
          |       origin || '-' || destination AS route,
          |       delay_minutes AS "delayMinutes",
          |       printf('Your flight %s is delayed by %d minutes',
          |              flight_number, delay_minutes) AS message
          |FROM flights WHERE is_delayed = 1""".stripMargin)),

    // ---- Notification delivery routing (reference DDL's users table) ------
    // Stream-static enrichment join: delay notifications × user contact
    // preferences → channel + contact per the deterministic routing rule in
    // graft.operators.Notify (opt-in gate, preferred-channel-if-enabled,
    // email-then-sms fallback).
    ("notify_routing",
      (s: SparkSession, d: String) =>
        Notify.route(
          FlightOps.delayNotificationFields(parsedFlights(s, d)),
          syntheticUsers(Tables.events(s, d))),
      Some(flightCte + usersCte +
        """, routed AS (
          |  SELECT f.flight_id, u.user_id, u.email, u.phone,
          |         printf('Your flight %s is delayed by %d minutes',
          |                f.flight_number, f.delay_minutes) AS message,
          |         CASE WHEN u.preferred_channel = 'email' AND u.notify_email = 1 THEN 'email'
          |              WHEN u.preferred_channel = 'sms' AND u.notify_sms = 1 THEN 'sms'
          |              WHEN u.notify_email = 1 THEN 'email'
          |              WHEN u.notify_sms = 1 THEN 'sms' END AS channel
          |  FROM flights f JOIN users u ON u.user_id = f.user_id
          |  WHERE f.is_delayed = 1 AND u.opt_in = 1)
          |SELECT md5(flight_id || ':' || user_id || ':' || channel) AS notification_id,
          |       user_id, flight_id, channel,
          |       CASE WHEN channel = 'email' THEN email ELSE phone END AS contact,
          |       message, 'pending' AS status
          |FROM routed WHERE channel IS NOT NULL""".stripMargin)),

    // ---- K1+W1+A1: per-airline windowed stats (2-minute tumbling) ---------
    ("flight_airline_stats",
      (s: SparkSession, d: String) =>
        FlightOps.airlineStats(parsedFlights(s, d), col("scheduled_time"), "2 minutes")
          .withColumn("window_start", ntz(col("window_start")))
          .withColumn("window_end", ntz(col("window_end"))),
      Some(flightCte +
        """SELECT time_bucket(INTERVAL 2 MINUTES, scheduled_time) AS window_start,
          |       time_bucket(INTERVAL 2 MINUTES, scheduled_time) + INTERVAL 2 MINUTES AS window_end,
          |       airline,
          |       count(*) AS total_flights,
          |       cast(sum(is_delayed) AS bigint) AS delayed_flights,
          |       avg(delay_minutes) AS avg_delay_minutes,
          |       cast(sum(is_delayed) AS double) / count(*) * 100.0 AS delay_rate
          |FROM flights GROUP BY 1, 2, 3""".stripMargin)),

    // ---- K2+W2+A2: per-route windowed stats (3-minute tumbling) -----------
    ("flight_route_stats",
      (s: SparkSession, d: String) =>
        FlightOps.routeStats(parsedFlights(s, d), col("scheduled_time"), "3 minutes")
          .withColumn("window_start", ntz(col("window_start")))
          .withColumn("window_end", ntz(col("window_end"))),
      Some(flightCte +
        """SELECT time_bucket(INTERVAL 3 MINUTES, scheduled_time) AS window_start,
          |       time_bucket(INTERVAL 3 MINUTES, scheduled_time) + INTERVAL 3 MINUTES AS window_end,
          |       origin || '-' || destination AS route, origin, destination,
          |       count(*) AS total_flights,
          |       avg(delay_minutes) AS avg_delay_minutes
          |FROM flights GROUP BY 1, 2, 3, 4, 5""".stripMargin)),

    // ---- K3+W3+A3: per-hour-of-day windowed stats (5-minute tumbling) -----
    ("flight_hourly_stats",
      (s: SparkSession, d: String) =>
        FlightOps.hourlyStats(parsedFlights(s, d), col("scheduled_time"), "5 minutes")
          .withColumn("window_start", ntz(col("window_start")))
          .withColumn("window_end", ntz(col("window_end"))),
      Some(flightCte +
        """SELECT time_bucket(INTERVAL 5 MINUTES, scheduled_time) AS window_start,
          |       time_bucket(INTERVAL 5 MINUTES, scheduled_time) + INTERVAL 5 MINUTES AS window_end,
          |       cast(hour(scheduled_time) AS int) AS hour_of_day,
          |       count(*) AS total_flights,
          |       cast(sum(is_delayed) AS bigint) AS delayed_flights,
          |       avg(delay_minutes) AS avg_delay_minutes
          |FROM flights GROUP BY 1, 2, 3""".stripMargin)),

    // ---- Generic windowed aggregation straight over the events table ------
    ("events_window_stats",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("total_events"),
            sum(when(col("value") > 100, 1).otherwise(0)).cast("long").as("high_value_events"),
            sumDec(col("value")).as("sum_value"))
          .select(ntz(col("window.start")).as("window_start"),
            ntz(col("window.end")).as("window_end"),
            col("event_type"), col("total_events"), col("high_value_events"),
            col("sum_value"),
            (col("sum_value") / col("total_events")).as("avg_value"))
      },
      Some(
        """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
          |       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
          |       event_type,
          |       count(*) AS total_events,
          |       cast(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS bigint) AS high_value_events,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) / count(*) AS avg_value
          |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // ---- Per-user aggregation (count distinct, min/max timestamps) --------
    ("events_user_stats",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_event_types"),
            countDistinct(to_date(col("ts"))).as("n_active_days"),
            sumDec(col("value")).as("total_value"),
            ntz(min(col("ts"))).as("first_ts"),
            ntz(max(col("ts"))).as("last_ts")),
      Some(
        """SELECT user_id, count(*) AS n_events,
          |       cast(count(DISTINCT event_type) AS bigint) AS n_event_types,
          |       cast(count(DISTINCT ts::date) AS bigint) AS n_active_days,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value,
          |       min(ts) AS first_ts, max(ts) AS last_ts
          |FROM events GROUP BY 1""".stripMargin)),

    // ---- Semi-structured projection: JSON prop extraction ------------------
    ("events_parse_props",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
            floor(col("value") / 100).cast("int").as("value_bucket"))
          .filter(col("prop_k") >= 90),
      Some(
        """SELECT event_id, event_type,
          |       json_extract_string(props, '$.k')::int AS prop_k,
          |       floor(value / 100)::int AS value_bucket
          |FROM events WHERE json_extract_string(props, '$.k')::int >= 90""".stripMargin)),

    // Map-typed aggregation: per type, a bucket -> count map built with
    // map_from_entries and read back with element_at/cardinality. The oracle
    // verifies the same lookups relationally (DuckDB map extraction
    // semantics differ, the VALUES must not).
    ("events_bucket_map",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("event_type"), floor(col("value") / 100).cast("int").as("b"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("event_type"))
          .agg(map_from_entries(array_sort(collect_list(struct(col("b"), col("n")))))
            .as("m"))
          .select(col("event_type"),
            size(col("m")).as("n_buckets"),
            element_at(col("m"), 0).as("n_bucket0"),
            element_at(col("m"), 5).as("n_bucket5")),
      Some(
        """SELECT event_type,
          |       count(*)::int AS n_buckets,
          |       max(CASE WHEN b = 0 THEN n END)::bigint AS n_bucket0,
          |       max(CASE WHEN b = 5 THEN n END)::bigint AS n_bucket5
          |FROM (SELECT event_type, floor(value / 100)::int AS b, count(*) AS n
          |      FROM events GROUP BY 1, 2)
          |GROUP BY 1""".stripMargin)),

    // ---- arg-extremum aggregates (max_by/min_by ≙ arg_max/arg_min) --------
    ("events_minmax_by",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(
            // unique scalar ordering key: value is 2-decimal, so
            // round(value*100) is exact; append event_id as tie-break
            // (duplicate values would otherwise make arg-extrema
            // engine-dependent)
            max_by(col("event_id"),
              round(col("value") * 100).cast("long") * lit(1000000000000L) + col("event_id"))
              .as("top_value_event"),
            min_by(col("event_id"),
              round(col("value") * 100).cast("long") * lit(1000000000000L) + col("event_id"))
              .as("bottom_value_event"),
            max_by(col("user_id"), col("ts")).as("latest_user"),
            max(col("value")).as("max_value"),
            min(col("value")).as("min_value")),
      Some(
        """SELECT event_type,
          |       arg_max(event_id, round(value * 100)::bigint * 1000000000000 + event_id) AS top_value_event,
          |       arg_min(event_id, round(value * 100)::bigint * 1000000000000 + event_id) AS bottom_value_event,
          |       arg_max(user_id, ts) AS latest_user,
          |       max(value) AS max_value, min(value) AS min_value
          |FROM events GROUP BY 1""".stripMargin)),

    // ---- scalar-function battery (string/conditional/math parity) ---------
    ("scalar_functions",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).select(
          col("event_id"),
          upper(col("event_type")).as("s_upper"),
          lpad(col("event_type"), 10, "_").as("s_lpad"),
          substring(col("event_type"), 2, 3).as("s_substr"),
          regexp_replace(col("event_type"), "[aeiou]", "*").as("s_regex"),
          reverse(col("event_type")).as("s_reverse"),
          length(col("event_type")).as("s_len"),
          concat_ws("|", col("event_type"), col("user_id").cast("string")).as("s_concat"),
          coalesce(nullif(col("event_type"), lit("error")), lit("(err)")).as("s_nullif"),
          greatest(col("value"), lit(100.0)).as("s_greatest"),
          least(col("user_id"), col("event_id")).as("s_least"),
          abs(col("value") - 250).as("s_abs"),
          floor(col("value") / 7).cast("long").as("s_floor"),
          pow(lit(2.0), col("user_id") % 10).as("s_pow")),
      Some(
        """SELECT event_id,
          |       upper(event_type) AS s_upper,
          |       lpad(event_type, 10, '_') AS s_lpad,
          |       substr(event_type, 2, 3) AS s_substr,
          |       regexp_replace(event_type, '[aeiou]', '*', 'g') AS s_regex,
          |       reverse(event_type) AS s_reverse,
          |       length(event_type)::int AS s_len,
          |       concat_ws('|', event_type, user_id) AS s_concat,
          |       coalesce(nullif(event_type, 'error'), '(err)') AS s_nullif,
          |       greatest(value, 100.0) AS s_greatest,
          |       least(user_id, event_id) AS s_least,
          |       abs(value - 250) AS s_abs,
          |       floor(value / 7)::bigint AS s_floor,
          |       pow(2.0, user_id % 10) AS s_pow
          |FROM events""".stripMargin)),

    // ---- datetime-function battery ----------------------------------------
    ("datetime_functions",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).select(
          col("event_id"),
          year(col("ts")).as("t_year"),
          quarter(col("ts")).as("t_quarter"),
          month(col("ts")).as("t_month"),
          dayofmonth(col("ts")).as("t_day"),
          dayofyear(col("ts")).as("t_doy"),
          hour(col("ts")).as("t_hour"),
          minute(col("ts")).as("t_minute"),
          second(col("ts")).as("t_second"),
          ntz(date_trunc("day", col("ts"))).as("t_day_start"),
          ntz(date_trunc("month", col("ts"))).as("t_month_start"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("t_days_since"),
          date_add(to_date(col("ts")), 7).as("t_plus_week")),
      Some(
        """SELECT event_id,
          |       year(ts)::int AS t_year, quarter(ts)::int AS t_quarter,
          |       month(ts)::int AS t_month, day(ts)::int AS t_day,
          |       dayofyear(ts)::int AS t_doy, hour(ts)::int AS t_hour,
          |       minute(ts)::int AS t_minute, second(ts)::int AS t_second,
          |       date_trunc('day', ts) AS t_day_start,
          |       date_trunc('month', ts) AS t_month_start,
          |       date_diff('day', DATE '2024-01-01', ts::date)::int AS t_days_since,
          |       ts::date + 7 AS t_plus_week
          |FROM events""".stripMargin)),

    // ---- array-function battery (scalar outputs for dtype-safe compare) ---
    // Extended string-function parity battery (beyond scalar_functions):
    // split_part/instr/translate/repeat/starts/ends/regexp_extract/left/
    // right/ascii/substring_index, all DuckDB-identical on this domain.
    ("string_functions_ext",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).select(
          col("event_id"),
          expr("split_part(event_type, 'r', 1)").as("sp"),
          instr(col("event_type"), "a").as("pos_a"),
          translate(col("event_type"), "aeiou", "12345").as("tr"),
          repeat(col("event_type"), 2).as("rep"),
          col("event_type").startsWith("p").cast("int").as("starts_p"),
          col("event_type").endsWith("e").cast("int").as("ends_e"),
          regexp_extract(col("event_type"), "([aeiou]+)", 1).as("first_vowels"),
          expr("left(event_type, 3)").as("l3"),
          expr("right(event_type, 2)").as("r2"),
          ascii(col("event_type")).as("ascii0"),
          substring_index(col("event_type"), "r", 1).as("si")),
      Some(
        """SELECT event_id,
          |       split_part(event_type, 'r', 1) AS sp,
          |       instr(event_type, 'a')::int AS pos_a,
          |       translate(event_type, 'aeiou', '12345') AS tr,
          |       repeat(event_type, 2) AS rep,
          |       starts_with(event_type, 'p')::int AS starts_p,
          |       ends_with(event_type, 'e')::int AS ends_e,
          |       regexp_extract(event_type, '([aeiou]+)', 1) AS first_vowels,
          |       left(event_type, 3) AS l3,
          |       right(event_type, 2) AS r2,
          |       ascii(event_type) AS ascii0,
          |       split_part(event_type, 'r', 1) AS si
          |FROM events""".stripMargin)),

    // Bitwise aggregate + scalar battery: bit_and/bit_or/bit_xor fold
    // through partial aggregation (order-insensitive by algebra); scalar
    // masks and shifts inside exact integer sums. DuckDB's ^ is
    // exponentiation, so XOR spells xor() there — pinned by the oracle.
    ("events_bitwise",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(
            bit_and(col("user_id")).as("uid_and"),
            bit_or(col("user_id")).as("uid_or"),
            bit_xor(col("user_id")).as("uid_xor"),
            sum(expr("event_id & 255")).as("sum_low_byte"),
            sum(expr("shiftleft(user_id & 15, 2)")).as("sum_shifted"),
            count(lit(1)).as("n")),
      Some(
        """SELECT event_type,
          |       bit_and(user_id) AS uid_and,
          |       bit_or(user_id) AS uid_or,
          |       bit_xor(user_id) AS uid_xor,
          |       sum(event_id & 255)::bigint AS sum_low_byte,
          |       sum((user_id & 15) << 2)::bigint AS sum_shifted,
          |       count(*) AS n
          |FROM events GROUP BY 1""".stripMargin)),

    ("array_functions",
      (s: SparkSession, d: String) => {
        val v = transform(col("embedding"), x => x.cast("double"))
        Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          v(0).as("first_elem"),
          element_at(v, -1).as("last_elem"),
          array_max(v).as("max_elem"),
          array_min(v).as("min_elem"),
          element_at(array_sort(v), 5).as("fifth_smallest"),
          size(filter(v, x => x > 0)).as("n_positive"))
      },
      Some(
        """SELECT vec_id,
          |       len(embedding)::int AS dim,
          |       embedding[1]::double AS first_elem,
          |       embedding[-1]::double AS last_elem,
          |       list_aggregate(list_transform(embedding, x -> x::double), 'max') AS max_elem,
          |       list_aggregate(list_transform(embedding, x -> x::double), 'min') AS min_elem,
          |       list_sort(list_transform(embedding, x -> x::double))[5] AS fifth_smallest,
          |       len(list_filter(embedding, x -> x > 0))::int AS n_positive
          |FROM embeddings""".stripMargin)),

    // ---- CUBE (full grouping-set lattice) ---------------------------------
    ("events_cube",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(col("event_type"), (col("user_id") % 5).as("user_bucket"), col("value"))
          .cube(col("event_type"), col("user_bucket"))
          .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"),
            grouping(col("event_type")).as("g1"), grouping(col("user_bucket")).as("g2"))
          .select(
            when(col("g1") === 1, lit("(all)")).otherwise(col("event_type")).as("event_type"),
            when(col("g2") === 1, lit(-1)).otherwise(col("user_bucket")).cast("long").as("user_bucket"),
            col("n_events"), col("sum_value")),
      Some(
        """SELECT CASE WHEN GROUPING(event_type) = 1 THEN '(all)' ELSE event_type END AS event_type,
          |       (CASE WHEN GROUPING(user_bucket) = 1 THEN -1 ELSE user_bucket END)::bigint AS user_bucket,
          |       count(*) AS n_events,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
          |FROM (SELECT event_type, user_id % 5 AS user_bucket, value FROM events)
          |GROUP BY CUBE (event_type, user_bucket)
          |HAVING count(*) > 0""".stripMargin)),
    // ^ HAVING is a no-op on non-empty input (every CUBE group contains ≥1
    //   source row) — it pins Spark's empty-input grouping-sets semantics,
    //   where the Expand-based plan emits NO grand-total row over zero rows
    //   (the SQL standard, and DuckDB, emit one).

    // ---- unpivot / melt ----------------------------------------------------
    ("lineitem_unpivot",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") <= 100)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val"),
      Some(
        """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
          |FROM lineitem WHERE l_orderkey <= 100
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          |FROM lineitem WHERE l_orderkey <= 100
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          |FROM lineitem WHERE l_orderkey <= 100""".stripMargin)),

    // ---- edit-distance near-dup (Levenshtein on normalized prefixes) ------
    ("text_edit_distance",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), substring(TextOps.normalize(col("text")), 1, 60).as("prefix"))
        val a = docs.select(col("doc_id").as("doc_a"), col("prefix").as("pa"))
        val b = docs.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"),
          col("prefix").as("pb"))
        a.join(b, "doc_a")
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("pa"), col("pb")).as("edit_distance"),
            (lit(1.0) - levenshtein(col("pa"), col("pb")).cast("double") /
              greatest(length(col("pa")), length(col("pb")))).as("similarity"))
      },
      Some(
        """WITH p AS (
          |  SELECT doc_id,
          |         substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 60) AS prefix
          |  FROM documents)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       levenshtein(a.prefix, b.prefix)::int AS edit_distance,
          |       1.0 - levenshtein(a.prefix, b.prefix)::double
          |             / greatest(length(a.prefix), length(b.prefix)) AS similarity
          |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1""".stripMargin)),

    // ---- analytic window battery: lag/lead/running sums/ranks -------------
    ("events_user_journey",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).select(
          col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          row_number().over(w).as("step"),
          sum(col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          first(col("event_type")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_type"))
      },
      Some(
        """SELECT user_id, event_id, event_type,
          |       lag(event_type, 1) OVER w AS prev_type,
          |       lead(event_type, 1) OVER w AS next_type,
          |       (row_number() OVER w)::int AS step,
          |       cast(sum(cast(value AS decimal(18,2)))
          |            OVER (w ROWS UNBOUNDED PRECEDING) AS double) AS running_value,
          |       first_value(event_type) OVER (w ROWS UNBOUNDED PRECEDING) AS first_type
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // ---- full outer join with null-side indicators ------------------------
    ("join_full_outer",
      (s: SparkSession, d: String) => {
        val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
        val richCust = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_acctbal"))
        richCust.join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            when(col("c_custkey").isNotNull, 1).otherwise(0).as("is_rich"),
            coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"))
      },
      Some(
        """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
          |       CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_rich,
          |       coalesce(o.n_big_orders, 0) AS n_big_orders
          |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
          |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big_orders
          |                 FROM orders WHERE o_totalprice > 450000 GROUP BY 1) o
          |  ON c.c_custkey = o.o_custkey""".stripMargin)),

    // ---- ranking-function battery (rank families + distribution) ----------
    ("events_window_ranks",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        // duplicate ordering values via value_bucket so rank vs dense_rank
        // actually diverge
        val w = Window.partitionBy(col("event_type"))
          .orderBy(floor(col("value") / 50).as("vb"), col("event_id"))
        val wDup = Window.partitionBy(col("event_type"))
          .orderBy(floor(col("value") / 50))
        Tables.events(s, d).select(
          col("event_type"), col("event_id"),
          floor(col("value") / 50).cast("long").as("value_bucket"),
          row_number().over(w).as("rn"),
          rank().over(wDup).as("rnk"),
          dense_rank().over(wDup).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(wDup).as("pct_rank"),
          cume_dist().over(wDup).as("cume"))
      },
      Some(
        """SELECT event_type, event_id,
          |       floor(value / 50)::bigint AS value_bucket,
          |       (row_number() OVER w)::int AS rn,
          |       (rank() OVER wd)::int AS rnk,
          |       (dense_rank() OVER wd)::int AS drnk,
          |       (ntile(4) OVER w)::int AS quartile,
          |       percent_rank() OVER wd AS pct_rank,
          |       cume_dist() OVER wd AS cume
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY floor(value / 50), event_id),
          |       wd AS (PARTITION BY event_type ORDER BY floor(value / 50))""".stripMargin)),

    // ---- conditional / boolean aggregates ---------------------------------
    ("events_conditional_aggs",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(
            count_if(col("value") > 250).as("n_high"),
            bool_or(col("value") > 450).as("any_very_high"),
            bool_and(col("value") > 0).as("all_positive"),
            sum(when(col("value") > 250, col("value").cast("decimal(18,2)")))
              .cast("double").as("sum_high"),
            count(when(col("user_id") % 2 === 0, 1)).as("n_even_users")),
      Some(
        """SELECT event_type,
          |       count(*) FILTER (WHERE value > 250) AS n_high,
          |       bool_or(value > 450) AS any_very_high,
          |       bool_and(value > 0) AS all_positive,
          |       cast(sum(cast(value AS decimal(18,2))) FILTER (WHERE value > 250) AS double) AS sum_high,
          |       count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_users
          |FROM events GROUP BY 1""".stripMargin)),

    // ---- null-semantics battery (null-safe equality, coalescing, NaN) -----
    ("events_null_semantics",
      (s: SparkSession, d: String) => {
        val nulled = Tables.events(s, d).select(
          col("event_id"),
          nullif(col("event_type"), lit("error")).as("maybe_type"),
          when(col("value") > 400, col("value")).as("maybe_value"))
        nulled.select(
          col("event_id"),
          col("maybe_type"),
          coalesce(col("maybe_type"), lit("(redacted)")).as("filled_type"),
          col("maybe_type").eqNullSafe(lit("click")).as("is_click_nullsafe"),
          col("maybe_type").isNull.as("was_error"),
          coalesce(col("maybe_value"), lit(-1.0)).as("value_or_default"))
      },
      Some(
        """WITH n AS (
          |  SELECT event_id,
          |         nullif(event_type, 'error') AS maybe_type,
          |         CASE WHEN value > 400 THEN value END AS maybe_value
          |  FROM events)
          |SELECT event_id, maybe_type,
          |       coalesce(maybe_type, '(redacted)') AS filled_type,
          |       maybe_type IS NOT DISTINCT FROM 'click' AS is_click_nullsafe,
          |       maybe_type IS NULL AS was_error,
          |       coalesce(maybe_value, -1.0) AS value_or_default
          |FROM n""".stripMargin)),

    // ---- distribution shape: orders-per-customer histogram (Q13-like) -----
    ("orders_per_customer_histogram",
      (s: SparkSession, d: String) => {
        val counts = Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
        counts.groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_customers"))
      },
      Some(
        """SELECT n_orders, count(*) AS n_customers
          |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
          |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |      GROUP BY 1)
          |GROUP BY 1""".stripMargin)),

    // ---- single-pass data-quality profile ---------------------------------
    ("events_profile",
      (s: SparkSession, d: String) =>
        Profile.columnProfile(Tables.events(s, d)),
      // One global-aggregate block per column (not GROUP BY over a unioned
      // long relation): a profile of an EMPTY table is still one row per
      // column with n_rows = 0 and null_ratio NULL — the engine's (and the
      // useful) semantics; a grouped oracle would emit zero rows there.
      Some {
        def block(c: String): String =
          s"""SELECT '$c' AS column_name, count(*) AS n_rows,
            |       coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)::bigint AS n_nulls,
            |       count(DISTINCT $c)::bigint AS n_distinct,
            |       CASE WHEN count(*) > 0
            |            THEN sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::double / count(*)
            |       END AS null_ratio
            |FROM events""".stripMargin
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")
          .map(block).mkString("\nUNION ALL\n")
      }),

    // ---- corpus vocabulary: token frequencies (explode-aggregate) ---------
    ("word_counts",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .select(explode(TextOps.tokens(TextOps.normalize(col("text")))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some(
        """SELECT token, count(*) AS n
          |FROM (SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
          |      FROM documents)
          |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // ---- First-occurrence dedup over an event stream ----------------------
    ("events_dedup_first",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(ntz(min(col("ts"))).as("first_ts"), count(lit(1)).as("n_occurrences")),
      Some(
        """SELECT user_id, event_type, min(ts) AS first_ts,
          |       count(*) AS n_occurrences
          |FROM events GROUP BY 1, 2""".stripMargin)),

    // SCD type-2 run history (gaps-and-islands): consecutive same-state
    // events collapse into validity intervals with a null-open current run —
    // the change-log → dimension-history transform. Null-safe change flag,
    // run ids from a running sum, lead() for the closing bound.
    ("events_scd2_history",
      (s: SparkSession, d: String) =>
        Scd.runHistory(Tables.events(s, d), col("user_id"), col("event_type"),
            col("ts"), col("event_id"))
          .select(col("k").as("user_id"), col("run_id"),
            col("state").as("event_type"), ntz(col("valid_from")).as("valid_from"),
            ntz(col("last_seen")).as("last_seen"), col("n_events"),
            ntz(col("valid_to")).as("valid_to")),
      Some(
        """WITH flagged AS (
          |  SELECT user_id AS k, event_type AS state, ts AS t, event_id AS tie,
          |         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |                   IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
          |  FROM events),
          |runs0 AS (
          |  SELECT k, state, t,
          |         sum(chg) OVER (PARTITION BY k ORDER BY t, tie
          |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          |  FROM flagged),
          |runs AS (
          |  SELECT k AS user_id, run_id::bigint AS run_id, state AS event_type,
          |         min(t) AS valid_from, max(t) AS last_seen, count(*) AS n_events
          |  FROM runs0 GROUP BY 1, 2, 3)
          |SELECT user_id, run_id, event_type, valid_from, last_seen, n_events,
          |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to
          |FROM runs""".stripMargin)),
  )
}
