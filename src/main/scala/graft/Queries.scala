package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/**
 * The driver-facing query catalog: every operator from SURVEY.md §2 plus the
 * training-data-pipeline extension surface, each as a (SparkSession, sfDir) =>
 * DataFrame paired with DuckDB oracle SQL over the same parquet tables.
 *
 * Cross-engine determinism conventions (every oracle must hash-match):
 *  - timestamps are emitted as TIMESTAMP_NTZ (session TZ is UTC, so values
 *    are unchanged; parquet then round-trips as naive timestamps, matching
 *    DuckDB's output dtype);
 *  - double sums go through DECIMAL(18,2) and back to double — exact and
 *    summation-order-independent, so Spark's parallel partial aggregation
 *    and DuckDB's serial scan agree bit-for-bit;
 *  - integer sums are cast to bigint on both sides (DuckDB sums to HUGEINT);
 *  - hashes are md5-derived (identical in both engines), never engine-native;
 *  - every ORDER BY ... LIMIT has a unique tie-break key;
 *  - DuckDB `len()`/`hour()` results are cast to int to match Spark's
 *    IntegerType, and `//` (truncating division) mirrors Java/Spark long
 *    division semantics.
 */
object Queries {

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Exact, order-independent double sum: through decimal(18,scale).
    * The scale must cover the value's exact decimal width (2 for raw money
    * columns, 4 for price*(1-disc), 6 for price*(1-disc)*(1+tax)) so the
    * double→decimal rounding never lands on a tie — Spark rounds HALF_UP,
    * DuckDB half-even, and only ties expose the difference. */
  private def sumDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  // ==========================================================================
  // Flight-event surface (reference parity, SURVEY §2 P1-P3/K1-K3/W1-W3/A1-A3)
  //
  // The testdata has no flight table, so we synthesize the reference's JSON
  // wire format deterministically from `events` (every field a pure function
  // of event columns), then run the *real* parse/aggregate operators on it.
  // The oracle computes the same end state directly — so the whole
  // from_json → derive → window → aggregate path is what's being verified.
  // ==========================================================================

  /** Deterministic flight-event JSON off the events table. Even event_ids use
    * the boolean `delayed` union branch, odd ids the string `status` branch
    * (with mixed case, exercising the case-insensitive compare).
    *
    * Deliberately NO repartition here, although the single-row-group testdata
    * parquet serializes the encode→parse chain onto one task (the real source
    * is a partitioned Kafka topic; readme.txt:29-33): an exchange between
    * this projection and the parse lets PushDownPredicates push the parser's
    * reject-drop null filters below it, inlining the whole
    * from_json(to_json(..)) chain into an interpreted Filter at the scan —
    * one evaluation PER CONJUNCT (8×), and flight_parse loses whole-stage
    * codegen entirely. Measured at sf0.1: 1.21 s without the exchange vs
    * 1.91 s with, parallelism notwithstanding (PlanAuditSpec pins the
    * codegen span). */
  def wireFlightJson(ev: DataFrame): DataFrame = {
    val tsSec = date_trunc("second", col("ts"))
    val delayMin = (floor(col("value")).cast("long") - 50).as("dm")
    ev.select(tsSec.as("ts_sec"), col("event_id"), col("user_id"),
        col("event_type"), col("value"), delayMin)
      .select(to_json(struct(
        concat(lit("F"), col("event_id").cast("string")).as("flightId"),
        concat(upper(col("event_type")), lit("-"),
          (col("event_id") % 1000).cast("string")).as("flightNumber"),
        col("event_type").as("airline"),
        concat(lit("O"), (col("user_id") % 10).cast("string")).as("origin"),
        concat(lit("D"), (col("event_id") % 7).cast("string")).as("destination"),
        date_format(col("ts_sec"), "yyyy-MM-dd'T'HH:mm:ss").as("scheduledArrival"),
        date_format(timestamp_seconds(unix_timestamp(col("ts_sec")) + col("dm") * 60),
          "yyyy-MM-dd'T'HH:mm:ss").as("actualArrival"),
        when(col("event_id") % 2 === 0, col("value") > 75).as("delayed"),
        when(col("event_id") % 2 =!= 0,
          when(col("value") > 75, lit("Delayed")).otherwise(lit("ON_TIME"))).as("status"),
        concat(lit("u"), col("user_id").cast("string")).as("userId")
      )).as("value"))
  }

  def parsedFlights(spark: SparkSession, dir: String): DataFrame =
    FlightOps.parseFlightEvents(wireFlightJson(Tables.events(spark, dir)))

  /** Deterministic users dimension off `events` user ids, shaped like the
    * reference DDL's `users` table (readme.txt: user_id, email, phone,
    * notify_email, notify_sms, preferred_channel, opt_in). Every attribute is
    * a pure function of the numeric id, so the DuckDB oracle reproduces it
    * and the id-mod patterns exercise every branch of the routing rule. */
  def syntheticUsers(ev: DataFrame): DataFrame =
    ev.select(col("user_id").as("uid")).distinct()
      .select(
        concat(lit("u"), col("uid").cast("string")).as("user_id"),
        concat(lit("user"), col("uid").cast("string"), lit("@example.com")).as("email"),
        concat(lit("+1555"), lpad(col("uid").cast("string"), 7, "0")).as("phone"),
        (col("uid") % 2).cast("int").as("notify_email"),
        when(col("uid") % 3 === 0, 1).otherwise(0).as("notify_sms"),
        when(col("uid") % 5 < 3, lit("email")).otherwise(lit("sms")).as("preferred_channel"),
        when(col("uid") % 10 =!= 0, 1).otherwise(0).as("opt_in"))

  /** DuckDB mirror of [[syntheticUsers]]. */
  private val usersCte =
    """, users AS (
      |  SELECT 'u' || uid AS user_id,
      |         'user' || uid || '@example.com' AS email,
      |         '+1555' || lpad(uid::varchar, 7, '0') AS phone,
      |         (uid % 2)::int AS notify_email,
      |         (CASE WHEN uid % 3 = 0 THEN 1 ELSE 0 END)::int AS notify_sms,
      |         CASE WHEN uid % 5 < 3 THEN 'email' ELSE 'sms' END AS preferred_channel,
      |         (CASE WHEN uid % 10 <> 0 THEN 1 ELSE 0 END)::int AS opt_in
      |  FROM (SELECT DISTINCT user_id AS uid FROM events))
      |""".stripMargin

  /** DuckDB CTE computing the same parsed-flight frame directly. */
  private val flightCte =
    """WITH flights AS (
      |  SELECT 'F' || event_id AS flight_id,
      |         upper(event_type) || '-' || (event_id % 1000) AS flight_number,
      |         event_type AS airline,
      |         'O' || (user_id % 10) AS origin,
      |         'D' || (event_id % 7) AS destination,
      |         date_trunc('second', ts) AS scheduled_time,
      |         date_trunc('second', ts) + to_minutes(floor(value)::bigint - 50) AS actual_time,
      |         (CASE WHEN value > 75 THEN 1 ELSE 0 END)::int AS is_delayed,
      |         'u' || user_id AS user_id,
      |         floor(value)::bigint - 50 AS delay_minutes
      |  FROM events)
      |""".stripMargin

  /** DuckDB CTE chain recomputing the LSH-candidate kNN graph (k=5, 4 bands
    * × 2 planes, the dedup_embedding_near plane family): `g` is the ranked
    * edge set (src_id, dst_id, cosine, rank ≤ 5). Shared by `sim_knn_graph`
    * and `emb_knn_density`. */
  private val knnGraphCte = knnGraphCteOver("embeddings")

  /** DuckDB CTE chain computing per-band LSH buckets (plus double vectors
    * and norms) for `table`, every CTE name prefixed with `p` so TWO
    * corpora can carry the chain side by side in one query (the admission
    * oracles). Planes mirror [[graft.operators.Similarity.lshBandBucketsFast]]
    * (nBands=4, rowsPerBand=2). Emits `<p>v`, `<p>n`, `<p>bb`; ends with a
    * trailing comma for further CTEs. */
  private def lshBucketsCteOver(table: String, p: String = ""): String =
    s"""${p}v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
      |           FROM $table),
      |${p}n AS (SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nn FROM ${p}v),
      |${p}bb AS (
      |  SELECT vec_id, ve, nn, band,
      |         list_sum(list_transform(generate_series(0, 1), j ->
      |           CASE WHEN list_sum(list_transform(generate_series(0, len(ve) - 1), d ->
      |                  ve[d + 1] * ((('0x' || substr(md5((band * 2 + j) || ':' || d), 1, 15))::bigint
      |                                / 1.152921504606846976e18) * 2 - 1))) >= 0
      |                THEN cast(pow(2.0, j) AS bigint) ELSE 0 END))::bigint AS bucket
      |  FROM ${p}n CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
      |""".stripMargin

  /** [[knnGraphCte]] with the corpus CTE/table name parameterized, for
    * compositions that run the graph over a FILTERED survivor set. */
  private def knnGraphCteOver(table: String, k: Int = 5): String =
    "WITH " + lshBucketsCteOver(table) +
    s"""pairs AS (
      |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id,
      |         list_dot_product(a.ve, b.ve) / (a.nn * b.nn) AS cosine
      |  FROM bb a JOIN bb b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      |g AS (
      |  SELECT src_id, dst_id, cosine,
      |         row_number() OVER (PARTITION BY src_id
      |                            ORDER BY cosine DESC, dst_id)::int AS rank
      |  FROM pairs QUALIFY rank <= $k)
      |""".stripMargin

  /** Shared oracle for the label-propagation pair (`graph_label_spread` /
    * `graph_label_spread_served`): both rounds unrolled over the kNN CTE,
    * MATERIALIZED where a step is referenced more than once. */
  private lazy val labelSpreadOracle: String = knnGraphCte +
    """, und AS MATERIALIZED (
      |  SELECT src_id AS src, dst_id AS dst FROM g
      |  UNION
      |  SELECT dst_id AS src, src_id AS dst FROM g),
      |seeds AS MATERIALIZED (
      |  SELECT vec_id AS node, label FROM embeddings WHERE vec_id % 10 = 0),
      |v1 AS (
      |  SELECT u.dst AS node, l.label, count(*) AS votes
      |  FROM und u JOIN seeds l ON l.node = u.src GROUP BY 1, 2),
      |i1 AS MATERIALIZED (
      |  SELECT node, label FROM (
      |    SELECT node, label,
      |           row_number() OVER (PARTITION BY node
      |                              ORDER BY votes DESC, label) AS rk
      |    FROM v1)
      |  WHERE rk = 1 AND node NOT IN (SELECT node FROM seeds)),
      |l1 AS MATERIALIZED (
      |  SELECT node, label FROM seeds
      |  UNION ALL SELECT node, label FROM i1),
      |v2 AS (
      |  SELECT u.dst AS node, l.label, count(*) AS votes
      |  FROM und u JOIN l1 l ON l.node = u.src GROUP BY 1, 2),
      |i2 AS (
      |  SELECT node, label FROM (
      |    SELECT node, label,
      |           row_number() OVER (PARTITION BY node
      |                              ORDER BY votes DESC, label) AS rk
      |    FROM v2)
      |  WHERE rk = 1 AND node NOT IN (SELECT node FROM seeds))
      |SELECT node, label::int AS label, 1::int AS is_seed,
      |       0::int AS origin_round
      |FROM seeds
      |UNION ALL
      |SELECT i2.node, i2.label::int, 0::int,
      |       (CASE WHEN i1.label = i2.label THEN 1 ELSE 2 END)::int
      |FROM i2 LEFT JOIN i1 ON i1.node = i2.node""".stripMargin

  /** Oracle for `graph_label_spread_incremental`: the admission ALGORITHM
    * replayed end to end — base labeling (2 propagation rounds over the
    * lowest-4/5 slice), new-side LSH buckets on the same planes, top-5
    * base neighbors per new node by exact cosine, one majority-vote round
    * against the base labeling, new seeds clamped. (Unlike the dedup
    * admission rows there is NO from-scratch equivalence to pin — one
    * admission vote is deliberately cheaper than full 2-round propagation —
    * so the contract is the algorithm, the kNN-family convention.) */
  private lazy val labelAdmitOracle: String =
    """WITH cutv AS MATERIALIZED (
      |  SELECT floor(max(vec_id) * 4 / 5)::bigint AS cut FROM embeddings),
      |oldemb AS MATERIALIZED (
      |  SELECT e.* FROM embeddings e, cutv WHERE e.vec_id < cutv.cut),
      |newemb AS MATERIALIZED (
      |  SELECT e.* FROM embeddings e, cutv WHERE e.vec_id >= cutv.cut),
      |""".stripMargin +
      knnGraphCteOver("oldemb").stripPrefix("WITH ").stripSuffix("\n") + ",\n" +
      lshBucketsCteOver("newemb", "q") +
      """und AS MATERIALIZED (
        |  SELECT src_id AS src, dst_id AS dst FROM g
        |  UNION
        |  SELECT dst_id AS src, src_id AS dst FROM g),
        |oseeds AS MATERIALIZED (
        |  SELECT vec_id AS node, label FROM oldemb WHERE vec_id % 10 = 0),
        |v1 AS (
        |  SELECT u.dst AS node, l.label, count(*) AS votes
        |  FROM und u JOIN oseeds l ON l.node = u.src GROUP BY 1, 2),
        |i1 AS MATERIALIZED (
        |  SELECT node, label FROM (
        |    SELECT node, label,
        |           row_number() OVER (PARTITION BY node
        |                              ORDER BY votes DESC, label) AS rk
        |    FROM v1)
        |  WHERE rk = 1 AND node NOT IN (SELECT node FROM oseeds)),
        |l1 AS MATERIALIZED (
        |  SELECT node, label FROM oseeds
        |  UNION ALL SELECT node, label FROM i1),
        |v2 AS (
        |  SELECT u.dst AS node, l.label, count(*) AS votes
        |  FROM und u JOIN l1 l ON l.node = u.src GROUP BY 1, 2),
        |i2 AS (
        |  SELECT node, label FROM (
        |    SELECT node, label,
        |           row_number() OVER (PARTITION BY node
        |                              ORDER BY votes DESC, label) AS rk
        |    FROM v2)
        |  WHERE rk = 1 AND node NOT IN (SELECT node FROM oseeds)),
        |oldlab AS MATERIALIZED (
        |  SELECT node, label FROM oseeds
        |  UNION ALL SELECT node, label FROM i2),
        |cand AS (
        |  SELECT DISTINCT w.vec_id AS new_id, b.vec_id AS old_id,
        |         list_dot_product(w.ve, b.ve) / (w.nn * b.nn) AS cosine
        |  FROM qbb w JOIN bb b ON w.band = b.band AND w.bucket = b.bucket),
        |knn AS (
        |  SELECT new_id, old_id FROM (
        |    SELECT new_id, old_id,
        |           row_number() OVER (PARTITION BY new_id
        |                              ORDER BY cosine DESC, old_id) AS rk
        |    FROM cand) WHERE rk <= 5),
        |nseeds AS MATERIALIZED (
        |  SELECT vec_id AS node, label FROM newemb WHERE vec_id % 10 = 0),
        |av AS (
        |  SELECT k.new_id AS node, l.label, count(*) AS n_votes
        |  FROM knn k JOIN oldlab l ON l.node = k.old_id GROUP BY 1, 2)
        |SELECT node, label::int AS label, 1::int AS is_seed,
        |       0::bigint AS n_votes
        |FROM nseeds
        |UNION ALL
        |SELECT node, label::int, 0::int, n_votes::bigint
        |FROM (SELECT node, label, n_votes,
        |             row_number() OVER (PARTITION BY node
        |                                ORDER BY n_votes DESC, label) AS rk
        |      FROM av)
        |WHERE rk = 1 AND node NOT IN (SELECT node FROM nseeds)""".stripMargin

  // ==========================================================================
  // The catalog
  // ==========================================================================

  /** The entity-resolution family's dirty corpus: the customer table plus
    * typo'd duplicate records — every 3rd customer gets a 1-edit copy at a
    * key-dependent digit position (id + 1e9), every 9th also a fixed
    * 2-edit copy (id + 2e9). Shared by `dedup_entity_match` (pairs) and
    * `dedup_entity_resolve` (pairs → components → golden record). */
  private def dirtyCustomerParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val base = Tables.customer(s, d).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      concat_ws(":", col("c_nationkey").cast("string"),
        col("c_mktsegment")).as("blk"),
      col("c_custkey").as("k"))
    val p = (lit(10) + col("k") % 9).cast("int")
    val d1 = base.filter(col("k") % 3 === 0)
      .select((col("id") + 1000000000L).as("id"),
        concat(col("name").substr(lit(1), p - 1), lit("x"),
          col("name").substr(p + 1, length(col("name")))).as("name"),
        col("blk"))
    val d2 = base.filter(col("k") % 9 === 0)
      .select((col("id") + 2000000000L).as("id"),
        concat(substring(col("name"), 1, 9), lit("xy"),
          col("name").substr(lit(12), length(col("name")))).as("name"),
        col("blk"))
    (base.select(col("id"), col("name"), col("blk")), d1.unionAll(d2))
  }

  private[graft] def dirtyCustomers(s: SparkSession, d: String): DataFrame = {
    val (base, arrivals) = dirtyCustomerParts(s, d)
    base.unionAll(arrivals)
  }

  /** The entity family's shared segment scheme: thirds of the 9-digit
    * customer-name suffix. ONE definition — the catalog rows, the
    * Artifacts index/label builders, and the streaming parity spec all
    * interpolate it. */
  private[graft] def entityPieces: Seq[Column] = Seq(
    substring(col("name"), 10, 3), substring(col("name"), 13, 3),
    substring(col("name"), 16, 3))

  /** Shared oracle for BOTH dedup_entity_resolve rows (training and
    * served): the match CTEs + recursive min-label components + the
    * golden-record election. */
  // lazy: entityMatchCtes initializes later in the object body
  private lazy val entityResolveOracle = entityMatchCtes +
    """comp AS (
      |  SELECT id, min(lbl) AS entity_id
      |  FROM (
      |    WITH RECURSIVE r(id, lbl) AS (
      |      SELECT id, id FROM dirty
      |      UNION
      |      SELECT e.src, r.lbl
      |      FROM (SELECT id_a AS src, id_b AS dst FROM matches
      |            UNION ALL SELECT id_b, id_a FROM matches) e
      |      JOIN r ON r.id = e.dst)
      |    SELECT id, lbl FROM r)
      |  GROUP BY 1)
      |SELECT c.entity_id, d.id,
      |       (count(*) OVER (PARTITION BY c.entity_id))::bigint AS n_records,
      |       (CASE WHEN row_number() OVER (PARTITION BY c.entity_id
      |                                     ORDER BY length(d.name) DESC, d.id) = 1
      |             THEN 1 ELSE 0 END)::int AS is_canonical
      |FROM comp c JOIN dirty d ON d.id = c.id""".stripMargin

  /** The golden-record election over a (id → entity_id) label mapping:
    * longest name, then lowest id — shared by the training and served
    * entity-resolve rows. */
  private def entityElection(dirty: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("entity_id"))
      .orderBy(length(col("name")).desc, col("id"))
    dirty.join(labels, "id")
      .withColumn("n_records",
        count(lit(1)).over(Window.partitionBy(col("entity_id"))))
      .withColumn("is_canonical", (row_number().over(w) === 1).cast("int"))
      .select(col("entity_id"), col("id"), col("n_records"),
        col("is_canonical"))
  }

  /** DuckDB twin of [[dirtyCustomers]] + the segment-pair blocking /
    * hot-key drop / levenshtein-verify chain of `Dedup.entityMatch` —
    * emits CTEs through `matches` (id_a, id_b at lev ≤ 2), trailing comma. */
  private val entityMatchCtes =
    """WITH base AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |         c_nationkey::varchar || ':' || c_mktsegment AS blk,
      |         c_custkey AS k
      |  FROM customer),
      |d1 AS (
      |  SELECT id + 1000000000 AS id,
      |         substr(name, 1, (10 + k % 9) - 1) || 'x' ||
      |           substr(name, (10 + k % 9) + 1) AS name,
      |         blk FROM base WHERE k % 3 = 0),
      |d2 AS (
      |  SELECT id + 2000000000 AS id,
      |         substr(name, 1, 9) || 'xy' || substr(name, 12) AS name,
      |         blk FROM base WHERE k % 9 = 0),
      |dirty AS (
      |  SELECT id, name, blk FROM base
      |  UNION ALL SELECT * FROM d1
      |  UNION ALL SELECT * FROM d2),
      |pieces AS (
      |  SELECT id, name, blk, substr(name, 10, 3) AS t0,
      |         substr(name, 13, 3) AS t1, substr(name, 16, 3) AS t2
      |  FROM dirty),
      |keys AS (
      |  SELECT id, name, blk || '|01|' || t0 || '|' || t1 AS key FROM pieces
      |  UNION ALL SELECT id, name, blk || '|02|' || t0 || '|' || t2 FROM pieces
      |  UNION ALL SELECT id, name, blk || '|12|' || t1 || '|' || t2 FROM pieces),
      |kept AS (
      |  SELECT id, name, key FROM (
      |    SELECT id, name, key, count(*) OVER (PARTITION BY key) AS ksize
      |    FROM keys)
      |  WHERE ksize <= 64),
      |cand AS MATERIALIZED (
      |  SELECT DISTINCT a.id AS id_a, a.name AS name_a,
      |         b.id AS id_b, b.name AS name_b
      |  FROM kept a JOIN kept b ON a.key = b.key AND a.id < b.id),
      |matches AS MATERIALIZED (
      |  SELECT id_a, id_b FROM cand
      |  WHERE levenshtein(name_a, name_b) <= 2),
      |""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

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

    // ==========================================================================
    // TPC-H-style relational surface (joins / sort / top-k / grouped aggs)
    // ==========================================================================

    ("tpch_q1",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumDec(col("l_quantity")).as("sum_qty"),
            sumDec(col("l_extendedprice")).as("sum_base_price"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price") / col("count_order")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
          |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS sum_disc_price,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(18,6))) AS double) AS sum_charge,
          |       count(*) AS count_order,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty,
          |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          |GROUP BY 1, 2""".stripMargin)),

    ("tpch_q3_topk",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY 1, 2, 3
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 10""".stripMargin)),

    ("tpch_q5_region_revenue",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT r_name, n_name,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2""".stripMargin)),

    ("tpch_brand_topk",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            sumDec(col("l_quantity")).as("total_qty"))
          .orderBy(col("revenue").desc, col("p_brand"))
          .limit(5),
      Some(
        """SELECT p_brand,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY 1 ORDER BY revenue DESC, p_brand LIMIT 5""".stripMargin)),

    // Single-scan filter-aggregate (TPC-H Q6 shape — pure pushdown demo).
    ("tpch_q6_revenue",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(sumDec(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items")),
      Some(
        """SELECT cast(sum(cast(l_extendedprice * l_discount AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)),

    // Group-HAVING + join-back (TPC-H Q18 shape): orders whose total
    // lineitem quantity exceeds a threshold.
    ("tpch_q18_big_orders",
      (s: SparkSession, d: String) => {
        val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(sumDec(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 150)
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
      },
      Some(
        """SELECT o_orderkey, o_orderdate, o_totalprice, total_qty
          |FROM orders
          |JOIN (SELECT l_orderkey,
          |             cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
          |      FROM lineitem GROUP BY 1
          |      HAVING cast(sum(cast(l_quantity AS decimal(18,2))) AS double) > 150) b
          |  ON o_orderkey = b.l_orderkey""".stripMargin)),

    // Correlated-subquery shape (customers above their nation's average
    // balance) — decorrelated to a window average, the scalable plan.
    ("above_avg_customers",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_nationkey"))
        Tables.customer(s, d)
          .withColumn("nation_n", count(lit(1)).over(w))
          .withColumn("nation_avg",
            sum(col("c_acctbal").cast("decimal(18,2)")).over(w).cast("double") / col("nation_n"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("nation_avg"))
      },
      Some(
        """WITH a AS (
          |  SELECT c_custkey, c_nationkey, c_acctbal,
          |         cast(sum(cast(c_acctbal AS decimal(18,2))) OVER (PARTITION BY c_nationkey) AS double)
          |           / count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
          |  FROM customer)
          |SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
          |FROM a WHERE c_acctbal > nation_avg""".stripMargin)),

    ("tpch_order_priority",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sumDec(col("o_totalprice")).as("total_price"))
          .withColumn("avg_price", col("total_price") / col("n_orders")),
      Some(
        """SELECT o_orderpriority, count(*) AS n_orders,
          |       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total_price,
          |       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) / count(*) AS avg_price
          |FROM orders GROUP BY 1""".stripMargin)),

    // Q4 shape: EXISTS decorrelated to a left-semi join, grouped counts.
    ("tpch_q4_exists",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val returned = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY 1""".stripMargin)),

    // Q7 shape: five-table join with a symmetric two-nation predicate and
    // per-year revenue. Nations broadcast; fact tables shuffle on join keys.
    ("tpch_q7_nation_volume",
      (s: SparkSession, d: String) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          // literal Q7 fixes one nation pair; generalized to every
          // cross-nation pair so the query is populated at all test scales
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      },
      Some(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |       year(l_shipdate)::int AS l_year,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE n1.n_name != n2.n_name
          |GROUP BY 1, 2, 3""".stripMargin)),

    // Q16 shape: distinct-aggregate (supplier variety per brand/type) — the
    // two-phase expand plan Catalyst builds for COUNT(DISTINCT).
    ("tpch_q16_supplier_variety",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(col("p_size") <= 10)
          .groupBy(col("p_brand"), col("p_type"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
      Some(
        """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_size <= 10
          |GROUP BY 1, 2""".stripMargin)),

    // Q19 shape: disjunction of conjunctive range predicates across the join
    // — exercises OR-predicate pushdown and join-then-filter planning.
    ("tpch_q19_disjunctive",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items")),
      Some(
        """SELECT cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // Q15 shape: scalar-subquery max with join-back — the top-revenue
    // supplier(s). Exercises Catalyst's scalar-subquery planning.
    ("tpch_q15_top_supplier",
      (s: SparkSession, d: String) => {
        val rev = Tables.lineitem(s, d).groupBy(col("l_suppkey"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("total_revenue"))
        val best = rev.agg(max(col("total_revenue")).as("best"))
        Tables.supplier(s, d)
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(best), col("total_revenue") === col("best"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double)
          |           AS total_revenue
          |  FROM lineitem GROUP BY 1)
          |SELECT s_suppkey, s_name, total_revenue
          |FROM supplier JOIN rev ON s_suppkey = l_suppkey
          |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin)),

    // Q8 shape: national market share — conditional revenue share per year
    // across a six-table join. Dims broadcast; the two fact joins shuffle on
    // their keys; numerator and denominator are both exact decimal sums so
    // the ratio is order-independent.
    ("tpch_q8_market_share",
      (s: SparkSession, d: String) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
        val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .join(broadcast(r), col("c_rk") === col("r_regionkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("nation_revenue"),
            sum(rev).cast("double").as("total_revenue"))
          .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
      },
      Some(
        """WITH j AS (
          |  SELECT year(o_orderdate)::int AS o_year,
          |         cast(sum(CASE WHEN n1.n_name = 'NATION_3'
          |                       THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
          |                       ELSE cast(0 AS decimal(18,4)) END) AS double) AS nation_revenue,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS total_revenue
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |  JOIN region ON n2.n_regionkey = r_regionkey
          |  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
          |  GROUP BY 1)
          |SELECT o_year, nation_revenue, total_revenue,
          |       nation_revenue / total_revenue AS mkt_share
          |FROM j""".stripMargin)),

    // Q10 shape: returned-item reporting — top-20 customers by revenue lost
    // to returns in a half-year window. Grouped on the full customer tuple
    // (all functionally dependent on c_custkey), top-k with a unique
    // tie-break, nation broadcast.
    ("tpch_q10_returned_items",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(
        """SELECT c_custkey, c_name, c_acctbal, n_name,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          |GROUP BY 1, 2, 3, 4
          |ORDER BY revenue DESC, c_custkey
          |LIMIT 20""".stripMargin)),

    // Q2 shape (adapted: lineitem price stands in for the absent partsupp
    // supplycost): per ECONOMY part, the EUROPE supplier(s) achieving the
    // minimum observed price — the correlated-min-over-a-4-way-join plan.
    // Spark side decorrelates to a window min over the ONE joined frame
    // (partition = part key, small groups) instead of the aggregate +
    // join-back, which would recompute the join on both sides; the oracle
    // keeps the genuinely correlated subquery. min() of doubles picks an
    // existing value (no arithmetic) so equality is engine-exact; DISTINCT
    // collapses repeat (part, supplier) trades at the min price, mirroring
    // partsupp's uniqueness.
    ("tpch_q2_min_cost_supplier",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val joined = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
            .select(col("p_partkey"), col("p_name"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        joined
          .withColumn("min_price",
            min(col("l_extendedprice")).over(Window.partitionBy(col("p_partkey"))))
          .filter(col("l_extendedprice") === col("min_price"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
            col("n_name"), col("s_acctbal"), col("min_price"))
          .distinct()
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"), col("s_suppkey"))
          .limit(100)
      },
      Some(
        """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
          |       s.s_acctbal, l.l_extendedprice AS min_price
          |FROM lineitem l
          |JOIN part p ON l.l_partkey = p.p_partkey
          |JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |JOIN nation n ON s.s_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
          |  AND l.l_extendedprice = (
          |    SELECT min(l2.l_extendedprice)
          |    FROM lineitem l2
          |    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
          |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
          |LIMIT 100""".stripMargin)),

    // Q9 shape (adapted: p_retailprice × quantity stands in for the absent
    // partsupp supplycost): profit by supplier nation × order year over the
    // 5-way lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ nation join — the
    // multi-way rollup plan. All three dims broadcast; orders is the only
    // shuffled join side. The profit expression is three IEEE double ops
    // (bit-identical cross-engine) quantized to decimal(18,4) before the
    // order-sensitive sum.
    ("tpch_q9_profit_rollup",
      (s: SparkSession, d: String) => {
        val amount = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%widget%"))
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast("double").as("sum_profit"))
      },
      Some(
        """SELECT n_name, year(o_orderdate)::int AS o_year,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
          |                     AS decimal(18,4))) AS double) AS sum_profit
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN orders ON l_orderkey = o_orderkey
          |WHERE p_name LIKE '%widget%'
          |GROUP BY 1, 2""".stripMargin)),

    // Q11 shape (adapted: shipped value per part for one region's suppliers
    // stands in for partsupp stock value): parts whose value exceeds 2× the
    // average part value — the HAVING-over-a-global-scalar plan. Both
    // scalars (total value, part count) ride ONE 1-row broadcast (nested
    // loop by construction, bounded — exempted in PlanAuditSpec, the q22
    // precedent); the threshold compare is integer-scaled decimal×count so
    // no division ever happens — exact in both engines.
    ("tpch_q11_important_parts",
      (s: SparkSession, d: String) => {
        val base = Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * col("l_quantity")).cast("decimal(18,4)").as("v"))
        val scalars = base.agg(sum(col("v")).as("total"),
          countDistinct(col("l_partkey")).as("nparts"))
        base.groupBy(col("l_partkey")).agg(sum(col("v")).as("value_dec"))
          .crossJoin(broadcast(scalars))
          .filter(col("value_dec") * col("nparts") > col("total") * 2)
          .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
      },
      Some(
        """WITH base AS (
          |  SELECT l_partkey, cast(l_extendedprice * l_quantity AS decimal(18,4)) AS v
          |  FROM lineitem
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |tot AS (SELECT sum(v) AS total, count(DISTINCT l_partkey) AS nparts FROM base)
          |SELECT l_partkey, cast(sum(v) AS double) AS part_value
          |FROM base, tot
          |GROUP BY l_partkey, total, nparts
          |HAVING sum(v) * nparts > total * 2""".stripMargin)),

    // Q12 shape (adapted: testdata has no l_shipmode/commitdate): per return
    // flag, high- vs low-priority line counts for a ship-year — the
    // conditional-count-over-join plan, exact long sums.
    ("tpch_q12_priority_by_flag",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count")),
      Some(
        """SELECT l_returnflag,
          |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::bigint AS high_line_count,
          |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::bigint AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |GROUP BY 1""".stripMargin)),

    // Q13 as-named (adapted: testdata has no o_comment; the NOT-LIKE filter
    // rides o_orderpriority instead). `orders_per_customer_histogram` covers
    // the unfiltered distribution; what full Q13 adds is the right side
    // filtered IN THE ON CLAUSE of the LEFT OUTER join — the predicate must
    // stay inside the join (a post-join WHERE would drop the no-order
    // customers whose count should be 0), so Catalyst pushes it to the
    // orders scan but NOT past the outer join's null-extension. At scale:
    // the join shuffles on custkey (both sides large, no broadcast); the
    // distribution agg's domain is tiny, fully map-side-combinable.
    ("tpch_q13_custdist",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o,
            c("c_custkey") === o("o_custkey") &&
              !o("o_orderpriority").like("%URGENT%"),
            "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some(
        """SELECT c_count, count(*)::bigint AS custdist
          |FROM (SELECT c.c_custkey, count(o.o_orderkey)::bigint AS c_count
          |      FROM customer c LEFT OUTER JOIN orders o
          |        ON c.c_custkey = o.o_custkey
          |       AND o.o_orderpriority NOT LIKE '%URGENT%'
          |      GROUP BY c.c_custkey) c_orders
          |GROUP BY c_count""".stripMargin)),

    // Q14 shape: promotion-revenue share for a quarter — conditional share
    // over a broadcast part join, single final row.
    ("tpch_q14_promo_share",
      (s: SparkSession, d: String) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"))
          .withColumn("promo_share", lit(100.0) * col("promo_revenue") / col("total_revenue"))
      },
      Some(
        """WITH j AS (
          |  SELECT cast(sum(CASE WHEN p_type = 'PROMO'
          |                       THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
          |                       ELSE cast(0 AS decimal(18,4)) END) AS double) AS promo_revenue,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS total_revenue
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01')
          |SELECT promo_revenue, total_revenue,
          |       100.0 * promo_revenue / total_revenue AS promo_share
          |FROM j""".stripMargin)),

    // Q17 shape: small-quantity-order revenue — the correlated per-part
    // average decorrelated to a grouped aggregate joined back on the part
    // key (shuffle on l_partkey, no window). avg = exact-sum / count so both
    // engines derive the identical threshold double.
    ("tpch_q17_small_qty",
      (s: SparkSession, d: String) => {
        val partAvg = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("pk"))
          .agg((sumDec(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#1")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(sumDec(col("l_extendedprice")).as("total_price"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """WITH pa AS (
          |  SELECT l_partkey AS pk,
          |         cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty
          |  FROM lineitem GROUP BY 1)
          |SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS total_price,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN pa ON l_partkey = pk
          |WHERE p_brand = 'Brand#1' AND l_quantity < avg_qty * 0.5""".stripMargin)),

    // Q20 shape (adapted: shipped quantity stands in for partsupp
    // availability): the nested semi-join chain — suppliers who moved more
    // than a threshold of PROMO-part quantity in 1997. The qualifying-key
    // set is an aggregate, then a left-semi prune of the dimension.
    ("tpch_q20_semi_chain",
      (s: SparkSession, d: String) => {
        val qualifying = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sumDec(col("l_quantity")).as("qty"))
          .filter(col("qty") > 350)
          .select(col("l_suppkey"))
        Tables.supplier(s, d)
          .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some(
        """SELECT s_suppkey, s_name, n_name
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_type = 'PROMO'
          |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |  GROUP BY 1
          |  HAVING cast(sum(cast(l_quantity AS decimal(18,2))) AS double) > 350)""".stripMargin)),

    // Q21 shape (adapted: return flag stands in for the commit/receipt-date
    // lateness predicate, absent from the testdata): suppliers who were the
    // ONLY supplier with a returned line in a finished multi-supplier order.
    // EXISTS → left-semi and NOT EXISTS → left-anti, both equi-joined on the
    // order key with a residual supplier-inequality filter, multiplicity of
    // the probe side preserved — the reference plan for nested EXISTS pairs.
    ("tpch_q21_sole_returner",
      (s: SparkSession, d: String) => {
        val l1 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val l2 = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val l3 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        l1.join(f, col("l_orderkey") === col("o_orderkey"))
          .join(l2, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_semi")
          .join(l3, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
            "left_anti")
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some(
        """SELECT s_name, count(*) AS numwait
          |FROM lineitem l1
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY 1
          |ORDER BY numwait DESC, s_name
          |LIMIT 10""".stripMargin)),

    // Q22 shape (adapted: custkey-mod segments stand in for phone prefixes,
    // and "idle" means no order since a cutoff — every synthetic customer
    // has at least one order all-time): the global scalar average joins in
    // as a 1-row broadcast (nested-loop by construction, bounded — exempted
    // in PlanAuditSpec), then an anti-join against recent orders.
    ("tpch_q22_idle_customers",
      (s: SparkSession, d: String) => {
        val cust = Tables.customer(s, d)
          .withColumn("segment", (col("c_custkey") % 7).cast("int"))
          .filter(col("segment").isin(0, 1, 2))
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg((sumDec(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("numcust"), sumDec(col("c_acctbal")).as("totacctbal"))
      },
      Some(
        """WITH cust AS (
          |  SELECT c_custkey, c_acctbal, (c_custkey % 7)::int AS segment
          |  FROM customer WHERE (c_custkey % 7) IN (0, 1, 2)),
          |a AS (
          |  SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*) AS avg_bal
          |  FROM cust WHERE c_acctbal > 0)
          |SELECT segment, count(*) AS numcust,
          |       cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS totacctbal
          |FROM cust, a
          |WHERE c_acctbal > avg_bal
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey
          |                    AND o_orderdate >= TIMESTAMP '2000-08-01')
          |GROUP BY 1""".stripMargin)),

    // ---- OVER-window analytic: top-3 orders per customer ------------------
    ("window_rank_orders",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      },
      Some(
        """SELECT o_custkey, cast(rnk AS int) AS rnk, o_orderkey, o_totalprice
          |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          |             row_number() OVER (PARTITION BY o_custkey
          |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |      FROM orders)
          |WHERE rnk <= 3""".stripMargin)),

    // ==========================================================================
    // Training-data pipeline surface: dedup / text / similarity / multimodal
    // ==========================================================================

    // Exact dedup, scale default: the grouping key the shuffle carries is
    // md5(text) — 32 hex chars per doc — not the document bytes. The
    // text-keyed variant lives on below as the explicit small-corpus opt-in
    // (the r9 skew-safe-default precedent).
    ("dedup_exact",
      (s: SparkSession, d: String) =>
        Dedup.exact(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id,
          |       count(*) AS n_copies
          |FROM documents GROUP BY 1""".stripMargin)),

    ("dedup_exact_by_text",
      (s: SparkSession, d: String) =>
        Dedup.exactByText(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """SELECT text, min(doc_id) AS canonical_id, count(*) AS n_copies
          |FROM documents GROUP BY 1""".stripMargin)),

    ("dedup_fingerprint",
      (s: SparkSession, d: String) =>
        Dedup.byFingerprint(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
          |       min(doc_id) AS canonical_id, count(*) AS n_copies
          |FROM documents GROUP BY 1""".stripMargin)),

    ("dedup_minhash_sigs",
      (s: SparkSession, d: String) =>
        Dedup.minhashSignatures(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(shingleCte + minhashSigsSql)),

    ("dedup_lsh_candidates",
      (s: SparkSession, d: String) =>
        Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(Tables.documents(s, d), col("text"), col("doc_id")))),
      Some(lshCandCtes + "SELECT doc_a, doc_b FROM cand")),

    // Asymmetric containment on the LSH candidate pairs: |A∩B|/|A| vs
    // |A∩B|/|B| — a HIGH one-sided containment with a lower Jaccard is the
    // quote/subset signature (doc B embeds doc A) that symmetric Jaccard
    // misses. Same bounded candidate space and shingle-set join as the
    // verify step; only the projection differs.
    ("dedup_containment",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
            col("n_b"),
            (col("n_inter").cast("double") / col("n_a")).as("containment_a"),
            (col("n_inter").cast("double") / col("n_b")).as("containment_b"))
          .filter(col("containment_a") >= 0.9 || col("containment_b") >= 0.9)
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT doc_a, doc_b, n_inter, n_a, n_b,
          |       n_inter::double / n_a AS containment_a,
          |       n_inter::double / n_b AS containment_b
          |FROM verified
          |WHERE n_inter::double / n_a >= 0.9 OR n_inter::double / n_b >= 0.9""".stripMargin)),

    // Corpus n-gram diversity per source: distinct shingles / total per-doc
    // distinct shingle instances — the self-repetition (self-BLEU-ish)
    // dataset-card metric that flags template-heavy sources. One explode +
    // grouped distinct-count.
    ("text_ngram_diversity",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        docs.select(col("source"),
            explode(TextOps.shingles(col("text"), 3)).as("shingle"))
          .groupBy(col("source"))
          .agg(countDistinct(col("shingle")).as("n_distinct"),
            count(lit(1)).as("n_total"))
          .withColumn("diversity",
            col("n_distinct").cast("double") / col("n_total"))
      },
      Some(shingleCte +
        """SELECT d.source,
          |       count(DISTINCT s.shingle)::bigint AS n_distinct,
          |       count(*)::bigint AS n_total,
          |       count(DISTINCT s.shingle)::double / count(*) AS diversity
          |FROM shingle_rows s JOIN documents d USING (doc_id)
          |GROUP BY 1""".stripMargin)),

    // ---- End-to-end near-dup pipeline: the thing a user actually runs -----
    // LSH candidates → exact n-gram-Jaccard verification → keep/drop verdict.
    // Everything upstream (signatures, banding, candidate bounding) feeds
    // this; the oracle recomputes the full chain in DuckDB.
    ("dedup_near_end2end",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .withColumn("is_dup", (col("jaccard") >= 0.8).cast("int"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT doc_a, doc_b, n_inter, n_a, n_b, jaccard,
          |       (CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END)::int AS is_dup
          |FROM verified""".stripMargin)),

    // Ensemble near-dup verdict: LSH candidates scored by BOTH exact n-gram
    // Jaccard and SimHash Hamming distance, flagged when either signal
    // fires — the multi-signal fusion a production dedup pass runs so one
    // estimator's blind spot (shingle-set vs token-frequency views) cannot
    // silently pass a duplicate. Costs one extra broadcast-joinable
    // fingerprint table over the verified chain.
    ("dedup_ensemble",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val ver = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
        val f = Dedup.simhash(docs, col("text"), col("doc_id"))
        ver
          .join(f.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), "doc_a")
          .join(f.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("jaccard"),
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
          .withColumn("is_dup",
            (col("jaccard") >= 0.8 || col("hamming") <= 6).cast("int"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, enstok AS (
          |  SELECT DISTINCT doc_id, t AS token
          |  FROM (SELECT doc_id,
          |               unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
          |        FROM documents)),
          |ensh AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::bigint AS h FROM enstok),
          |ensbits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          |  FROM ensh CROSS JOIN (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2),
          |enshash AS (
          |  SELECT doc_id,
          |         cast(sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END) AS bigint) AS simhash
          |  FROM ensbits GROUP BY 1)
          |SELECT v.doc_a, v.doc_b, v.jaccard,
          |       bit_count(xor(a.simhash, b.simhash))::int AS hamming,
          |       (CASE WHEN v.jaccard >= 0.8
          |                  OR bit_count(xor(a.simhash, b.simhash)) <= 6
          |             THEN 1 ELSE 0 END)::int AS is_dup
          |FROM verified v
          |JOIN enshash a ON a.doc_id = v.doc_a
          |JOIN enshash b ON b.doc_id = v.doc_b""".stripMargin)),

    // Transitive canonicalization: connected components over the verified
    // near-dup graph — (A,B), (B,C) collapse into one group even though
    // (A,C) was never compared. Oracle = a recursive CTE computing min
    // reachable id, a genuinely independent evaluation strategy.
    ("dedup_components",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val dupPairs = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        Dedup.connectedComponents(docs.select(col("doc_id").as("id")), dupPairs)
          .select(col("id").as("doc_id"), col("component"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT id AS doc_id, min(lbl) AS component
          |FROM (
          |  WITH RECURSIVE r(id, lbl) AS (
          |    SELECT doc_id, doc_id FROM documents
          |    UNION
          |    SELECT e.src, r.lbl
          |    FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |          UNION ALL
          |          SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |    JOIN r ON r.id = e.dst)
          |  SELECT id, lbl FROM r)
          |GROUP BY 1""".stripMargin)),

    // SOFT dedup: downweight near-duplicate cluster members instead of
    // dropping them — weight_scaled = floor(2^20 / cluster_size), so a
    // cluster contributes ~one document's worth of sampling mass in total
    // (the repetition-aware alternative to hard dedup when duplicates
    // carry signal, e.g. quotation frequency). Unique docs keep the full
    // 2^20. Integer floor-div — exact cross-engine. One aggregation on the
    // component key + a join back; the cluster table is |components| rows.
    ("dedup_soft_weights",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val dupPairs = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        val comp = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), dupPairs)
          .select(col("id").as("doc_id"), col("component"))
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        comp.join(sizes, "component")
          .select(col("doc_id"), col("component"), col("cluster_size"),
            expr("1048576L div cluster_size").as("weight_scaled"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, comp AS (
          |  SELECT id AS doc_id, min(lbl) AS component
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT doc_id, doc_id FROM documents
          |      UNION
          |      SELECT e.src, r.lbl
          |      FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |            UNION ALL
          |            SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |      JOIN r ON r.id = e.dst)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1),
          |cs AS (SELECT component, count(*)::bigint AS cluster_size
          |       FROM comp GROUP BY 1)
          |SELECT comp.doc_id, comp.component, cs.cluster_size,
          |       (1048576 // cs.cluster_size)::bigint AS weight_scaled
          |FROM comp JOIN cs USING (component)""".stripMargin)),

    // Soft dedup × token budget: the admission pass counts each document's
    // tokens DOWNWEIGHTED by its cluster (weighted = n_tokens·w >> 20,
    // integer floor), so a near-dup cluster burns ~one document's tokens of
    // a source's budget no matter how many copies the crawl has — the
    // budget discipline soft dedup exists to feed. Same hash-ordered
    // running-sum shape as corpus_token_budget, cum over weighted tokens.
    ("dedup_soft_budget",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val dupPairs = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        val comp = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), dupPairs)
          .select(col("id").as("doc_id"), col("component"))
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        val weighted = docs
          .withColumn("n_tokens",
            size(TextOps.tokens(TextOps.normalize(col("text")))).cast("long"))
          .join(comp, "doc_id").join(sizes, "component")
          .withColumn("weighted_tokens",
            expr("(n_tokens * (1048576L div cluster_size)) div 1048576"))
        Sampling.tokenBudgetPerGroup(weighted, Seq(col("source")),
            col("doc_id"), col("weighted_tokens"), budget = 800L)
          .select(col("doc_id"), col("source"), col("cluster_size"),
            col("n_tokens"), col("weighted_tokens"), col("cum_tokens"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, comp AS (
          |  SELECT id AS doc_id, min(lbl) AS component
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT doc_id, doc_id FROM documents
          |      UNION
          |      SELECT e.src, r.lbl
          |      FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |            UNION ALL
          |            SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |      JOIN r ON r.id = e.dst)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1),
          |cs AS (SELECT component, count(*)::bigint AS cluster_size
          |       FROM comp GROUP BY 1),
          |wt AS (
          |  SELECT d.doc_id, d.source, cs.cluster_size,
          |         len(string_split(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'),
          |                          ' '))::bigint AS n_tokens,
          |         (len(string_split(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'),
          |                           ' '))::bigint
          |            * (1048576 // cs.cluster_size)) // 1048576 AS weighted_tokens
          |  FROM documents d
          |  JOIN comp ON comp.doc_id = d.doc_id
          |  JOIN cs USING (component))
          |SELECT doc_id, source, cluster_size, n_tokens,
          |       weighted_tokens::bigint AS weighted_tokens, cum_tokens
          |FROM (
          |  SELECT *, sum(weighted_tokens) OVER (PARTITION BY source
          |            ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint, doc_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_tokens
          |  FROM wt)
          |WHERE cum_tokens <= 800""".stripMargin)),

    // Canonical-document selection: within each transitive duplicate
    // cluster, keep the highest-quality document (quality-score argmax,
    // doc_id tie-break) instead of the smallest id — what a corpus builder
    // actually wants from dedup. Composition of connectedComponents ×
    // textStats; one window over the component key.
    ("dedup_canonical_pick",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val dupPairs = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        val comp = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), dupPairs)
          .select(col("id").as("doc_id"), col("component"))
        val qual = TextOps.textStats(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("quality_score"))
        val w = Window.partitionBy(col("component"))
          .orderBy(col("quality_score").desc, col("doc_id"))
        comp.join(qual, "doc_id")
          .withColumn("is_canonical", (row_number().over(w) === 1).cast("int"))
          .select(col("component"), col("doc_id"), col("quality_score"),
            col("is_canonical"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, comp AS (
          |  SELECT id AS doc_id, min(lbl) AS component
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT doc_id, doc_id FROM documents
          |      UNION
          |      SELECT e.src, r.lbl
          |      FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |            UNION ALL
          |            SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |      JOIN r ON r.id = e.dst)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1),
          |qn AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
          |       FROM documents),
          |qtok AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM qn),
          |qual AS (
          |  SELECT doc_id,
          |         cast(len(list_distinct(toks)) AS double) / len(toks) * 0.6
          |           + least(len(toks) / 100.0, 1.0) * 0.3
          |           + (1.0 - cast(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS double)
          |                      / len(toks)) * 0.1 AS quality_score
          |  FROM qtok)
          |SELECT component, doc_id, quality_score,
          |       (CASE WHEN row_number() OVER (PARTITION BY component
          |                                     ORDER BY quality_score DESC, doc_id) = 1
          |             THEN 1 ELSE 0 END)::int AS is_canonical
          |FROM comp JOIN qual USING (doc_id)""".stripMargin)),

    // The dedup *output*: documents surviving near-dedup (drop any doc that
    // is a verified near-duplicate of a smaller-id doc).
    ("dedup_near_keep",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val drops = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8)
          .select(col("doc_b").as("doc_id"))
        docs.join(drops, Seq("doc_id"), "left_anti").select(col("doc_id"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT d.doc_id FROM documents d
          |WHERE NOT EXISTS (SELECT 1 FROM verified v
          |                  WHERE v.doc_b = d.doc_id AND v.jaccard >= 0.8)""".stripMargin)),

    // ---- Incremental near-dedup: the operational corpus-growth shape ------
    // The lowest 4/5 of doc ids play the already-indexed corpus (deduped
    // from scratch, signatures persisted); the top 1/5 is the new batch,
    // admitted via Dedup.incrementalNearDup — zero-shuffle signing, candidates
    // only against bucket collisions, old-old pairs never recomputed. The
    // oracle is the FROM-SCRATCH near-keep SQL over the whole table: the
    // incremental path must be indistinguishable from re-running everything.
    ("dedup_incremental",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        // The batch boundary is one tiny eager action (a scalar max), used as
        // a literal below — attaching it via crossJoin(broadcast(...)) would
        // plan a BroadcastNestedLoopJoin and, worse, re-run the agg inside
        // every one of the dozen-plus plan branches that reference the split.
        // NOTE this makes the catalog entry eager at construction time (the
        // head() plus the localCheckpoints below run Spark jobs before the
        // frame is returned) — plan-only consumers pay that materialization.
        // max() is null on an empty table: read boxed and short-circuit to
        // the (empty) id projection instead of NPE-ing on getLong.
        val cutBoxed = docs.agg(floor(max(col("doc_id")) * 4 / 5).cast("long"))
          .head().getAs[java.lang.Long](0)
        if (cutBoxed == null) docs.select(col("doc_id"))
        else {
        val cut = cutBoxed.longValue()
        val oldDocs = docs.filter(col("doc_id") < cut)
        val newDocs = docs.filter(col("doc_id") >= cut)
        // the historical state: old corpus deduped from scratch, all old
        // signatures (survivors AND dropped) in the index. Materialized ONCE
        // (the operational shape is a persisted bucketed table): the old-side
        // candidate pass and incrementalNearDup's index reads would
        // otherwise each recompute the whole minhash chain.
        val index = Dedup.signatureIndex(oldDocs, col("text"), col("doc_id"))
          .localCheckpoint()
        // one corpus shingling, shared by the old-side verify and the
        // admission verify (operationally: a persisted column, not a rerun)
        val shingles = Dedup.shingleSets(docs, col("text"), col("doc_id"))
          .localCheckpoint()
        val oldCands = Dedup.lshCandidates(index)
        val oldDrops = Dedup.ngramJaccardOnShingles(oldCands, shingles)
          .filter(col("jaccard") >= 0.8).select(col("doc_b").as("doc_id"))
        val oldKeep = oldDocs.join(oldDrops, Seq("doc_id"), "left_anti")
          .select(col("doc_id"))
        val newKeep = Dedup.incrementalNearDup(
          newDocs, docs, index, col("text"), col("doc_id"),
          corpusShingles = Some(shingles))
        oldKeep.unionByName(newKeep)
        }
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT d.doc_id FROM documents d
          |WHERE NOT EXISTS (SELECT 1 FROM verified v
          |                  WHERE v.doc_b = d.doc_id AND v.jaccard >= 0.8)""".stripMargin)),

    // Incremental COMPONENTS admission — the label-side twin of
    // dedup_incremental and the production answer to the catalog's
    // honest-recompute convention: the lowest 4/5 of ids play the indexed
    // corpus with a PERSISTED (id, component) artifact; the top 1/5 is the
    // batch, admitted via Dedup.admitComponents — star rounds over the
    // CONTRACTED batch-sized graph only, corpus work = one broadcast remap
    // join against the artifact. The oracle is the from-scratch recursive-CTE
    // components over the whole table: incremental labels must be
    // indistinguishable from re-running everything.
    ("dedup_components_incremental",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        // same eager scalar-cut convention as dedup_incremental (see note
        // there); null max ⇒ empty table ⇒ empty singleton-label projection
        val cutBoxed = docs.agg(floor(max(col("doc_id")) * 4 / 5).cast("long"))
          .head().getAs[java.lang.Long](0)
        if (cutBoxed == null)
          docs.select(col("doc_id"), col("doc_id").as("component"))
        else {
        val cut = cutBoxed.longValue()
        val oldDocs = docs.filter(col("doc_id") < cut)
        val newDocs = docs.filter(col("doc_id") >= cut)
        val index = Dedup.signatureIndex(oldDocs, col("text"), col("doc_id"))
          .localCheckpoint()
        val shingles = Dedup.shingleSets(docs, col("text"), col("doc_id"))
          .localCheckpoint()
        val oldEdges = Dedup.ngramJaccardOnShingles(
            Dedup.lshCandidates(index), shingles)
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        // the persisted artifact: labels over EVERY indexed doc (survivors
        // and dropped — dropped docs stay as attractors, same as the index)
        val labels = Dedup.connectedComponents(
            oldDocs.select(col("doc_id").as("id")), oldEdges)
          .localCheckpoint()
        val entries = Dedup.signatureEntries(newDocs, col("text"), col("doc_id"))
          .localCheckpoint()
        val newEdges = Dedup.ngramJaccardOnShingles(
            Dedup.incrementalCandidates(index, entries), shingles)
          .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
        Dedup.admitComponents(labels,
            newDocs.select(col("doc_id").as("id")), newEdges)
          .select(col("id").as("doc_id"), col("component"))
        }
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT id AS doc_id, min(lbl) AS component
          |FROM (
          |  WITH RECURSIVE r(id, lbl) AS (
          |    SELECT doc_id, doc_id FROM documents
          |    UNION
          |    SELECT e.src, r.lbl
          |    FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |          UNION ALL
          |          SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |    JOIN r ON r.id = e.dst)
          |  SELECT id, lbl FROM r)
          |GROUP BY 1""".stripMargin)),

    // WARM twin of dedup_incremental: the signature index and the old-side
    // keep list are fixture-persisted artifacts (Artifacts.dedupIndex —
    // built once per sf-dir/JVM); the returned frame only signs the new
    // batch, bucket-joins the LOADED index, verifies, and unions the loaded
    // keep list — the 80%+ in-query old-index rebuild the verdict measured
    // in the incremental rows never happens here. Same from-scratch oracle:
    // warm admission must be indistinguishable from re-running everything.
    ("dedup_incremental_served",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val (cut, indexPath, _, oldKeepPath) = Artifacts.dedupIndex(s, d)
        if (cut < 0L) docs.select(col("doc_id"))
        else {
          val newDocs = docs.filter(col("doc_id") >= cut)
          val index = s.read.parquet(indexPath)
          val newKeep = Dedup.incrementalNearDup(
            newDocs, docs, index, col("text"), col("doc_id"))
          s.read.parquet(oldKeepPath).unionByName(newKeep)
        }
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT d.doc_id FROM documents d
          |WHERE NOT EXISTS (SELECT 1 FROM verified v
          |                  WHERE v.doc_b = d.doc_id AND v.jaccard >= 0.8)""".stripMargin)),

    // WARM twin of dedup_components_incremental: the component-label
    // artifact AND the signature index load from fixture parquet; in-query
    // work is batch signing, candidate generation against the loaded index,
    // exact verify, and admitComponents' contracted solve + one broadcast
    // remap — the warm 0.27-0.62×-of-cold shape DebugWarm measured, now an
    // oracle-gated catalog row against the same from-scratch recursive CTE.
    ("dedup_components_served",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val (cut, indexPath, labelsPath, _) = Artifacts.dedupIndex(s, d)
        if (cut < 0L)
          docs.select(col("doc_id"), col("doc_id").as("component"))
        else {
          val newDocs = docs.filter(col("doc_id") >= cut)
          val index = s.read.parquet(indexPath)
          val labels = s.read.parquet(labelsPath)
          val entries = Dedup.signatureEntries(newDocs, col("text"), col("doc_id"))
            .localCheckpoint()
          val shingles = Dedup.shingleSets(docs, col("text"), col("doc_id"))
          val newEdges = Dedup.ngramJaccardOnShingles(
              Dedup.incrementalCandidates(index, entries), shingles)
            .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
          Dedup.admitComponents(labels,
              newDocs.select(col("doc_id").as("id")), newEdges)
            .select(col("id").as("doc_id"), col("component"))
        }
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """SELECT id AS doc_id, min(lbl) AS component
          |FROM (
          |  WITH RECURSIVE r(id, lbl) AS (
          |    SELECT doc_id, doc_id FROM documents
          |    UNION
          |    SELECT e.src, r.lbl
          |    FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |          UNION ALL
          |          SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |    JOIN r ON r.id = e.dst)
          |  SELECT id, lbl FROM r)
          |GROUP BY 1""".stripMargin)),

    ("dedup_simhash",
      (s: SparkSession, d: String) =>
        Dedup.simhash(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH tok AS (
          |  SELECT DISTINCT doc_id, t AS token
          |  FROM (SELECT doc_id,
          |               unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
          |        FROM documents)),
          |h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::bigint AS h FROM tok),
          |bits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2)
          |SELECT doc_id,
          |       cast(sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END) AS bigint) AS simhash
          |FROM bits GROUP BY 1""".stripMargin)),

    ("text_ngram_jaccard",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val ids = docs.select(col("doc_id"))
        val pairs = ids.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
          .join(ids.select(col("doc_id").as("doc_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"))
        Dedup.ngramJaccard(pairs, docs, col("text"), col("doc_id"))
      },
      Some(shingleCte +
        """, ssets AS (SELECT doc_id, count(*) AS n FROM shingle_rows GROUP BY 1),
          |pairs AS (
          |  SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
          |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
          |inter AS (
          |  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
          |  FROM pairs p
          |  JOIN shingle_rows a ON a.doc_id = p.doc_a
          |  JOIN shingle_rows b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
          |  GROUP BY 1, 2)
          |SELECT p.doc_a, p.doc_b,
          |       coalesce(i.n_inter, 0) AS n_inter,
          |       cast(sa.n AS int) AS n_a, cast(sb.n AS int) AS n_b,
          |       cast(coalesce(i.n_inter, 0) AS double)
          |         / (sa.n + sb.n - coalesce(i.n_inter, 0)) AS jaccard
          |FROM pairs p
          |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
          |JOIN ssets sa ON sa.doc_id = p.doc_a
          |JOIN ssets sb ON sb.doc_id = p.doc_b""".stripMargin)),

    ("text_stats",
      (s: SparkSession, d: String) =>
        TextOps.textStats(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
          |  FROM documents),
          |tok AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM t)
          |SELECT doc_id,
          |       length(norm)::int AS n_chars,
          |       len(toks)::int AS n_tokens,
          |       len(list_distinct(toks))::int AS n_distinct_tokens,
          |       len(list_filter(toks, x -> x IN ('the','a','of','and','is')))::int AS n_stopwords,
          |       len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::int AS n_subtokens,
          |       cast(length(norm) - (len(toks) - 1) AS double) / len(toks) AS avg_token_len,
          |       cast(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS double)
          |         / len(toks) AS stopword_ratio,
          |       cast(len(list_distinct(toks)) AS double) / len(toks) AS type_token_ratio,
          |       cast(len(list_distinct(toks)) AS double) / len(toks) * 0.6
          |         + least(len(toks) / 100.0, 1.0) * 0.3
          |         + (1.0 - cast(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS double)
          |                    / len(toks)) * 0.1 AS quality_score
          |FROM tok""".stripMargin)),

    // BM25 keyword retrieval over the corpus: top-20 docs for a fixed query
    // bag. Raw-ratio IDF (no ln) keeps every arithmetic step IEEE-identical
    // cross-engine — see TextOps.bm25's deviation note. The oracle spells
    // every expression with the same association order so doubles match
    // exactly.
    ("text_bm25_search",
      (s: SparkSession, d: String) =>
        TextOps.bm25(Tables.documents(s, d), col("text"), col("doc_id"),
            Seq("join", "filter", "scan"))
          .orderBy(col("score").desc, col("doc_id")).limit(20),
      Some(
        """WITH lens AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |dl AS (SELECT doc_id, len(toks)::bigint AS dl, toks FROM lens),
          |stats AS (SELECT count(*)::bigint AS n_docs, sum(len(toks))::bigint AS sum_dl
          |          FROM lens),
          |tf AS (SELECT doc_id, dl, token, count(*)::bigint AS tf
          |       FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dl)
          |       WHERE token IN ('join', 'filter', 'scan')
          |       GROUP BY 1, 2, 3),
          |df AS (SELECT token, count(*)::bigint AS df FROM tf GROUP BY 1),
          |scored AS (
          |  -- every inexact step is explicitly double-typed: DuckDB would
          |  -- otherwise run bigint+0.5 in DECIMAL arithmetic and diverge
          |  -- from Spark's double plan
          |  SELECT tf.doc_id, tf.token,
          |         ((cast(s.n_docs - df.df AS double) + 0.5)
          |            / (cast(df.df AS double) + 0.5))
          |           * (cast(tf.tf AS double) * (1.2 + 1.0))
          |           / (cast(tf.tf AS double) + 1.2 * ((1.0 - 0.75)
          |                + 0.75 * (cast(tf.dl AS double)
          |                            / (cast(s.sum_dl AS double)
          |                                 / cast(s.n_docs AS double))))) AS term_score
          |  FROM tf CROSS JOIN stats s JOIN df ON tf.token = df.token)
          |SELECT doc_id,
          |       coalesce(max(CASE WHEN token = 'join' THEN term_score END), 0.0)
          |         + coalesce(max(CASE WHEN token = 'filter' THEN term_score END), 0.0)
          |         + coalesce(max(CASE WHEN token = 'scan' THEN term_score END), 0.0) AS score
          |FROM scored GROUP BY 1
          |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    ("text_langid",
      (s: SparkSession, d: String) =>
        TextOps.langId(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |scored AS (
          |  SELECT doc_id,
          |         len(list_filter(toks, x -> x IN ('the','a')))::int AS score_en,
          |         len(list_filter(toks, x -> x IN ('data','table')))::int AS score_es,
          |         len(list_filter(toks, x -> x IN ('window','group')))::int AS score_de,
          |         len(list_filter(toks, x -> x IN ('join','merge')))::int AS score_fr,
          |         len(list_filter(toks, x -> x IN ('vector','batch')))::int AS score_zh
          |  FROM tok)
          |SELECT *,
          |       CASE
          |         WHEN greatest(score_en, score_es, score_de, score_fr, score_zh) = 0 THEN 'und'
          |         WHEN score_en = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'en'
          |         WHEN score_es = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'es'
          |         WHEN score_de = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'de'
          |         WHEN score_fr = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'fr'
          |         ELSE 'zh'
          |       END AS lang_pred
          |FROM scored""".stripMargin)),

    // Classifier-eval confusion matrix: predicted language (marker argmax)
    // vs the labeled lang column — the model-evaluation aggregate every
    // filter/classifier in the pipeline needs. One exchange on the
    // (actual, predicted) pair.
    ("text_langid_confusion",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        TextOps.langId(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("lang_pred"))
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("lang") === col("lang_pred"), 1L).otherwise(0L)).as("n_correct"))
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, lang,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |scored AS (
          |  SELECT doc_id, lang,
          |         len(list_filter(toks, x -> x IN ('the','a')))::int AS score_en,
          |         len(list_filter(toks, x -> x IN ('data','table')))::int AS score_es,
          |         len(list_filter(toks, x -> x IN ('window','group')))::int AS score_de,
          |         len(list_filter(toks, x -> x IN ('join','merge')))::int AS score_fr,
          |         len(list_filter(toks, x -> x IN ('vector','batch')))::int AS score_zh
          |  FROM tok),
          |pred AS (
          |  SELECT lang,
          |         CASE
          |           WHEN greatest(score_en, score_es, score_de, score_fr, score_zh) = 0 THEN 'und'
          |           WHEN score_en = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'en'
          |           WHEN score_es = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'es'
          |           WHEN score_de = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'de'
          |           WHEN score_fr = greatest(score_en, score_es, score_de, score_fr, score_zh) THEN 'fr'
          |           ELSE 'zh'
          |         END AS lang_pred
          |  FROM scored)
          |SELECT lang, lang_pred, count(*) AS n,
          |       sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)::bigint AS n_correct
          |FROM pred GROUP BY 1, 2""".stripMargin)),

    // Cohort retention: users bucketed by first-activity week, distinct
    // active users per (cohort, weeks-since-first) — the product-analytics
    // staple (two aggregations + one join; day arithmetic pinned to date
    // casts so both engines count identical boundaries).
    ("events_cohort_retention",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
        val first = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        ev.join(first, "user_id")
          .select(
            ntz(date_trunc("week", col("first_ts"))).as("cohort_week"),
            expr("datediff(cast(ts AS date), cast(first_ts AS date)) div 7")
              .cast("int").as("week_offset"),
            col("user_id"))
          .distinct()
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some(
        """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
          |a AS (
          |  SELECT DISTINCT date_trunc('week', f.first_ts) AS cohort_week,
          |         (date_diff('day', f.first_ts::date, e.ts::date) // 7)::int AS week_offset,
          |         e.user_id
          |  FROM events e JOIN f USING (user_id))
          |SELECT cohort_week, week_offset, count(*) AS n_users
          |FROM a GROUP BY 1, 2""".stripMargin)),

    // ---- Training-set assembly: split / stratified sample / redaction -----
    // Hash-split: reproducible, engine-independent, stable under data growth
    // (a doc's split never changes when the corpus grows) — rand() has none
    // of those properties. Pure projection, zero shuffle.
    ("split_train_val_test",
      (s: SparkSession, d: String) =>
        Sampling.hashSplit(Tables.documents(s, d), col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10))
          .select(col("doc_id"), col("split")),
      Some(
        """SELECT doc_id,
          |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          |FROM (SELECT doc_id,
          |             ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % 100 AS b
          |      FROM documents)""".stripMargin)),

    // Leakage-safe split: the split key is the NEAR-DUP COMPONENT, so a test
    // document's near-copy can never land in train (the contamination mode a
    // per-doc hash split cannot prevent). Chains the standard LSH → verify →
    // components oracle CTEs into the hash-split CASE.
    ("split_leakage_safe",
      (s: SparkSession, d: String) =>
        Sampling.leakageSafeSplit(Tables.documents(s, d), col("doc_id"),
          col("text"), Seq("train" -> 80, "val" -> 10, "test" -> 10)),
      Some(lshCandCtes + nearDupVerifyCtes +
        """, comp AS (
          |  SELECT id AS doc_id, min(lbl) AS component
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT doc_id, doc_id FROM documents
          |      UNION
          |      SELECT e.src, r.lbl
          |      FROM (SELECT doc_a AS src, doc_b AS dst FROM verified WHERE jaccard >= 0.8
          |            UNION ALL
          |            SELECT doc_b AS src, doc_a AS dst FROM verified WHERE jaccard >= 0.8) e
          |      JOIN r ON r.id = e.dst)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1)
          |SELECT doc_id, component,
          |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          |FROM (SELECT doc_id, component,
          |             ('0x' || substr(md5(component::varchar), 1, 15))::bigint % 100 AS b
          |      FROM comp)""".stripMargin)),

    // Weighted sample without replacement (priority sampling, Duffield-Lund-
    // Thorup): 200 docs drawn with probability increasing in token count —
    // the "prefer long/high-quality documents" primitive. Priority = u/w from
    // a portable-hash uniform; one IEEE division keeps it bit-identical
    // cross-engine (an exponential clock's ln() would not be). Plans as
    // TakeOrderedAndProject: O(k) per partition, no global sort exchange.
    ("sample_weighted_priority",
      (s: SparkSession, d: String) => {
        val weighted = Tables.documents(s, d).select(
          col("doc_id"),
          size(TextOps.tokens(TextOps.normalize(col("text")))).as("n_tokens"))
        Sampling.prioritySample(weighted, col("doc_id"), col("n_tokens"), 200)
      },
      Some(
        """SELECT doc_id, n_tokens,
          |       cast(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint
          |              % 1125899906842624 + 1 AS double)
          |         / cast(n_tokens AS double) AS priority
          |FROM (SELECT doc_id,
          |             len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::int AS n_tokens
          |      FROM documents)
          |ORDER BY priority, doc_id LIMIT 200""".stripMargin)),

    // Weighted sampling PER GROUP: per language, 30 documents drawn with
    // probability increasing in length — balanced AND weighted corpus
    // construction in one pass (group-keyed exchange + per-group top-k).
    ("sample_weighted_per_group",
      (s: SparkSession, d: String) =>
        Sampling.priorityPerGroup(
            Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
            Seq(col("lang")), col("doc_id"), col("n_chars"), 30)
          .select(col("lang"), col("doc_id"), col("n_chars")),
      Some(
        """SELECT lang, doc_id, n_chars FROM (
          |  SELECT lang, doc_id, n_chars,
          |         row_number() OVER (
          |           PARTITION BY lang
          |           ORDER BY cast(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint
          |                           % 1125899906842624 + 1 AS double)
          |                      / cast(n_chars AS double),
          |                    doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= 30""".stripMargin)),

    // Stratified quota: at most 100 events per type, drawn in deterministic
    // hash order — the "cap boilerplate domains / balance classes" primitive.
    ("sample_stratified",
      (s: SparkSession, d: String) =>
        Sampling.quotaPerGroup(Tables.events(s, d),
            Seq(col("event_type")), col("event_id"), 100)
          .select(col("event_type"), col("event_id"), col("user_id")),
      Some(
        """SELECT event_type, event_id, user_id FROM (
          |  SELECT event_type, event_id, user_id,
          |         row_number() OVER (
          |           PARTITION BY event_type
          |           ORDER BY ('0x' || substr(md5(event_id::varchar), 1, 15))::bigint,
          |                    event_id) AS rn
          |  FROM events)
          |WHERE rn <= 100""".stripMargin)),

    // Dataset-card profile: one row per source with the integer-exact
    // aggregates a corpus release note reports — docs, total tokens,
    // distinct languages, quality-pass count, distinct text fingerprints
    // (the exact-dup diagnostic). One grouped aggregation over the quality
    // metrics frame (distinct counts plan as the two-phase expand).
    ("corpus_profile",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        TextOps.qualityFilter(docs, col("text"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("quality_keep").cast("long")).as("n_quality"),
            countDistinct(md5(col("text"))).as("n_unique_texts"))
      },
      Some(qualityMetricsCtes("documents") +
        """SELECT d.source,
          |       count(*)::bigint AS n_docs,
          |       sum(m.n_tokens)::bigint AS total_tokens,
          |       count(DISTINCT d.lang)::bigint AS n_langs,
          |       sum(CASE WHEN m.n_tokens BETWEEN 20 AND 80
          |                 AND m.avg_token_len BETWEEN 3.0 AND 8.0
          |                 AND m.symbol_ratio <= 0.1 AND m.digit_token_ratio <= 0.2
          |                 AND m.n_stopwords >= 1 THEN 1 ELSE 0 END)::bigint AS n_quality,
          |       count(DISTINCT md5(d.text))::bigint AS n_unique_texts
          |FROM documents d JOIN qmetrics m USING (doc_id)
          |GROUP BY 1""".stripMargin)),

    // Snapshot diff: crawl A (doc_id % 10 <> 0) vs crawl B (doc_id % 7 <> 3,
    // with every %5==0 doc's text revised) classified added / removed /
    // changed / unchanged by md5 fingerprint — the incremental-reprocessing
    // audit ("re-embed only changed docs"). One full-outer equi-join;
    // payloads never cross the wire, only fingerprints.
    ("corpus_snapshot_diff",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val a = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val b = docs.filter(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("fp"))
        Layout.snapshotDiff(a, b, "doc_id")
      },
      Some(
        """WITH a AS (
          |  SELECT doc_id, md5(text) AS fp_a FROM documents WHERE doc_id % 10 <> 0),
          |b AS (
          |  SELECT doc_id,
          |         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS fp_b
          |  FROM documents WHERE doc_id % 7 <> 3)
          |SELECT doc_id AS id, fp_a, fp_b,
          |       CASE WHEN fp_a IS NULL THEN 'added'
          |            WHEN fp_b IS NULL THEN 'removed'
          |            WHEN fp_a = fp_b THEN 'unchanged'
          |            ELSE 'changed' END AS status
          |FROM a FULL OUTER JOIN b USING (doc_id)""".stripMargin)),

    // Gate-agreement matrix: the 2×2×2 contingency of the three independent
    // keep verdicts — text-quality gate, hash-classifier gate, and
    // embedding kNN-density gate — over the SAME corpus (doc_id ≡ vec_id in
    // the fixtures). The diagnostic that shows whether filters are
    // redundant or complementary before a pipeline multiplies them; three
    // per-doc projections joined on the id, one 8-cell aggregation.
    ("corpus_gate_matrix",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val q = TextOps.qualityFilter(docs, col("text"))
          .select(col("doc_id"), col("quality_keep"))
        val c = TextOps.classifierScore(docs, col("text"), col("doc_id"),
            weights = clfWeights, bias = -40L, threshold = 0L)
          .select(col("doc_id"), col("clf_keep"))
        val dd = Similarity.knnDensityGate(Tables.embeddings(s, d), "vec_id",
            "embedding", k = 5, tau = 0.31, nBands = 4, rowsPerBand = 2,
            dim = 64)
          .select(col("src_id").as("doc_id"), col("dense_keep"))
        q.join(c, "doc_id").join(dd, "doc_id")
          .groupBy(col("quality_keep"), col("clf_keep"), col("dense_keep"))
          .agg(count(lit(1)).as("n"))
      },
      Some(knnGraphCte + ", " +
        clfLabelCtes.trim.stripPrefix("WITH") +
        """, dd AS (SELECT src_id,
          |            sum(floor(cosine * 1073741824)::bigint)::bigint AS density_q,
          |            count(*) AS knn_n
          |       FROM g GROUP BY 1),
          |gate AS (
          |  SELECT m.doc_id,
          |         (CASE WHEN m.n_tokens BETWEEN 20 AND 80
          |                AND m.avg_token_len BETWEEN 3.0 AND 8.0
          |                AND m.symbol_ratio <= 0.1 AND m.digit_token_ratio <= 0.2
          |                AND m.n_stopwords >= 1 THEN 1 ELSE 0 END)::int AS quality_keep,
          |         (CASE WHEN cm.margin >= 0 THEN 1 ELSE 0 END)::int AS clf_keep,
          |         (CASE WHEN coalesce(k.knn_n, 0) > 0
          |                AND coalesce(k.density_q, 0) >= 332859965 * coalesce(k.knn_n, 0)
          |               THEN 1 ELSE 0 END)::int AS dense_keep
          |  FROM qmetrics m
          |  JOIN cm USING (doc_id)
          |  LEFT JOIN dd k ON k.src_id = m.doc_id)
          |SELECT quality_keep, clf_keep, dense_keep, count(*)::bigint AS n
          |FROM gate GROUP BY 1, 2, 3""".stripMargin)),

    // Per-source corpus balancing: resample documents to target source
    // proportions — src0-src3 weighted 3, the rest 1, budget 280 → quotas
    // floor(280·3/28)=30 / floor(280·1/28)=10, drawn in portable-hash
    // order. The domain-mix step of a web-corpus recipe; same one-exchange
    // rank-window shape as sample_stratified.
    ("corpus_source_mix",
      (s: SparkSession, d: String) => {
        val mix = (0 to 3).map(i => s"src$i" -> 3L) ++
          (4 to 19).map(i => s"src$i" -> 1L)
        Sampling.sourceMix(Tables.documents(s, d), col("source"),
            col("doc_id"), mix, budget = 280L)
          .select(col("doc_id"), col("source"), col("n_chars"))
      },
      Some(
        """SELECT doc_id, source, n_chars FROM (
          |  SELECT doc_id, source, n_chars,
          |         row_number() OVER (
          |           PARTITION BY source
          |           ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint,
          |                    doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= (CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
          |                  THEN 30 ELSE 10 END)""".stripMargin)),

    // Token-budgeted sampling: per source, admit documents in deterministic
    // hash order while the running TOKEN sum fits the budget — training
    // mixes are specified in tokens, not documents, so this is the cap that
    // actually binds when assembling a corpus ("500M tokens per domain").
    // Deterministic training-order shuffle: salted-hash shard + independent
    // salted-hash in-shard position = a reproducible global permutation,
    // stable per-row under corpus growth — the step that feeds the trainer.
    ("corpus_shuffle_shards",
      (s: SparkSession, d: String) =>
        Layout.shuffleShards(Tables.documents(s, d), col("doc_id"), nShards = 8)
          .select(col("doc_id"), col("shard"), col("shard_pos")),
      Some(
        """SELECT doc_id, shard, shard_pos FROM (
          |  SELECT doc_id, shard,
          |         row_number() OVER (PARTITION BY shard
          |           ORDER BY ('0x' || substr(md5('pos:' || doc_id::varchar), 1, 15))::bigint,
          |                    doc_id) AS shard_pos
          |  FROM (SELECT doc_id,
          |               (('0x' || substr(md5('shard:' || doc_id::varchar), 1, 15))::bigint % 8)::int AS shard
          |        FROM documents))""".stripMargin)),

    // Last-mile composition: token-budget the corpus per source, then hand
    // the surviving docs to the trainer in deterministic shuffled order —
    // proof the selection and layout stages compose (the oracle re-runs
    // both in CTEs).
    ("corpus_export_order",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val kept = Sampling.tokenBudgetPerGroup(
          docs.withColumn("n_tokens",
            size(TextOps.tokens(TextOps.normalize(col("text")))).cast("long")),
          Seq(col("source")), col("doc_id"), col("n_tokens"), budget = 1500L)
        Layout.shuffleShards(kept, col("doc_id"), nShards = 4)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("shard"), col("shard_pos"))
      },
      Some(
        """WITH kept AS (
          |  SELECT doc_id, source, n_tokens FROM (
          |    SELECT doc_id, source, n_tokens,
          |           sum(n_tokens) OVER (
          |             PARTITION BY source
          |             ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint,
          |                      doc_id
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_tokens
          |    FROM (SELECT doc_id, source,
          |                 len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::bigint AS n_tokens
          |          FROM documents))
          |  WHERE cum_tokens <= 1500)
          |SELECT doc_id, source, n_tokens, shard, shard_pos FROM (
          |  SELECT doc_id, source, n_tokens, shard,
          |         row_number() OVER (PARTITION BY shard
          |           ORDER BY ('0x' || substr(md5('pos:' || doc_id::varchar), 1, 15))::bigint,
          |                    doc_id) AS shard_pos
          |  FROM (SELECT doc_id, source, n_tokens,
          |               (('0x' || substr(md5('shard:' || doc_id::varchar), 1, 15))::bigint % 4)::int AS shard
          |        FROM kept))""".stripMargin)),

    ("corpus_token_budget",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Sampling.tokenBudgetPerGroup(
            docs.withColumn("n_tokens",
              size(TextOps.tokens(TextOps.normalize(col("text")))).cast("long")),
            Seq(col("source")), col("doc_id"), col("n_tokens"), budget = 1500L)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      },
      Some(
        """SELECT doc_id, source, n_tokens, cum_tokens FROM (
          |  SELECT doc_id, source, n_tokens,
          |         sum(n_tokens) OVER (
          |           PARTITION BY source
          |           ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint,
          |                    doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_tokens
          |  FROM (SELECT doc_id, source,
          |               len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::bigint AS n_tokens
          |        FROM documents))
          |WHERE cum_tokens <= 1500""".stripMargin)),

    // Global token-budget source mixing: ONE total token budget split by
    // source weights (src0-src3 weighted 3, the rest 1 → quotas
    // floor(6000·3/28)=642 / floor(6000·1/28)=214 tokens), each source then
    // greedy-prefix-filled in portable-hash order — the form real training
    // mixes are specified in. Same one-exchange running-sum shape as
    // corpus_token_budget; the quota CASE folds to plan-time literals.
    ("corpus_token_mix",
      (s: SparkSession, d: String) => {
        val mix = (0 to 3).map(i => s"src$i" -> 3L) ++
          (4 to 19).map(i => s"src$i" -> 1L)
        Sampling.tokenMix(
            Tables.documents(s, d).withColumn("n_tokens",
              size(TextOps.tokens(TextOps.normalize(col("text")))).cast("long")),
            col("source"), col("doc_id"), col("n_tokens"),
            mix, totalBudget = 6000L)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("cum_tokens"), col("mix_token_quota"))
      },
      Some(
        """SELECT doc_id, source, n_tokens, cum_tokens, mix_token_quota FROM (
          |  SELECT doc_id, source, n_tokens,
          |         sum(n_tokens) OVER (
          |           PARTITION BY source
          |           ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint,
          |                    doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_tokens,
          |         (CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
          |               THEN 642 ELSE 214 END)::bigint AS mix_token_quota
          |  FROM (SELECT doc_id, source,
          |               len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::bigint AS n_tokens
          |        FROM documents))
          |WHERE cum_tokens <= mix_token_quota""".stripMargin)),

    // PII-ish redaction stats: emails and long digit runs masked; counts and
    // the redacted length verify the transform end-to-end.
    ("text_redact_stats",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          regexp_count(col("text"), lit(TextOps.emailPattern)).as("n_emails"),
          regexp_count(col("text"), lit(TextOps.longNumberPattern)).as("n_long_numbers"),
          length(TextOps.redactPii(col("text"))).as("redacted_len")),
      Some(
        s"""SELECT doc_id,
          |       len(regexp_extract_all(text, '${TextOps.emailPattern}'))::int AS n_emails,
          |       len(regexp_extract_all(text, '${TextOps.longNumberPattern}'))::int AS n_long_numbers,
          |       length(regexp_replace(
          |                regexp_replace(text, '${TextOps.emailPattern}', '<EMAIL>', 'g'),
          |                '${TextOps.longNumberPattern}', '<NUM>', 'g'))::int AS redacted_len
          |FROM documents""".stripMargin)),

    // Native bounded top-k aggregate: per-key top-3 via a size-k heap carried
    // through partial/final aggregation — O(keys·k) through the shuffle where
    // the window formulation sorts every key's full row set. Same rows as the
    // row_number() oracle.
    ("events_topk_native",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(graft.functions.GraftFunctions.topk_by(
            struct(col("value"), col("event_id")), 3).as("top"))
          .select(col("event_type"), posexplode(col("top")).as(Seq("r0", "t")))
          .select(col("event_type"), (col("r0") + 1).cast("int").as("rnk"),
            col("t.value").as("value"), col("t.event_id").as("event_id")),
      Some(
        """SELECT event_type, cast(rnk AS int) AS rnk, value, event_id
          |FROM (SELECT event_type, value, event_id,
          |             row_number() OVER (PARTITION BY event_type
          |                                ORDER BY value DESC, event_id DESC) AS rnk
          |      FROM events)
          |WHERE rnk <= 3""".stripMargin)),

    // Grouped bounded top-k at higher cardinality and k: per-user top-10 by
    // (value, event_id) through the same native heap aggregate — ~1.5k
    // groups × k=10 carried through partial/final aggregation, where the
    // row_number() oracle formulation shuffles and sorts every event row.
    // TopKShuffleSpec measures the shuffle-volume gap and its scaling.
    ("events_topk_per_user",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(graft.functions.GraftFunctions.topk_by(
            struct(col("value"), col("event_id")), 10).as("top"))
          .select(col("user_id"), posexplode(col("top")).as(Seq("r0", "t")))
          .select(col("user_id"), (col("r0") + 1).cast("int").as("rnk"),
            col("t.value").as("value"), col("t.event_id").as("event_id")),
      Some(
        """SELECT user_id, cast(rnk AS int) AS rnk, value, event_id
          |FROM (SELECT user_id, value, event_id,
          |             row_number() OVER (PARTITION BY user_id
          |                                ORDER BY value DESC, event_id DESC) AS rnk
          |      FROM events)
          |WHERE rnk <= 10""".stripMargin)),

    // Salted skew-join: the hot-key mitigation produces EXACTLY the plain
    // join's rows (the oracle is the unsalted join) while spreading each key
    // over saltFactor reducers.
    ("events_salted_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("type_label", upper(col("event_type")))
        Skew.saltedJoin(ev, dim, "event_type", col("event_id"), 8)
          .select(col("event_id"), col("event_type"), col("type_label"))
      },
      Some(
        """SELECT event_id, e.event_type, upper(e.event_type) AS type_label
          |FROM events e
          |JOIN (SELECT DISTINCT event_type FROM events) d
          |  ON e.event_type = d.event_type""".stripMargin)),

    // Two-stage salted aggregation: partial on (key, salt), final on key —
    // identical counts to the direct groupBy (the oracle), with hot-key
    // combiner state spread over the salt space.
    ("events_salted_counts",
      (s: SparkSession, d: String) =>
        Skew.saltedCount(Tables.events(s, d), col("event_type"), col("event_id"), 8)
          .select(col("key").as("event_type"), col("n")),
      Some(
        """SELECT event_type, count(*)::bigint AS n
          |FROM events GROUP BY 1""".stripMargin)),

    // Two-pass exact heavy hitters: a native Misra-Gries sketch proposes a
    // bounded candidate set (every key with freq > n/1025 guaranteed in it),
    // then an exact recount of just the candidates applies the 1-in-500
    // support threshold. The shuffle carries O(partitions·capacity) sketch
    // state + O(capacity) recount groups instead of O(distinct keys) — the
    // heavy-hitters shape for a billion-key column. The recount makes the
    // result exact and arrival-order-independent, so the oracle is the plain
    // full groupBy HAVING.
    ("events_frequent_users",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val cands = ev
          .agg(count(lit(1)).as("total"),
            graft.functions.GraftFunctions.mg_candidates(col("user_id"), 1024).as("cands"))
          .select(col("total"), explode(col("cands")).as("user_id"))
        ev.join(broadcast(cands), Seq("user_id"))
          .groupBy(col("user_id"), col("total"))
          .agg(count(lit(1)).as("freq"))
          .filter(col("freq") * 500 >= col("total"))
          .select(col("user_id"), col("freq"))
      },
      Some(
        """SELECT user_id, count(*)::bigint AS freq
          |FROM events GROUP BY 1
          |HAVING count(*) * 500 >= (SELECT count(*) FROM events)""".stripMargin)),

    // Funnel analysis: per-user view → purchase conversion within one hour —
    // the behavioral-sequence query shape (interval self-join + flag).
    ("events_funnel",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("purchase_ts"))
        val converted = views.join(purchases,
            col("user_id") === col("p_uid") &&
              col("purchase_ts") >= col("view_ts") &&
              col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id")).distinct()
          .withColumn("conv", lit(1))
        ev.groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_views"),
            sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases"))
          .join(converted, Seq("user_id"), "left")
          .withColumn("converted", coalesce(col("conv"), lit(0)))
          .drop("conv")
      },
      Some(
        """WITH vv AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
          |pp AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
          |conv AS (SELECT DISTINCT vv.user_id FROM vv JOIN pp
          |         ON pp.user_id = vv.user_id
          |        AND pp.ts >= vv.ts AND pp.ts <= vv.ts + INTERVAL 1 HOUR)
          |SELECT e.user_id,
          |       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint AS n_views,
          |       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS n_purchases,
          |       (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)::int AS converted
          |FROM events e LEFT JOIN conv c ON c.user_id = e.user_id
          |GROUP BY 1, 4""".stripMargin)),

    // Z-order layout key: Morton interleave of two bucketized filter columns
    // — sort-before-write so min/max stats prune scans on either axis.
    ("events_zorder_key",
      (s: SparkSession, d: String) => {
        val x = pmod(col("user_id").cast("long"), lit(256L))
        val y = pmod(abs(floor(col("value"))).cast("long"), lit(256L))
        Tables.events(s, d).select(col("event_id"),
          x.as("zx"), y.as("zy"), Layout.zValue(x, y, 8).as("z"))
      },
      Some {
        val terms = (0 until 8).map { b =>
          s"((zx >> $b) & 1) * ${1L << (2 * b)} + ((zy >> $b) & 1) * ${1L << (2 * b + 1)}"
        }.mkString(" + ")
        s"""SELECT event_id, zx, zy, ($terms)::bigint AS z
           |FROM (SELECT event_id,
           |             user_id % 256 AS zx,
           |             (abs(floor(value))::bigint) % 256 AS zy
           |      FROM events)""".stripMargin
      }),

    // BPE training, first iteration: corpus-wide counts of adjacent character
    // pairs within tokens — the merge-candidate table a byte-pair tokenizer
    // trains from. Top-20 with deterministic tie-break.
    ("text_bpe_pairs",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .select(explode(TextOps.tokens(TextOps.normalize(col("text")))).as("token"))
          .filter(length(col("token")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("token")) - 1),
            i => col("token").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(20),
      Some(
        """WITH tok AS (
          |  SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
          |  FROM documents),
          |pairs AS (
          |  SELECT unnest(list_transform(range(1, length(token)), i -> substring(token, i::int, 2))) AS pair
          |  FROM tok WHERE length(token) >= 2)
          |SELECT pair, count(*)::bigint AS n
          |FROM pairs GROUP BY 1
          |ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // Feature-hashing vectorizer (hashing trick): 16-bucket token-count
    // vector per doc — the no-vocabulary text featurizer, zero-shuffle and
    // stable under corpus growth. Scalar projections + a position-weighted
    // checksum pin every bucket for the row-sorting gate.
    ("text_hash_vectorize",
      (s: SparkSession, d: String) => {
        val dim = 16
        val v = TextOps.hashVectorize(col("text"), dim)
        Tables.documents(s, d).select(
          col("doc_id"),
          element_at(v, 1).as("b0"), element_at(v, 2).as("b1"),
          element_at(v, 3).as("b2"), element_at(v, 4).as("b3"),
          aggregate(zip_with(v, sequence(lit(0), lit(dim - 1)), (c, i) => c * i),
            lit(0), (a, x) => a + x).as("wsum"),
          size(TextOps.tokens(TextOps.normalize(col("text")))).as("n_tokens"))
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |v AS (
          |  SELECT doc_id, toks,
          |         list_transform(range(0, 16),
          |           b -> len(list_filter(toks,
          |                  tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 16 = b))) AS vec
          |  FROM t)
          |SELECT doc_id,
          |       vec[1]::int AS b0, vec[2]::int AS b1, vec[3]::int AS b2, vec[4]::int AS b3,
          |       list_sum(list_transform(range(0, 16), i -> vec[i + 1] * i))::int AS wsum,
          |       len(toks)::int AS n_tokens
          |FROM v""".stripMargin)),

    // BPE tokenizer training, 3 merges: per iteration the corpus-wide most
    // frequent adjacent symbol pair (weighted by word frequency) and the
    // greedy left-to-right merge. Driver loop bounded by the merge count
    // (the k-means pattern); each round is one vocab-sized pair-count
    // shuffle + a zero-shuffle merge projection. The oracle unrolls the
    // same three rounds with list_reduce folds.
    ("text_bpe_train",
      (s: SparkSession, d: String) =>
        TextOps.bpeTrain(Tables.documents(s, d), col("text"), merges = 3),
      Some {
        def iter(i: Int): String =
          s"""p$i AS (
             |  SELECT pr['a'] AS a, pr['b'] AS b, sum(w)::bigint AS n
             |  FROM (SELECT unnest(list_transform(range(1, len(syms)),
             |                      j -> {'a': syms[j], 'b': syms[j + 1]})) AS pr, w
             |        FROM w${i - 1} WHERE len(syms) >= 2)
             |  GROUP BY 1, 2),
             |r$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
             |w$i AS (
             |  SELECT list_reduce(list_prepend([]::varchar[], list_transform(syms, x -> [x])),
             |           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = r$i.a AND x[1] = r$i.b
             |                       THEN list_append(acc[1:-2], r$i.a || r$i.b)
             |                       ELSE list_append(acc, x[1]) END) AS syms, w
             |  FROM w${i - 1}, r$i),
             |""".stripMargin
        s"""WITH tok AS (
           |  SELECT token, count(*) AS w
           |  FROM (SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
           |        FROM documents)
           |  GROUP BY 1),
           |w0 AS (SELECT list_transform(range(1, length(token) + 1), i -> token[i]) AS syms, w FROM tok),
           |${iter(1)}${iter(2)}${iter(3).stripSuffix(",\n")}
           |SELECT 1 AS iteration, a AS sym_a, b AS sym_b, n AS weight FROM r1
           |UNION ALL SELECT 2, a, b, n FROM r2
           |UNION ALL SELECT 3, a, b, n FROM r3""".stripMargin
      }),

    // Linear quality-classifier inference (fastText-shaped): hashed
    // bag-of-tokens counts · integer weight vector + bias → margin,
    // thresholded keep flag. Weights are plan-time literals (trained
    // offline); zero-shuffle projection, exact-long dot product.
    ("text_classifier_score",
      (s: SparkSession, d: String) =>
        TextOps.classifierScore(Tables.documents(s, d), col("text"),
          col("doc_id"), weights = clfWeights, bias = -40L, threshold = 0L),
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |w AS (SELECT [5, -3, 7, 2, -8, 4, 1, -2, 6, -5, 3, 9, -1, -4, 8, 2] AS wv),
          |v AS (
          |  SELECT doc_id,
          |         list_transform(range(0, 16),
          |           b -> len(list_filter(toks,
          |                  tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 16 = b))) AS vec
          |  FROM t),
          |m AS (
          |  SELECT doc_id,
          |         (list_sum(list_transform(range(0, 16), i -> vec[i + 1] * wv[i + 1])) - 40)::bigint AS margin
          |  FROM v CROSS JOIN w)
          |SELECT doc_id, margin,
          |       (CASE WHEN margin >= 0 THEN 1 ELSE 0 END)::int AS clf_keep
          |FROM m""".stripMargin)),

    // Exact tie-aware ROC AUC of the hash-classifier margin predicting the
    // quality gate: Mann–Whitney with average ranks, kept in integer 2× form
    // (auc_num2 / auc_den2 exact longs; auc is their one IEEE division).
    // Aggregates BY SCORE first — the unpartitioned rank window runs over
    // the distinct-margin frame, never the corpus.
    ("eval_auc_classifier",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, col("text"), col("doc_id"),
          weights = clfWeights, bias = -40L, threshold = 0L)
        val labels = TextOps.qualityFilter(docs, col("text"))
          .select(col("doc_id"), col("quality_keep"))
        Eval.aucExact(scored.join(labels, "doc_id"),
          col("margin"), col("quality_keep"))
      },
      Some(clfLabelCtes +
        """, bysc AS (
          |  SELECT score, count(*)::bigint AS c, sum(label)::bigint AS p
          |  FROM joined GROUP BY 1),
          |cum AS (
          |  SELECT score, c, p,
          |         coalesce(sum(c) OVER (ORDER BY score
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint
          |           AS cum_below
          |  FROM bysc),
          |agg AS (
          |  SELECT sum(p)::bigint AS n_pos, sum(c - p)::bigint AS n_neg,
          |         sum(p * (2 * cum_below + c + 1))::bigint AS sum2ranks
          |  FROM cum)
          |SELECT n_pos, n_neg,
          |       (sum2ranks - n_pos * (n_pos + 1))::bigint AS auc_num2,
          |       (2 * n_pos * n_neg)::bigint AS auc_den2,
          |       CASE WHEN n_pos * n_neg <> 0
          |            THEN (sum2ranks - n_pos * (n_pos + 1))::double
          |                   / (2 * n_pos * n_neg) END AS auc
          |FROM agg""".stripMargin)),

    // Calibration table for the same (margin, quality) pair: 10 fixed-width
    // bins over the observed margin range (exact long floor division), with
    // per-bin counts and empirical positive rate — the reliability-diagram /
    // threshold-tuning artifact.
    ("eval_calibration_bins",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, col("text"), col("doc_id"),
          weights = clfWeights, bias = -40L, threshold = 0L)
        val labels = TextOps.qualityFilter(docs, col("text"))
          .select(col("doc_id"), col("quality_keep"))
        Eval.calibrationBins(scored.join(labels, "doc_id"),
          col("margin"), col("quality_keep"), nBins = 10)
      },
      Some(clfLabelCtes +
        """, bounds AS (SELECT min(score) AS smin, max(score) AS smax FROM joined)
          |SELECT ((score - smin) * 10 // (smax - smin + 1))::bigint AS bin,
          |       count(*)::bigint AS n, sum(label)::bigint AS n_pos,
          |       min(score)::bigint AS score_lo, max(score)::bigint AS score_hi,
          |       sum(label)::double / count(*) AS pos_rate
          |FROM joined CROSS JOIN bounds
          |GROUP BY 1""".stripMargin)),

    // Full precision/recall sweep for the same (margin, quality) pair: one
    // row per achievable threshold ("keep docs scoring ≥ s") with exact long
    // confusion counts and the precision/recall/F1 trade-off at that cutoff
    // — the artifact behind choosing a corpus-filter operating point.
    // Cumulative sums run on the distinct-score frame (bounded by the score
    // domain, never the corpus); each ratio is one IEEE division of exact
    // longs, so both engines round identically.
    ("eval_pr_curve",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, col("text"), col("doc_id"),
          weights = clfWeights, bias = -40L, threshold = 0L)
        val labels = TextOps.qualityFilter(docs, col("text"))
          .select(col("doc_id"), col("quality_keep"))
        Eval.prCurve(scored.join(labels, "doc_id"),
          col("margin"), col("quality_keep"))
      },
      Some(clfLabelCtes +
        """, bysc AS (
          |  SELECT score, count(*)::bigint AS c, sum(label)::bigint AS p
          |  FROM joined GROUP BY 1),
          |cum AS (
          |  SELECT score,
          |         sum(p) OVER (ORDER BY score DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          |         sum(c) OVER (ORDER BY score DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
          |         sum(p) OVER () AS n_pos
          |  FROM bysc)
          |SELECT score AS threshold, tp::bigint AS tp,
          |       (pp - tp)::bigint AS fp, (n_pos - tp)::bigint AS fn,
          |       tp::double / pp AS precision_at,
          |       CASE WHEN n_pos <> 0 THEN tp::double / n_pos END AS recall_at,
          |       CASE WHEN n_pos + pp <> 0
          |            THEN (2 * tp)::double / (n_pos + pp) END AS f1_at
          |FROM cum""".stripMargin)),

    // Retrieval-ranking eval (Eval.ndcgAtK — verdict-r14 item 2): NDCG@5
    // and reciprocal rank per query, grading the engine's OWN BM25
    // retrieval (three fixed term-bag queries, top-20 candidates each)
    // against a deterministic graded relevance label: the count of the
    // query's terms present in the document (term coverage, 0..3). DCG
    // position weights are 2^30-scaled 1/log2(r+1) plan literals computed
    // once in Scala and inlined into BOTH engines' plans (the HLL
    // ln-table precedent) — the whole metric is exact longs plus one
    // final IEEE division.
    ("eval_ndcg_retrieval",
      (s: SparkSession, d: String) => retrievalNdcgPerQuery(s, d),
      Some(retrievalNdcgSql)),

    // The corpus roll-up: mean NDCG + MRR over the query set in exact
    // numerator/denominator form (sums of 2^20 fixed-point longs; a query
    // with no relevant hit contributes 0, the standard convention).
    ("eval_retrieval_mean",
      (s: SparkSession, d: String) =>
        Eval.retrievalEvalSummary(retrievalNdcgPerQuery(s, d)),
      Some(retrievalMeanSql)),

    // ==== distributed training: full-batch perceptron =====================
    // The training loop itself as a catalog row — iterated whole-corpus
    // aggregation with O(dim) driver state (see Learn.scala's scale notes).
    // Exact integer features/weights/margins make the 16-iteration trajectory
    // summation-order-independent, so the ORACLE replays the identical
    // training run as 16 unrolled CTEs and the weight history hash-matches
    // bit-for-bit — a verified distributed training loop, not just scoring.
    ("learn_perceptron",
      (s: SparkSession, d: String) =>
        Learn.perceptronHistory(
          Learn.markerFeatures(Tables.documents(s, d), col("doc_id"),
            col("text")), iters = 16),
      Some(perceptronHistorySql(16))),

    // The serving half: final weights folded in as plan-time literals, exact
    // integer score per document plus a correctness flag (the oracle scores
    // from its own final-iteration (it16) weights — train AND predict both cross-verified).
    ("learn_perceptron_preds",
      (s: SparkSession, d: String) =>
        Learn.perceptronPredict(
          Learn.markerFeatures(Tables.documents(s, d), col("doc_id"),
            col("text")), iters = 16),
      Some(perceptronPredsSql(16))),

    // Averaged-perceptron serving: score with the trajectory-SUMMED weights
    // (sign-equivalent to the average, division never happens, everything
    // stays integer-exact) — the standard stabilizer when the concept is
    // only nearly separable. Oracle sums the unrolled iterations' weights.
    ("learn_perceptron_avg_preds",
      (s: SparkSession, d: String) =>
        Learn.perceptronPredictAveraged(
          Learn.markerFeatures(Tables.documents(s, d), col("doc_id"),
            col("text")), iters = 16),
      Some(perceptronAvgPredsSql(16))),

    // WARM twin of learn_perceptron_preds: weights are a persisted artifact
    // (Artifacts.perceptronWeights — writeWeights/readWeights round-trip
    // with feature-layout validation); the row is scoreStatic's
    // zero-shuffle literal projection only — the 16-iteration training loop
    // never runs in-query. Same oracle as the training-twin predictions.
    ("learn_perceptron_served",
      (s: SparkSession, d: String) =>
        Learn.scoreStatic(
          Learn.markerFeatures(Tables.documents(s, d), col("doc_id"),
            col("text")),
          Artifacts.perceptronWeights(s, d).toSeq),
      Some(perceptronPredsSql(16))),

    // ==== distributed training: one-pass ridge regression =================
    // The CLOSED-FORM counterpart to the perceptron loop: (XᵀX + λI)w = Xᵀy
    // solved exactly. One aggregate computes the 6 Gram + 3 moment sums
    // (map-side partials → a single reduce of 9 longs — the cheapest
    // possible training job at 100 TB); the 3×3 solve is O(1) driver work in
    // exact BigInt (Bareiss + Cramer), so the oracle reproduces the weights
    // bit-for-bit via HUGEINT cofactor expansion. Regression target: predict
    // filter+sort+merge token volume from scan/join counts (+bias).
    ("learn_ridge_weights",
      (s: SparkSession, d: String) => {
        val feats = ridgeFeats(s, d)
        Learn.ridgeWeightsFrame(s,
          Learn.ridgeFit(feats, ridgeXc, "y_t", lambda = 1L))
      },
      Some(ridgeWeightsSql)),

    // The serving half: per-document exact prediction numerator
    // (pred = pred_num / det) and det-scaled residual, model folded in as
    // decimal literals — zero-shuffle projection, string-encoded because
    // the Cramer numerators exceed long range beyond ~10⁴ docs.
    ("learn_ridge_preds",
      (s: SparkSession, d: String) => {
        val feats = ridgeFeats(s, d)
        val m = Learn.ridgeFit(feats, ridgeXc, "y_t", lambda = 1L)
        Learn.ridgePredict(feats, m, col("doc_id"), "y_t")
      },
      Some(ridgePredsSql)),

    // One closed-form model PER SOURCE, with the Cramer solve itself as
    // Catalyst decimal expressions (Leibniz over the 3! permutations) — no
    // driver state at all: a grouped Gram aggregate plus a zero-shuffle
    // projection trains a model per domain in a single pass, however many
    // domains there are. The model-per-source quality-scorer shape.
    ("learn_ridge_by_source",
      (s: SparkSession, d: String) => {
        val feats = Learn.markerFeatures(Tables.documents(s, d),
            col("doc_id"), col("text"), carry = Seq("source"))
          .withColumn("y_t", col("x_filter") + col("x_sort") + col("x_merge"))
        Learn.ridgeFitGrouped(feats, col("source"), ridgeXc, "y_t")
      },
      Some(ridgeGroupedSql)),

    // BPE encode: apply the 3 trained merges to every document (greedy
    // left-to-right, training order — the encode half of the tokenizer
    // loop). Zero-shuffle projection: the rules are plan-time literals
    // fetched from the bounded trainer at construction (the bm25-constants
    // pattern); per-token folds are array-local. The oracle re-derives the
    // same rules via the train CTE chain and unrolls the same three folds
    // per document.
    ("text_bpe_encode",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val rules = TextOps.bpeTrain(docs, col("text"), merges = 3)
          .orderBy("iteration").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextOps.bpeEncode(docs, col("text"), col("doc_id"), rules)
      },
      Some(bpeEncodeSql)),

    // WARM twin of text_bpe_encode: the 3-merge vocabulary is a persisted
    // artifact (Artifacts.bpeRules — the writeBpeVocab/readBpeVocab
    // round-trip); the row itself is bpeEncode's zero-shuffle literal-rule
    // projection only. Same oracle: encoding through the reloaded
    // vocabulary must be indistinguishable from training in-query.
    ("text_bpe_served",
      (s: SparkSession, d: String) =>
        TextOps.bpeEncode(Tables.documents(s, d), col("text"), col("doc_id"),
          Artifacts.bpeRules(s, d)),
      Some(bpeEncodeSql)),

    // Corpus-relative rarity: mean document-frequency of each doc's distinct
    // tokens — the boilerplate-vs-novelty signal, integer-derived throughout.
    ("text_token_rarity",
      (s: SparkSession, d: String) =>
        TextOps.docRarity(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH tok AS (
          |  SELECT DISTINCT doc_id, t AS token
          |  FROM (SELECT doc_id,
          |               unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
          |        FROM documents)),
          |dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1)
          |SELECT doc_id,
          |       count(*) AS n_distinct_tokens,
          |       sum(df)::bigint AS sum_df,
          |       cast(sum(df) AS double) / count(*) AS mean_token_df
          |FROM tok JOIN dfreq USING (token)
          |GROUP BY 1""".stripMargin)),

    // Within-document repetition battery (Gopher-style): top/duplicate
    // word-bigram and -trigram occurrence fractions plus the keep verdict —
    // the filter that catches loop-generated and boilerplate-stuffed text.
    ("text_repetition",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val r2 = TextOps.repetitionStats(docs, col("text"), col("doc_id"), 2)
        val r3 = TextOps.repetitionStats(docs, col("text"), col("doc_id"), 3)
        r2.join(r3, "doc_id")
          .withColumn("rep_keep",
            (col("top_2gram_ratio") <= 0.08 && col("dup_2gram_ratio") <= 0.15 &&
              col("dup_3gram_ratio") <= 0.10).cast("int"))
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |g2 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS gram
          |       FROM toks WHERE len(toks) >= 2),
          |c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
          |m2 AS (SELECT doc_id, sum(c)::bigint AS n_2grams,
          |              cast(max(c) AS double) / sum(c) AS top_2gram_ratio,
          |              cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS double) / sum(c) AS dup_2gram_ratio
          |       FROM c2 GROUP BY 1),
          |g3 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 2),
          |                             i -> array_to_string(toks[i + 1:i + 3], ' '))) AS gram
          |       FROM toks WHERE len(toks) >= 3),
          |c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
          |m3 AS (SELECT doc_id, sum(c)::bigint AS n_3grams,
          |              cast(max(c) AS double) / sum(c) AS top_3gram_ratio,
          |              cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS double) / sum(c) AS dup_3gram_ratio
          |       FROM c3 GROUP BY 1)
          |SELECT m2.doc_id, n_2grams, top_2gram_ratio, dup_2gram_ratio,
          |       n_3grams, top_3gram_ratio, dup_3gram_ratio,
          |       (CASE WHEN top_2gram_ratio <= 0.08 AND dup_2gram_ratio <= 0.15
          |                  AND dup_3gram_ratio <= 0.10 THEN 1 ELSE 0 END)::int AS rep_keep
          |FROM m2 JOIN m3 ON m2.doc_id = m3.doc_id""".stripMargin)),

    // Cross-document boilerplate: fraction of each doc's distinct 3-gram
    // shingles shared by >= 5 documents corpus-wide — headers/chrome/license
    // blocks that repeat across a crawl rather than within one page.
    // Plans the skew-safe (default) form since r9: two-level df count +
    // heavy-key broadcast attach — bounded per-task fan-in at any skew.
    ("text_boilerplate",
      (s: SparkSession, d: String) =>
        TextOps.boilerplateStats(Tables.documents(s, d), col("text"),
          col("doc_id"), n = 3, minDf = 5),
      Some(shingleCte +
        """, dfreq AS (SELECT shingle, count(*) AS df FROM shingle_rows GROUP BY 1)
          |SELECT doc_id, count(*)::bigint AS n_shingles,
          |       sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END)::bigint AS n_boiler,
          |       cast(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS double) / count(*) AS boiler_ratio
          |FROM shingle_rows JOIN dfreq USING (shingle)
          |GROUP BY 1""".stripMargin)),

    // Small-corpus opt-in form of text_boilerplate: document frequency as a
    // whole-partition window count over one exploded frame — fewer exchanges
    // and no model join, but a hyper-common shingle lands in ONE task, so
    // this form is only for frames where the hottest shingle provably fits
    // one task. Identical result by construction, pinned by the same oracle.
    ("text_boilerplate_window",
      (s: SparkSession, d: String) =>
        TextOps.boilerplateStats(Tables.documents(s, d), col("text"),
          col("doc_id"), n = 3, minDf = 5, skewSafe = false),
      Some(shingleCte +
        """, dfreq AS (SELECT shingle, count(*) AS df FROM shingle_rows GROUP BY 1)
          |SELECT doc_id, count(*)::bigint AS n_shingles,
          |       sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END)::bigint AS n_boiler,
          |       cast(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS double) / count(*) AS boiler_ratio
          |FROM shingle_rows JOIN dfreq USING (shingle)
          |GROUP BY 1""".stripMargin)),

    // The default at-scale form with a deliberately LOW heavyCut=8 so BOTH
    // the broadcast (hot) and bounded-join (cold) branches carry rows at
    // gate scale (the default 2^24 cut keeps everything on the cold branch
    // at sf0.01); identical result by construction, pinned by the same
    // oracle.
    ("text_boilerplate_skewsafe",
      (s: SparkSession, d: String) =>
        TextOps.boilerplateStats(Tables.documents(s, d), col("text"),
          col("doc_id"), n = 3, minDf = 5, skewSafe = true, heavyCut = 8L),
      Some(shingleCte +
        """, dfreq AS (SELECT shingle, count(*) AS df FROM shingle_rows GROUP BY 1)
          |SELECT doc_id, count(*)::bigint AS n_shingles,
          |       sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END)::bigint AS n_boiler,
          |       cast(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS double) / count(*) AS boiler_ratio
          |FROM shingle_rows JOIN dfreq USING (shingle)
          |GROUP BY 1""".stripMargin)),

    // Train/test contamination: per held-out test doc, coverage of its
    // distinct 3-gram shingles by the train split (same hash-split as
    // split_train_val_test). Partial overlap is the base rate; the flag
    // fires at 90% coverage — the benchmark-decontamination gate.
    ("text_contamination",
      (s: SparkSession, d: String) => {
        val split = Sampling.hashSplit(Tables.documents(s, d), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        TextOps.contamination(
          split.filter(col("split") === "test"),
          split.filter(col("split") === "train"),
          col("text"), col("doc_id"), n = 3, threshold = 0.9)
      },
      Some(contaminationOracleSql)),

    // The at-scale decontamination form: training shingles pre-filtered
    // through a bloom sketch of the (tiny) test shingle set — a scalar-
    // subquery probe that kills non-candidate shingles map-side, BEFORE the
    // distinct's exchange. Blooms have no false negatives and the exact
    // equi-join removes false positives, so the result is row-identical to
    // text_contamination — same oracle SQL, same hash.
    ("text_contamination_bloom",
      (s: SparkSession, d: String) => {
        val split = Sampling.hashSplit(Tables.documents(s, d), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        TextOps.contaminationBloom(
          split.filter(col("split") === "test"),
          split.filter(col("split") === "train"),
          col("text"), col("doc_id"), n = 3, threshold = 0.9,
          expectedItems = 1L << 17)
      },
      Some(contaminationOracleSql)),

    // Bigram LM scoring (log-free perplexity stand-in): corpus bigram model,
    // per-doc mean conditional probability quantized to integer
    // parts-per-2^30 so the sum is exact in any aggregation order.
    // Plans the skew-safe (default) form since r9: distinct-bigram model +
    // heavy-key broadcast attach — bounded per-task fan-in at any skew.
    ("text_lm_score",
      (s: SparkSession, d: String) =>
        TextOps.lmScore(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |bi AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS bigram
          |       FROM toks WHERE len(toks) >= 2),
          |c12 AS (SELECT bigram, count(*) AS c12 FROM bi GROUP BY 1),
          |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c12) AS c1
          |       FROM c12 GROUP BY 1),
          |model AS (SELECT bigram, (c12 * 1073741824) // c1 AS p_scaled
          |          FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = w1)
          |SELECT doc_id, count(*)::bigint AS n_bigrams,
          |       cast(sum(p_scaled) AS double) / (count(*) * 1073741824.0) AS lm_score
          |FROM bi JOIN model USING (bigram)
          |GROUP BY 1""".stripMargin)),

    // Small-corpus opt-in form of text_lm_score: both model counts as
    // whole-partition window counts over ONE exploded bigram frame — no
    // model table, no joins, but a hyper-common first word ("the …") lands
    // in one task. Identical result by construction, same oracle.
    ("text_lm_score_window",
      (s: SparkSession, d: String) =>
        TextOps.lmScore(Tables.documents(s, d), col("text"), col("doc_id"),
          skewSafe = false),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |bi AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS bigram
          |       FROM toks WHERE len(toks) >= 2),
          |c12 AS (SELECT bigram, count(*) AS c12 FROM bi GROUP BY 1),
          |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c12) AS c1
          |       FROM c12 GROUP BY 1),
          |model AS (SELECT bigram, (c12 * 1073741824) // c1 AS p_scaled
          |          FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = w1)
          |SELECT doc_id, count(*)::bigint AS n_bigrams,
          |       cast(sum(p_scaled) AS double) / (count(*) * 1073741824.0) AS lm_score
          |FROM bi JOIN model USING (bigram)
          |GROUP BY 1""".stripMargin)),

    // The default at-scale form with a deliberately LOW heavyCut=8 so BOTH
    // broadcast (hot) and bounded-join (cold) branches carry rows at gate
    // scale. The model-table CTE shape is literally what the skew-safe
    // Spark plan computes.
    ("text_lm_score_skewsafe",
      (s: SparkSession, d: String) =>
        TextOps.lmScore(Tables.documents(s, d), col("text"), col("doc_id"),
          skewSafe = true, heavyCut = 8L),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |bi AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS bigram
          |       FROM toks WHERE len(toks) >= 2),
          |c12 AS (SELECT bigram, count(*) AS c12 FROM bi GROUP BY 1),
          |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c12) AS c1
          |       FROM c12 GROUP BY 1),
          |model AS (SELECT bigram, (c12 * 1073741824) // c1 AS p_scaled
          |          FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = w1)
          |SELECT doc_id, count(*)::bigint AS n_bigrams,
          |       cast(sum(p_scaled) AS double) / (count(*) * 1073741824.0) AS lm_score
          |FROM bi JOIN model USING (bigram)
          |GROUP BY 1""".stripMargin)),

    // DSIR-style importance weights (Xie et al. 2023): raw docs scored by
    // target-likeness over hashed unigram+bigram buckets, target = the
    // English slice of the corpus. Log-free house variant: per-bucket
    // Laplace-smoothed count ratio floor-quantized to parts-per-2^30 (staged
    // long arithmetic Spark-side; DuckDB's HUGEINT computes it directly).
    // The model is <= 4096 rows by construction -> broadcast attach, no
    // skew surface at any corpus size.
    ("text_dsir_weights",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        TextOps.dsirWeightsFlagged(docs, col("lang") === "en",
          col("text"), col("doc_id"))
      },
      Some(
        """WITH norm AS (
          |  SELECT doc_id, lang,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents),
          |grams AS (
          |  SELECT doc_id, lang, unnest(t) AS gram FROM norm
          |  UNION ALL
          |  SELECT doc_id, lang, unnest(list_transform(range(0, len(t) - 1),
          |                              i -> array_to_string(t[i + 1:i + 2], ' '))) AS gram
          |  FROM norm WHERE len(t) >= 2),
          |b AS (SELECT doc_id, lang,
          |             ('0x' || substr(md5(gram), 1, 15))::bigint % 4096 AS bucket
          |      FROM grams),
          |cr AS (SELECT bucket, count(*) AS c_r FROM b GROUP BY 1),
          |ct AS (SELECT bucket, count(*) AS c_t FROM b WHERE lang = 'en' GROUP BY 1),
          |model AS (SELECT bucket,
          |                 ((coalesce(c_t, 0) + 1) * 1073741824) // (c_r + 1) AS r_scaled
          |          FROM cr LEFT JOIN ct USING (bucket))
          |SELECT doc_id, count(*)::bigint AS n_grams,
          |       sum(r_scaled)::bigint AS weight_scaled,
          |       cast(sum(r_scaled) AS double) / (count(*) * 1073741824.0) AS mean_weight
          |FROM b JOIN model USING (bucket)
          |GROUP BY 1""".stripMargin)),

    // Context-window chunking: 16-token windows, stride 8 (50% overlap) —
    // the doc → model-context-sized-pieces projection. Zero shuffle; the
    // trailing partial window is kept so every token lands in ≥1 chunk.
    ("text_chunk_windows",
      (s: SparkSession, d: String) =>
        TextOps.chunkWindows(Tables.documents(s, d), col("text"), col("doc_id"),
          windowTokens = 16, strideTokens = 8),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |t2 AS (
          |  SELECT doc_id, toks, len(toks) AS n,
          |         8 * ceil(greatest(len(toks) - 16, 0) / 8.0)::int AS last_start
          |  FROM toks),
          |st AS (
          |  SELECT doc_id, toks, n, last_start,
          |         unnest(range(0, n::bigint, 8)) AS start
          |  FROM t2)
          |SELECT doc_id, n::int AS n_tokens, (start // 8)::int AS chunk_id,
          |       array_to_string(toks[start + 1:start + 16], ' ') AS chunk_text,
          |       least(16, n - start)::int AS chunk_tokens
          |FROM st WHERE start <= last_start""".stripMargin)),

    // Sequence packing: contiguous-by-id token-budget binning per source
    // shard (prefix-sum window; sharding keeps the cumsum distributed — a
    // single global order would serialize the corpus through one partition).
    ("text_pack_sequences",
      (s: SparkSession, d: String) =>
        TextOps.packSequences(Tables.documents(s, d), col("text"),
          col("doc_id"), col("source"), budgetTokens = 1024),
      Some(
        """WITH t AS (
          |  SELECT source AS shard, doc_id,
          |         len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::int AS n_tokens
          |  FROM documents),
          |p AS (
          |  SELECT shard, doc_id, n_tokens,
          |         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint AS prefix
          |  FROM t)
          |SELECT shard, doc_id, n_tokens, prefix, (prefix // 1024)::bigint AS seq_id
          |FROM p""".stripMargin)),

    // The round-7 pipeline capstone: repetition gate × LM-score gate ×
    // boilerplate gate, survivors packed into token-budget training
    // sequences per source shard — the new corpus signals composed into one
    // job (complementing corpus_pipeline's dedup → quality → redact →
    // split). The oracle recomputes every stage.
    ("corpus_pipeline_v2",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val rep = TextOps.repetitionStats(docs, col("text"), col("doc_id"), 2)
          .select(col("doc_id"), col("top_2gram_ratio"), col("dup_2gram_ratio"))
        val lm = TextOps.lmScore(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("lm_score"))
        val boiler = TextOps.boilerplateStats(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("boiler_ratio"))
        val keep = docs.join(rep, "doc_id").join(lm, "doc_id").join(boiler, "doc_id")
          .filter(col("top_2gram_ratio") <= 0.08 && col("dup_2gram_ratio") <= 0.15 &&
            col("lm_score") >= 0.033 && col("boiler_ratio") <= 0.05)
        TextOps.packSequences(keep, col("text"), col("doc_id"), col("source"), 1024)
      },
      Some(
        """WITH toks AS (
          |  SELECT doc_id, source,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
          |  FROM documents),
          |g2 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS gram
          |       FROM toks WHERE len(toks) >= 2),
          |c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
          |m2 AS (SELECT doc_id, cast(max(c) AS double) / sum(c) AS top2,
          |              cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS double) / sum(c) AS dup2
          |       FROM c2 GROUP BY 1),
          |bi AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
          |                             i -> array_to_string(toks[i + 1:i + 2], ' '))) AS bigram
          |       FROM toks WHERE len(toks) >= 2),
          |c12 AS (SELECT bigram, count(*) AS c12 FROM bi GROUP BY 1),
          |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
          |model AS (SELECT bigram, (c12 * 1073741824) // c1 AS p_scaled
          |          FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = w1),
          |lm AS (SELECT doc_id,
          |              cast(sum(p_scaled) AS double) / (count(*) * 1073741824.0) AS lm_score
          |       FROM bi JOIN model USING (bigram) GROUP BY 1),
          |sh0 AS (SELECT DISTINCT doc_id, shingle FROM (
          |  SELECT doc_id,
          |         unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
          |                ELSE list_transform(range(0, len(toks) - 2),
          |                                    i -> array_to_string(toks[i + 1:i + 3], ' ')) END) AS shingle
          |  FROM toks)),
          |dfq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1),
          |bo AS (SELECT doc_id,
          |              cast(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS double) / count(*) AS boiler_ratio
          |       FROM sh0 JOIN dfq USING (shingle) GROUP BY 1),
          |keep AS (
          |  SELECT t.doc_id, t.source AS shard, len(t.toks)::int AS n_tokens
          |  FROM toks t JOIN m2 USING (doc_id) JOIN lm USING (doc_id) JOIN bo USING (doc_id)
          |  WHERE m2.top2 <= 0.08 AND m2.dup2 <= 0.15
          |    AND lm.lm_score >= 0.033 AND bo.boiler_ratio <= 0.05),
          |p AS (
          |  SELECT shard, doc_id, n_tokens,
          |         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint AS prefix
          |  FROM keep)
          |SELECT shard, doc_id, n_tokens, prefix, (prefix // 1024)::bigint AS seq_id
          |FROM p""".stripMargin)),

    // The round-9 pipeline capstone: ensemble near-dup verdict (Jaccard OR
    // SimHash-hamming) × substring-run-cut retention gate × DSIR
    // target-likeness gate × Gopher quality battery × PII redaction ×
    // hash-split — the r8/r9 signals composed into one corpus job. Signals
    // (cut intervals, DSIR model) are computed CORPUS-WIDE (they are corpus
    // facts); gates and packing apply to dedup survivors. The oracle
    // recomputes every stage in CTEs.
    ("corpus_pipeline_v3",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val ver = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
        val f = Dedup.simhash(docs, col("text"), col("doc_id"))
        val drops = ver
          .join(f.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), "doc_a")
          .join(f.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), "doc_b")
          .filter(col("jaccard") >= 0.8 ||
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 6)
          .select(col("doc_b").as("doc_id"))
        val undup = docs.join(drops, Seq("doc_id"), "left_anti")
        val cut = TextOps.cutRuns(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("n_tokens_after"))
        // localCheckpoint materializes the doc-level DSIR frame ONCE (it is
        // #docs rows, not #grams): the eager global-mean scalar below and
        // the per-doc join both read the materialization instead of each
        // re-running the explode + model chain.
        val dsirAll = TextOps.dsirWeightsFlagged(docs,
          col("lang") === "en", col("text"), col("doc_id"))
          .localCheckpoint()
        // Scale-invariant DSIR gate: keep docs more target-like than the
        // corpus overall. The global mean ratio is a construction-time
        // eager scalar (the bm25-constants pattern) derived from the same
        // exact longs as mean_weight, so the comparison is bit-identical
        // in every engine.
        val tot = dsirAll.agg(sum(col("weight_scaled")).as("ws"),
          sum(col("n_grams")).as("ng")).head()
        // empty corpus: both sums are NULL — the gate compares no rows, any
        // threshold works; 0.0 avoids the ROW_VALUE_IS_NULL construction crash
        val globalMean = if (tot.isNullAt(0)) 0.0
          else tot.getLong(0).toDouble / (tot.getLong(1).toDouble * 1073741824.0)
        val dsir = dsirAll.select(col("doc_id"), col("mean_weight"))
        val qual = TextOps.qualityFilter(undup, col("text"))
          .filter(col("quality_keep") === 1)
        val kept = qual.join(cut, "doc_id").join(dsir, "doc_id")
          .filter(col("n_tokens_after") >= 10 &&
            col("mean_weight") >= lit(globalMean))
        Sampling.hashSplit(
            kept.withColumn("clean_len", length(TextOps.redactPii(col("text")))),
            col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
          .select(col("doc_id"), col("split"), col("n_tokens"),
            col("n_tokens_after"), col("mean_weight"), col("clean_len"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, enstok AS (
          |  SELECT DISTINCT doc_id, t AS token
          |  FROM (SELECT doc_id,
          |               unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
          |        FROM documents)),
          |ensh AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::bigint AS h FROM enstok),
          |ensbits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          |  FROM ensh CROSS JOIN (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2),
          |enshash AS (
          |  SELECT doc_id,
          |         cast(sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END) AS bigint) AS simhash
          |  FROM ensbits GROUP BY 1),
          |drops AS (
          |  SELECT v.doc_b AS doc_id
          |  FROM verified v
          |  JOIN enshash ea ON ea.doc_id = v.doc_a
          |  JOIN enshash eb ON eb.doc_id = v.doc_b
          |  WHERE v.jaccard >= 0.8 OR bit_count(xor(ea.simhash, eb.simhash)) <= 6),
          |kept AS (
          |  SELECT d.doc_id, d.text FROM documents d
          |  WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = d.doc_id)),
          |ctoks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents),
          |cg0 AS (
          |  SELECT doc_id, pos, array_to_string(t[pos + 1 : pos + 5], ' ') AS gram
          |  FROM ctoks CROSS JOIN LATERAL (SELECT unnest(range(0, len(t) - 4)) AS pos)
          |  WHERE len(t) >= 5),
          |ccapped AS (
          |  SELECT doc_id, pos, gram FROM (
          |    SELECT *, row_number() OVER (PARTITION BY doc_id, gram ORDER BY pos) AS occ
          |    FROM cg0) WHERE occ <= 8),
          |clight AS (SELECT gram FROM ccapped GROUP BY gram
          |           HAVING count(DISTINCT doc_id) <= 64),
          |cg AS (SELECT c.* FROM ccapped c JOIN clight USING (gram)),
          |cpairs AS (
          |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2,
          |         a.pos - b.pos AS diag
          |  FROM cg a JOIN cg b ON a.gram = b.gram AND a.doc_id < b.doc_id),
          |cisl AS (
          |  SELECT d1, d2, diag, isl, count(*) + 4 AS run_tokens,
          |         min(p2) AS s, max(p2) + 4 AS e
          |  FROM (SELECT d1, d2, p1, p2, diag,
          |               p1 - row_number() OVER (PARTITION BY d1, d2, diag
          |                                       ORDER BY p1) AS isl
          |        FROM cpairs)
          |  GROUP BY d1, d2, diag, isl),
          |ccuts AS (SELECT d2 AS doc_id, s, e FROM cisl WHERE run_tokens >= 8),
          |csw AS (SELECT doc_id, s, e,
          |               max(e) OVER (PARTITION BY doc_id ORDER BY s, e
          |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
          |        FROM ccuts),
          |cgrps AS (SELECT doc_id, s, e,
          |                 sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
          |                   OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
          |          FROM csw),
          |cmiv AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM cgrps GROUP BY 1, 2),
          |civl AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS iv FROM cmiv GROUP BY 1),
          |cstats AS (
          |  SELECT t.doc_id,
          |         (CASE WHEN i.iv IS NULL THEN len(t.t)
          |               ELSE len(list_filter(range(0, len(t.t)),
          |                      ix -> len(list_filter(i.iv, v -> ix >= v['s'] AND ix <= v['e'])) = 0))
          |          END)::int AS n_tokens_after
          |  FROM ctoks t LEFT JOIN civl i USING (doc_id)),
          |dnorm AS (
          |  SELECT doc_id, lang,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents),
          |dgrams AS (
          |  SELECT doc_id, lang, unnest(t) AS gram FROM dnorm
          |  UNION ALL
          |  SELECT doc_id, lang, unnest(list_transform(range(0, len(t) - 1),
          |                              i -> array_to_string(t[i + 1:i + 2], ' '))) AS gram
          |  FROM dnorm WHERE len(t) >= 2),
          |db AS (SELECT doc_id, lang,
          |              ('0x' || substr(md5(gram), 1, 15))::bigint % 4096 AS bucket
          |       FROM dgrams),
          |dcr AS (SELECT bucket, count(*) AS c_r FROM db GROUP BY 1),
          |dct AS (SELECT bucket, count(*) AS c_t FROM db WHERE lang = 'en' GROUP BY 1),
          |dmodel AS (SELECT bucket,
          |                  ((coalesce(c_t, 0) + 1) * 1073741824) // (c_r + 1) AS r_scaled
          |           FROM dcr LEFT JOIN dct USING (bucket)),
          |dweights AS (
          |  SELECT doc_id, count(*)::bigint AS n_grams, sum(r_scaled)::bigint AS weight_scaled,
          |         cast(sum(r_scaled) AS double) / (count(*) * 1073741824.0) AS mean_weight
          |  FROM db JOIN dmodel USING (bucket)
          |  GROUP BY 1),
          |dglob AS (
          |  SELECT cast(sum(weight_scaled) AS double)
          |           / (cast(sum(n_grams) AS double) * 1073741824.0) AS gmean
          |  FROM dweights)
          |""".stripMargin +
        qualityMetricsCtes("kept").replaceFirst("^WITH ", ", ") +
        s""", qkeep AS (
          |  SELECT m.doc_id, m.n_tokens, k.text
          |  FROM qmetrics m JOIN kept k ON k.doc_id = m.doc_id
          |  WHERE m.n_tokens BETWEEN 20 AND 80 AND m.avg_token_len BETWEEN 3.0 AND 8.0
          |    AND m.symbol_ratio <= 0.1 AND m.digit_token_ratio <= 0.2
          |    AND m.n_stopwords >= 1)
          |SELECT doc_id,
          |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
          |       n_tokens, n_tokens_after, mean_weight,
          |       length(regexp_replace(
          |                regexp_replace(text, '${TextOps.emailPattern}', '<EMAIL>', 'g'),
          |                '${TextOps.longNumberPattern}', '<NUM>', 'g'))::int AS clean_len
          |FROM (SELECT q.doc_id, q.n_tokens, c.n_tokens_after, w.mean_weight, q.text,
          |             ('0x' || substr(md5(q.doc_id::varchar), 1, 15))::bigint % 100 AS b
          |      FROM qkeep q
          |      JOIN cstats c ON c.doc_id = q.doc_id
          |      JOIN dweights w ON w.doc_id = q.doc_id
          |      CROSS JOIN dglob g
          |      WHERE c.n_tokens_after >= 10 AND w.mean_weight >= g.gmean)""".stripMargin)),

    // Pipeline v5 — the text gates composed with the embedding-side
    // diversity stage: quality ∧ classifier gate picks the survivors, the
    // mutual-kNN clustering runs over the SURVIVOR embedding set only
    // (buckets are per-vector, so filtering first is semantics-preserving
    // AND the scale win — the graph pair space shrinks with the gate), and
    // each cluster elects its densest member as the representative. Output:
    // the survivor representatives with cluster id, fixed-point density,
    // and token count — the frame a curation run would hand to a budget or
    // export stage. Oracle: the full gate chain, then the graph/component/
    // density CTEs re-instantiated over the kept subset.
    ("corpus_pipeline_v5",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val q = TextOps.qualityFilter(docs, col("text"))
          .select(col("doc_id"), col("quality_keep"), col("n_tokens"))
        // recall-leaning threshold (−60, ~top half of margins): v5's
        // classifier stage is a coarse prefilter ahead of the diversity
        // stage, not the strict gate the eval rows measure at 0
        val c = TextOps.classifierScore(docs, col("text"), col("doc_id"),
          weights = clfWeights, bias = -40L, threshold = -60L)
          .select(col("doc_id"), col("clf_keep"))
        val kept = q.join(c, "doc_id")
          .filter(col("quality_keep") === 1 && col("clf_keep") === 1)
          .select(col("doc_id").as("vec_id"), col("n_tokens"))
        val embKept = Tables.embeddings(s, d).join(kept, Seq("vec_id"))
        // k = 3: mutual-kNN degree drives cluster granularity — at k = 5
        // this corpus chains into a handful of mega-clusters; 3 keeps the
        // sample a sample
        Similarity.diverseSample(embKept, "vec_id", "embedding", k = 3,
            nBands = 4, rowsPerBand = 2, dim = 64)
          .filter(col("rep_keep") === 1)
          .join(kept, Seq("vec_id"))
          .select(col("vec_id"), col("cluster_id"), col("density_q"),
            col("n_tokens"))
      },
      Some(clfLabelCtes +
        """, kept AS (
          |  SELECT m.doc_id, m.n_tokens
          |  FROM qmetrics m JOIN cm USING (doc_id)
          |  WHERE m.n_tokens BETWEEN 20 AND 80 AND m.avg_token_len BETWEEN 3.0 AND 8.0
          |    AND m.symbol_ratio <= 0.1 AND m.digit_token_ratio <= 0.2
          |    AND m.n_stopwords >= 1 AND cm.margin >= -60),
          |emb_kept AS (
          |  SELECT e.vec_id, e.embedding FROM embeddings e
          |  JOIN kept k ON e.vec_id = k.doc_id),
          |""".stripMargin +
        knnGraphCteOver("emb_kept", k = 3).stripPrefix("WITH ") +
        """, mm AS (
          |  SELECT a.src_id AS doc_a, a.dst_id AS doc_b
          |  FROM g a JOIN g b ON b.src_id = a.dst_id AND b.dst_id = a.src_id
          |  WHERE a.src_id < a.dst_id),
          |comp AS (
          |  SELECT id AS vec_id, min(lbl) AS cluster_id
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT vec_id, vec_id FROM emb_kept
          |      UNION
          |      SELECT e.s, r.lbl
          |      FROM (SELECT doc_a AS s, doc_b AS t FROM mm
          |            UNION ALL
          |            SELECT doc_b AS s, doc_a AS t FROM mm) e
          |      JOIN r ON r.id = e.t)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1),
          |dens AS (
          |  SELECT src_id, sum(floor(cosine * 1073741824)::bigint)::bigint AS density_q
          |  FROM g GROUP BY 1),
          |j AS (
          |  SELECT c.vec_id, c.cluster_id, coalesce(d.density_q, 0) AS density_q
          |  FROM comp c LEFT JOIN dens d ON d.src_id = c.vec_id),
          |reps AS (
          |  SELECT vec_id, cluster_id, density_q
          |  FROM (SELECT vec_id, cluster_id, density_q,
          |               row_number() OVER (PARTITION BY cluster_id
          |                 ORDER BY density_q DESC, vec_id) AS rn
          |        FROM j)
          |  WHERE rn = 1)
          |SELECT r.vec_id, r.cluster_id, r.density_q, k.n_tokens
          |FROM reps r JOIN kept k ON k.doc_id = r.vec_id""".stripMargin)),

    // Pipeline v4 — the ROUND-10 operator families composed end-to-end:
    // boilerplate-planted corpus → chunk-level exact dedup (kept TEXT
    // reassembled, not just hashed) → train/test hash split → train-side
    // decontamination against the test split's shingles (drop ratio ≥ 0.5)
    // → per-source greedy token budget over the SURVIVING kept tokens. The
    // oracle recomputes every stage in CTEs: tile → election → reassembly →
    // split → shingle overlap → hash-ordered running-sum admission.
    ("corpus_pipeline_v4",
      (s: SparkSession, d: String) => {
        val boiler = "terms of service apply all rights reserved contact us " +
          "for more information today please read carefully"
        val base = Tables.documents(s, d)
        val withBoiler = base.withColumn("text2",
          when(col("doc_id") % 4 === 0, concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")))
        val kept = Dedup.paragraphDedupText(withBoiler, col("text2"),
            col("doc_id"), chunkTokens = 8)
          .join(base.select(col("doc_id"), col("source")), "doc_id")
        val split = Sampling.hashSplit(kept, col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        val train = split.filter(col("split") === "train")
        val test = split.filter(col("split") === "test")
        // contamination()'s param names are benchmark-oriented: the frame
        // whose PER-DOC overlap is measured is `test`. Here that frame is
        // the TRAIN split (we drop leaking train docs), measured against
        // the test split's shingle set.
        val decon = TextOps.contamination(train, test, col("kept_text"),
            col("doc_id"), n = 3, threshold = 0.5)
          .select(col("doc_id"), col("overlap_ratio"), col("contaminated"))
        val survivors = train.join(decon, "doc_id")
          .filter(col("contaminated") === 0)
        Sampling.tokenBudgetPerGroup(survivors, Seq(col("source")),
            col("doc_id"), col("kept_tokens"), budget = 600L)
          .select(col("doc_id"), col("source"), col("kept_tokens"),
            col("overlap_ratio"), col("cum_tokens"))
      },
      Some(
        """WITH d2 AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 4 = 0
          |           THEN concat('terms of service apply all rights reserved ',
          |                       'contact us for more information today ',
          |                       'please read carefully ', text)
          |           ELSE text END AS text
          |  FROM documents),
          |toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
          |                      ' ') AS t
          |  FROM d2),
          |ch AS (
          |  SELECT doc_id, i::int AS chunk_id,
          |         array_to_string(t[(i * 8 + 1)::int:(i * 8 + 8)::int], ' ') AS chunk_text,
          |         least(8, len(t) - i * 8)::int AS chunk_tokens
          |  FROM toks CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
          |  WHERE i = 0 OR i * 8 < len(t)),
          |k AS (
          |  SELECT *, row_number() OVER (PARTITION BY chunk_text
          |                               ORDER BY doc_id, chunk_id) AS rn
          |  FROM ch),
          |keptx AS (
          |  SELECT doc_id,
          |         coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END,
          |                             ' ' ORDER BY chunk_id), '') AS kept_text,
          |         sum(CASE WHEN rn = 1 THEN chunk_tokens ELSE 0 END)::bigint AS kept_tokens
          |  FROM k GROUP BY doc_id),
          |kd AS (
          |  SELECT x.doc_id, x.kept_text, x.kept_tokens, d.source,
          |         ('0x' || substr(md5(x.doc_id::varchar), 1, 15))::bigint % 100 AS b
          |  FROM keptx x JOIN documents d ON d.doc_id = x.doc_id),
          |ksh AS (
          |  SELECT doc_id, b, shingle FROM (
          |    SELECT doc_id, b,
          |           unnest(CASE WHEN len(kt) <= 3 THEN [array_to_string(kt, ' ')]
          |                  ELSE list_transform(range(0, len(kt) - 2),
          |                                      i -> array_to_string(kt[i + 1:i + 3], ' ')) END) AS shingle
          |    FROM (SELECT doc_id, b,
          |                 string_split(regexp_replace(trim(lower(kept_text)), '\s+', ' ', 'g'),
          |                              ' ') AS kt
          |          FROM kd))),
          |trsh AS (SELECT DISTINCT doc_id, shingle FROM ksh WHERE b < 80),
          |tesh AS (SELECT DISTINCT shingle FROM ksh WHERE b >= 90),
          |ov AS (
          |  SELECT t.doc_id, count(*)::bigint AS n_sh,
          |         sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_ov
          |  FROM trsh t LEFT JOIN tesh e ON t.shingle = e.shingle
          |  GROUP BY 1),
          |surv AS (
          |  SELECT kd.doc_id, kd.source, kd.kept_tokens,
          |         cast(ov.n_ov AS double) / ov.n_sh AS overlap_ratio
          |  FROM kd JOIN ov ON ov.doc_id = kd.doc_id
          |  WHERE kd.b < 80 AND cast(ov.n_ov AS double) / ov.n_sh < 0.5),
          |adm AS (
          |  SELECT doc_id, source, kept_tokens, overlap_ratio,
          |         sum(kept_tokens) OVER (PARTITION BY source
          |           ORDER BY ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_tokens
          |  FROM surv)
          |SELECT doc_id, source, kept_tokens, overlap_ratio, cum_tokens
          |FROM adm WHERE cum_tokens <= 600""".stripMargin)),

    // Gopher-style quality battery: every rule's metric + verdict per doc.
    ("text_quality_filter",
      (s: SparkSession, d: String) =>
        TextOps.qualityFilter(Tables.documents(s, d), col("text"))
          .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
            col("symbol_ratio"), col("digit_token_ratio"), col("n_stopwords"),
            col("ok_token_count"), col("ok_token_len"), col("ok_symbol_ratio"),
            col("ok_digit_ratio"), col("ok_stopword"), col("quality_keep")),
      Some(qualityMetricsCtes("documents") +
        """SELECT doc_id, n_tokens, avg_token_len, symbol_ratio, digit_token_ratio,
          |       n_stopwords,
          |       (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END)::int AS ok_token_count,
          |       (CASE WHEN avg_token_len BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END)::int AS ok_token_len,
          |       (CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END)::int AS ok_symbol_ratio,
          |       (CASE WHEN digit_token_ratio <= 0.2 THEN 1 ELSE 0 END)::int AS ok_digit_ratio,
          |       (CASE WHEN n_stopwords >= 1 THEN 1 ELSE 0 END)::int AS ok_stopword,
          |       (CASE WHEN n_tokens BETWEEN 20 AND 80 AND avg_token_len BETWEEN 3.0 AND 8.0
          |             AND symbol_ratio <= 0.1 AND digit_token_ratio <= 0.2
          |             AND n_stopwords >= 1 THEN 1 ELSE 0 END)::int AS quality_keep
          |FROM qmetrics""".stripMargin)),

    // ---- The flagship training-data pipeline, end to end ------------------
    // near-dedup (LSH candidates → verified Jaccard → drop) → quality filter
    // → PII redaction → train/val/test hash-split. This is the composed job a
    // corpus builder actually runs; the oracle recomputes the whole chain.
    ("corpus_pipeline",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.lshCandidates(Dedup.lshBuckets(
          Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
        val drops = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
          .filter(col("jaccard") >= 0.8)
          .select(col("doc_b").as("doc_id"))
        val kept = docs.join(drops, Seq("doc_id"), "left_anti")
        val quality = TextOps.qualityFilter(kept, col("text"))
          .filter(col("quality_keep") === 1)
        Sampling.hashSplit(
            quality.withColumn("clean_len", length(TextOps.redactPii(col("text")))),
            col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
          .select(col("doc_id"), col("split"), col("n_tokens"), col("clean_len"))
      },
      Some(lshCandCtes + nearDupVerifyCtes +
        """, kept AS (
          |  SELECT d.doc_id, d.text FROM documents d
          |  WHERE NOT EXISTS (SELECT 1 FROM verified v
          |                    WHERE v.doc_b = d.doc_id AND v.jaccard >= 0.8))
          |""".stripMargin +
        qualityMetricsCtes("kept").replaceFirst("^WITH ", ", ") +
        s""", qkeep AS (
          |  SELECT m.doc_id, m.n_tokens, k.text
          |  FROM qmetrics m JOIN kept k ON k.doc_id = m.doc_id
          |  WHERE m.n_tokens BETWEEN 20 AND 80 AND m.avg_token_len BETWEEN 3.0 AND 8.0
          |    AND m.symbol_ratio <= 0.1 AND m.digit_token_ratio <= 0.2
          |    AND m.n_stopwords >= 1)
          |SELECT doc_id,
          |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
          |       n_tokens,
          |       length(regexp_replace(
          |                regexp_replace(text, '${TextOps.emailPattern}', '<EMAIL>', 'g'),
          |                '${TextOps.longNumberPattern}', '<NUM>', 'g'))::int AS clean_len
          |FROM (SELECT doc_id, n_tokens, text,
          |             ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % 100 AS b
          |      FROM qkeep)""".stripMargin)),

    // ---- ANN: brute-force cosine top-5 for the first 10 vectors -----------
    ("sim_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.cosineTopK(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
          .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"))
      },
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve FROM embeddings),
          |q AS (SELECT * FROM v WHERE vec_id < 10),
          |s AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |         list_dot_product(q.ve, c.ve)
          |           / (sqrt(list_dot_product(q.ve, q.ve)) * sqrt(list_dot_product(c.ve, c.ve))) AS cosine
          |  FROM q CROSS JOIN v c WHERE q.vec_id != c.vec_id)
          |SELECT query_id, cast("rank" AS int) AS "rank", neighbor_id
          |FROM (SELECT query_id, neighbor_id,
          |             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
          |      FROM s)
          |WHERE "rank" <= 5""".stripMargin)),

    // SQ8 scalar-quantized search: the cheapest ANN tier — corpus + queries
    // quantized to int8 with ONE corpus-trained symmetric scale, scored by
    // integer dot products (4× smaller vectors, integer-only loop, and —
    // unlike the LSH/IVF pruning tiers — every candidate is still scored).
    // Fully integer-exact: rank, neighbor and iscore carry no float anywhere.
    ("sim_topk_int8",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.int8TopK(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
          .select(col("query_id"), col("rank").cast("int").as("rank"),
            col("neighbor_id"), col("iscore"))
      },
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |a AS (SELECT max(list_aggregate(list_transform(ve, x -> abs(x)), 'max')) AS amax
          |      FROM v),
          |l AS (SELECT vec_id,
          |             list_transform(ve, x -> CASE WHEN amax = 0 THEN 0
          |               ELSE round(x / amax * 127.0)::int END) AS lv
          |      FROM v CROSS JOIN a),
          |q AS (SELECT * FROM l WHERE vec_id < 10),
          |s AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |         list_sum(list_transform(generate_series(1, len(q.lv)),
          |           i -> (q.lv[i] * c.lv[i])::bigint))::bigint AS iscore
          |  FROM q CROSS JOIN l c WHERE q.vec_id != c.vec_id)
          |SELECT query_id, cast("rank" AS int) AS "rank", neighbor_id, iscore
          |FROM (SELECT query_id, neighbor_id, iscore,
          |             row_number() OVER (PARTITION BY query_id
          |                                ORDER BY iscore DESC, neighbor_id) AS "rank"
          |      FROM s)
          |WHERE "rank" <= 5""".stripMargin)),

    // SQ8 recall gate against the exact-MIPS baseline (raw inner product —
    // the score the integer dot approximates; cosine would be the wrong
    // baseline for a corpus with varying norms). Quantization only reorders
    // near-ties, so recall sits far above the pruning tiers.
    ("sim_recall_int8",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        val brute = Similarity.dotTopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.int8TopK(q, emb, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |a AS (SELECT max(list_aggregate(list_transform(ve, x -> abs(x)), 'max')) AS amax
          |      FROM v),
          |l AS (SELECT vec_id,
          |             list_transform(ve, x -> CASE WHEN amax = 0 THEN 0
          |               ELSE round(x / amax * 127.0)::int END) AS lv
          |      FROM v CROSS JOIN a),
          |q AS (SELECT * FROM v WHERE vec_id < 10),
          |brute AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |             list_dot_product(q.ve, c.ve) DESC, c.vec_id) AS rnk
          |    FROM q CROSS JOIN v c WHERE q.vec_id != c.vec_id)
          |  WHERE rnk <= 5),
          |ql AS (SELECT * FROM l WHERE vec_id < 10),
          |approx AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |             list_sum(list_transform(generate_series(1, len(q.lv)),
          |               i -> (q.lv[i] * c.lv[i])::bigint)) DESC, c.vec_id) AS rnk
          |    FROM ql q CROSS JOIN l c WHERE q.vec_id != c.vec_id)
          |  WHERE rnk <= 5)
          |SELECT b.query_id,
          |       count(*) AS n_true,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_hit,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS double)
          |         / count(*) AS recall
          |FROM brute b
          |LEFT JOIN approx a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
          |GROUP BY 1""".stripMargin)),

    // Corpus self-kNN graph: every document's 5 nearest in-corpus neighbors
    // drawn from the banded-hyperplane LSH candidate set (same planes/bands
    // as dedup_embedding_near, same hot-bucket cap discipline). The graph is
    // DEFINED by the algorithm (planes, bands, cap, id tie-break), so the
    // oracle recomputes the identical projections; recall vs the exact
    // brute-force graph is a spec-measured property, not the gate. At sf0.01
    // every (band, bucket) holds ≤ ~162 rows, far under the 1024 cap, so the
    // capped star never fires here and the oracle needn't model it (the
    // degenerate-corpus spec covers that path).
    ("sim_knn_graph",
      (s: SparkSession, d: String) =>
        Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, nBands = 4, rowsPerBand = 2, dim = 64),
      Some(knnGraphCte +
        "SELECT src_id, rank, dst_id, cosine FROM g")),

    // One NN-descent refinement round over the LSH kNN graph: expand each
    // node's candidates through the symmetrized graph (reverse side capped
    // at k per node — hub guard), exact-rescore, re-rank top-k. Candidate
    // space ≤ 4k² per mid node, linear in the corpus. Deterministic, so the
    // refined graph itself is the oracle contract; the recall UPLIFT vs
    // brute force is spec-measured (KnnGraphSpec).
    ("sim_knn_refined",
      (s: SparkSession, d: String) =>
        Similarity.knnGraphRefined(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 5, nBands = 4, rowsPerBand = 2, dim = 64,
          rounds = 1),
      Some(knnGraphCte +
        """, rev AS (
          |  SELECT dst_id AS src_id, src_id AS dst_id
          |  FROM (SELECT src_id, dst_id,
          |               row_number() OVER (PARTITION BY dst_id
          |                                  ORDER BY cosine DESC, src_id) AS rrank
          |        FROM g) WHERE rrank <= 5),
          |e AS (SELECT src_id, dst_id FROM g UNION SELECT src_id, dst_id FROM rev),
          |twohop AS (
          |  SELECT DISTINCT a.src_id, b.dst_id
          |  FROM e a JOIN e b ON b.src_id = a.dst_id
          |  WHERE b.dst_id <> a.src_id),
          |cand AS (SELECT src_id, dst_id FROM twohop
          |         UNION SELECT src_id, dst_id FROM g),
          |scored AS (
          |  SELECT c.src_id, c.dst_id,
          |         list_dot_product(a.ve, b.ve) / (a.nn * b.nn) AS cosine
          |  FROM cand c
          |  JOIN n a ON a.vec_id = c.src_id
          |  JOIN n b ON b.vec_id = c.dst_id)
          |SELECT src_id,
          |       row_number() OVER (PARTITION BY src_id
          |                          ORDER BY cosine DESC, dst_id)::int AS rank,
          |       dst_id, cosine
          |FROM scored QUALIFY rank <= 5""".stripMargin)),

    // kNN-density outlier gate: mean top-k neighbor cosine below tau marks a
    // document as isolated in embedding space (off-topic / garbled / badly
    // embedded) — evaluated in fixed point (Σ floor(cosine·2^30) ≥
    // floor(tau·2^30)·n) so the gate is order-free exact long arithmetic,
    // never a float mean whose partial-sum order differs between engines.
    // tau = 0.31 ≈ the corpus median mean-top-5 cosine.
    ("emb_knn_density",
      (s: SparkSession, d: String) =>
        Similarity.knnDensityGate(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, tau = 0.31, nBands = 4, rowsPerBand = 2, dim = 64),
      Some(knnGraphCte +
        """, d AS (SELECT src_id, sum(floor(cosine * 1073741824)::bigint)::bigint AS density_q,
          |              count(*) AS knn_n
          |       FROM g GROUP BY 1)
          |SELECT v.vec_id AS src_id,
          |       coalesce(d.density_q, 0) AS density_q,
          |       coalesce(d.knn_n, 0) AS knn_n,
          |       (CASE WHEN coalesce(d.knn_n, 0) > 0
          |               AND coalesce(d.density_q, 0) >= 332859965 * coalesce(d.knn_n, 0)
          |             THEN 1 ELSE 0 END)::int AS dense_keep
          |FROM v LEFT JOIN d ON d.src_id = v.vec_id""".stripMargin)),

    // Mutual-kNN clustering: components over the MUTUAL kNN edges (a↔b in
    // each other's top-k) — mutuality stops hub docs welding unrelated
    // neighborhoods together. cluster_id = min member id; cluster_size feeds
    // diversity sampling / soft-dedup downweighting.
    ("sim_knn_clusters",
      (s: SparkSession, d: String) =>
        Similarity.knnClusters(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 5, nBands = 4, rowsPerBand = 2, dim = 64),
      Some(knnGraphCte +
        """, m AS (
          |  SELECT a.src_id AS doc_a, a.dst_id AS doc_b
          |  FROM g a JOIN g b ON b.src_id = a.dst_id AND b.dst_id = a.src_id
          |  WHERE a.src_id < a.dst_id),
          |comp AS (
          |  SELECT id AS vec_id, min(lbl) AS cluster_id
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT vec_id, vec_id FROM embeddings
          |      UNION
          |      SELECT e.s, r.lbl
          |      FROM (SELECT doc_a AS s, doc_b AS t FROM m
          |            UNION ALL
          |            SELECT doc_b AS s, doc_a AS t FROM m) e
          |      JOIN r ON r.id = e.t)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1)
          |SELECT vec_id, cluster_id,
          |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
          |FROM comp""".stripMargin)),

    // Diversity sampling: one representative per mutual-kNN cluster — the
    // member with the highest fixed-point kNN density (most central), ties
    // to the lowest id. The graph is built once and shared between the
    // component and density passes.
    ("sim_diverse_sample",
      (s: SparkSession, d: String) =>
        Similarity.diverseSample(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 5, nBands = 4, rowsPerBand = 2, dim = 64),
      Some(knnGraphCte +
        """, m AS (
          |  SELECT a.src_id AS doc_a, a.dst_id AS doc_b
          |  FROM g a JOIN g b ON b.src_id = a.dst_id AND b.dst_id = a.src_id
          |  WHERE a.src_id < a.dst_id),
          |comp AS (
          |  SELECT id AS vec_id, min(lbl) AS cluster_id
          |  FROM (
          |    WITH RECURSIVE r(id, lbl) AS (
          |      SELECT vec_id, vec_id FROM embeddings
          |      UNION
          |      SELECT e.s, r.lbl
          |      FROM (SELECT doc_a AS s, doc_b AS t FROM m
          |            UNION ALL
          |            SELECT doc_b AS s, doc_a AS t FROM m) e
          |      JOIN r ON r.id = e.t)
          |    SELECT id, lbl FROM r)
          |  GROUP BY 1),
          |dens AS (
          |  SELECT src_id, sum(floor(cosine * 1073741824)::bigint)::bigint AS density_q
          |  FROM g GROUP BY 1),
          |j AS (
          |  SELECT c.vec_id, c.cluster_id, coalesce(d.density_q, 0) AS density_q
          |  FROM comp c LEFT JOIN dens d ON d.src_id = c.vec_id)
          |SELECT vec_id, cluster_id, density_q,
          |       (CASE WHEN row_number() OVER (PARTITION BY cluster_id
          |                ORDER BY density_q DESC, vec_id) = 1
          |             THEN 1 ELSE 0 END)::int AS rep_keep
          |FROM j""".stripMargin)),

    // ---- Embedding transforms: normalize / quantize / project -------------
    // Array columns stay internal; the oracle compares scalar derivations
    // (norms, first elements, integer checksums) — all bit-exact because both
    // engines fold the same doubles in the same left-to-right order.
    ("emb_normalize",
      (s: SparkSession, d: String) =>
        Embeddings.normalized(Tables.embeddings(s, d), col("vec_id"), col("embedding"))
          .select(col("vec_id"), col("norm"),
            element_at(col("unit"), 1).as("unit0"),
            Similarity.norm(col("unit")).as("unit_norm")),
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |n AS (SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS norm FROM v),
          |u AS (SELECT vec_id, norm, list_transform(ve, x -> x / norm) AS ue FROM n)
          |SELECT vec_id, norm, ue[1] AS unit0, sqrt(list_dot_product(ue, ue)) AS unit_norm
          |FROM u""".stripMargin)),

    // int8 quantization: the 4x storage lever for vector corpora. The integer
    // checksum (q_sum) verifies every element's level exactly.
    ("emb_quantize",
      (s: SparkSession, d: String) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
          .withColumn("vmin", array_min(col("v")))
          .withColumn("vmax", array_max(col("v")))
          .withColumn("q", Embeddings.quantizeInt8(col("v"), col("vmin"), col("vmax")))
          .select(col("vec_id"), col("vmin"), col("vmax"),
            element_at(col("q"), 1).as("q0"),
            aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
            array_min(col("q")).as("q_min"),
            array_max(col("q")).as("q_max")),
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |m AS (SELECT vec_id, ve,
          |             list_aggregate(ve, 'min') AS vmin,
          |             list_aggregate(ve, 'max') AS vmax
          |      FROM v),
          |q AS (SELECT vec_id, vmin, vmax,
          |             list_transform(ve, x -> CASE WHEN vmax = vmin THEN 0
          |               ELSE round((x - vmin) / ((vmax - vmin) / 255.0))::int - 128 END) AS qe
          |      FROM m)
          |SELECT vec_id, vmin, vmax, qe[1]::int AS q0,
          |       list_sum(qe)::bigint AS q_sum,
          |       list_aggregate(qe, 'min')::int AS q_min,
          |       list_aggregate(qe, 'max')::int AS q_max
          |FROM q""".stripMargin)),

    // Johnson-Lindenstrauss random projection 64 -> 4 dims; each output dim is
    // one codegen'd dot product against a plan-time constant direction. The
    // oracle interpolates the SAME constants (Double.toString round-trips).
    ("emb_project",
      (s: SparkSession, d: String) => {
        val p = Embeddings.randomProject(Similarity.asDouble(col("embedding")), 4, 64)
        Tables.embeddings(s, d).select(col("vec_id"),
          element_at(p, 1).as("p0"), element_at(p, 2).as("p1"),
          element_at(p, 3).as("p2"), element_at(p, 4).as("p3"))
      },
      Some {
        // scientific notation → DuckDB parses as DOUBLE (a bare decimal
        // literal would parse as DECIMAL and truncate the mantissa);
        // Locale.ROOT so a comma-decimal default locale can't corrupt the SQL
        val dims = (0 until 4).map { o =>
          val coeffs = (0 until 64)
            .map(dd => String.format(java.util.Locale.ROOT, "%.17e",
              Double.box(Embeddings.projCoeffConst(o, dd))))
            .mkString("[", ", ", "]")
          s"list_dot_product(ve, $coeffs) AS p$o"
        }.mkString(",\n       ")
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
           |           FROM embeddings)
           |SELECT vec_id,
           |       $dims
           |FROM v""".stripMargin
      }),

    // Per-label centroids (class prototypes): element-wise means with each
    // element quantized to floor(x·2^20) longs first, so the sums are exact
    // in any aggregation order — the parallel-safe vector mean. One shuffle
    // on label, 64 partial long sums per group, no explode.
    ("emb_label_centroids",
      (s: SparkSession, d: String) =>
        Embeddings.labelCentroids(Tables.embeddings(s, d), col("label"),
            col("embedding"), dim = 64)
          .select(col("label"), col("n"), col("qsum"),
            element_at(col("centroid"), 1).as("c0"),
            element_at(col("centroid"), 2).as("c1"),
            element_at(col("centroid"), 3).as("c2"),
            element_at(col("centroid"), 4).as("c3")),
      Some {
        val els = (0 until 4)
          .map(i => s"cast(sum(qv[${i + 1}]) AS double) / (count(*) * 1048576.0) AS c$i")
          .mkString(",\n           |       ")
        s"""WITH q AS (
           |  SELECT label,
           |         list_transform(embedding, x -> floor(x::double * 1048576.0)::bigint) AS qv
           |  FROM embeddings)
           |SELECT label, count(*)::bigint AS n, sum(list_sum(qv))::bigint AS qsum,
           |       $els
           |FROM q GROUP BY 1""".stripMargin
      }),

    // Integer-exact PageRank (damping 17/20, 3 power iterations) over the
    // customer↔supplier bipartite trade graph — the source-importance signal
    // a crawl pipeline derives for seed weighting. Ranks are scaled longs so
    // every iteration's sums are order-independent (oracle-verifiable);
    // per-iteration dataflow is join + map-side-combined shuffle, no driver
    // state. The oracle unrolls the same three iterations in CTEs.
    ("graph_pagerank",
      (s: SparkSession, d: String) => {
        val lo = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("sv"))
        val edges = lo.select(col("c").as("src"), col("sv").as("dst"))
          .union(lo.select(col("sv").as("src"), col("c").as("dst")))
          .distinct()
        Graph.pageRank(edges, iterations = 3)
      },
      Some {
        val base = (Graph.RankScale * 3) / 20
        def iter(prev: String, n: Int): String =
          s"""c$n AS (SELECT src, rank // outdeg AS contrib FROM $prev JOIN outdeg ON node = src),
             |i$n AS (SELECT dst, sum(contrib)::bigint AS inb FROM edges JOIN c$n USING (src) GROUP BY 1),
             |r$n AS (SELECT node, ${base} + (coalesce(inb, 0) // 20) * 17 + ((coalesce(inb, 0) % 20) * 17) // 20 AS rank
             |        FROM nodes LEFT JOIN i$n ON node = dst),
             |""".stripMargin
        s"""WITH lo AS (
           |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS sv
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |edges AS (SELECT c AS src, sv AS dst FROM lo
           |          UNION
           |          SELECT sv AS src, c AS dst FROM lo),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT node
           |          FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
           |r0 AS (SELECT node, ${Graph.RankScale}::bigint AS rank FROM nodes),
           |${iter("r0", 1)}${iter("r1", 2)}${iter("r2", 3).stripSuffix(",\n")}
           |SELECT node, rank::bigint AS rank, rank / ${Graph.RankScale}.0 AS rank_norm
           |FROM r3""".stripMargin
      }),

    // Personalized PageRank: teleport mass restricted to a seed set (every
    // 10th customer) — seed-biased importance over the same bipartite
    // purchase graph; non-seeds hold purely inherited mass. Oracle unrolls
    // the same three iterations with the seed-gated base term.
    ("graph_ppr",
      (s: SparkSession, d: String) => {
        val lo = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"),
            concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("sv"))
        val edges = lo.select(col("c").as("src"), col("sv").as("dst"))
          .union(lo.select(col("sv").as("src"), col("c").as("dst")))
          .distinct()
        val seeds = lo.filter(col("o_custkey") % 10 === 0)
          .select(col("c")).distinct()
        Graph.personalizedPageRank(edges, seeds, iterations = 3)
      },
      Some {
        val base = (Graph.RankScale * 3) / 20
        def iter(prev: String, n: Int): String =
          s"""c$n AS (SELECT src, rank // outdeg AS contrib FROM $prev JOIN outdeg ON node = src),
             |i$n AS (SELECT dst, sum(contrib)::bigint AS inb FROM edges JOIN c$n USING (src) GROUP BY 1),
             |r$n AS (SELECT node, is_seed,
             |               CASE WHEN is_seed = 1 THEN ${base} ELSE 0 END
             |                 + (coalesce(inb, 0) // 20) * 17 + ((coalesce(inb, 0) % 20) * 17) // 20 AS rank
             |        FROM nodes LEFT JOIN i$n ON node = dst),
             |""".stripMargin
        s"""WITH lo AS (
           |  SELECT DISTINCT o_custkey, 'c' || o_custkey AS c, 's' || l_suppkey AS sv
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |edges AS (SELECT c AS src, sv AS dst FROM lo
           |          UNION
           |          SELECT sv AS src, c AS dst FROM lo),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
           |seeds AS (SELECT DISTINCT c AS node FROM lo WHERE o_custkey % 10 = 0),
           |nodes AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
           |          FROM (SELECT DISTINCT node
           |                FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)) n
           |          LEFT JOIN seeds s ON s.node = n.node),
           |r0 AS (SELECT node, is_seed,
           |              CASE WHEN is_seed = 1 THEN ${Graph.RankScale} ELSE 0 END AS rank
           |       FROM nodes),
           |${iter("r0", 1)}${iter("r1", 2)}${iter("r2", 3).stripSuffix(",\n")}
           |SELECT node, is_seed::int AS is_seed, rank::bigint AS rank,
           |       rank / ${Graph.RankScale}.0 AS rank_norm
           |FROM r3""".stripMargin
      }),

    // Triangle counting by degree-ordered orientation (compact-forward):
    // the O(m^1.5) wedge bound that survives celebrity nodes — each edge
    // directed low→high in (degree, node) order caps every out-degree at
    // O(√m). Graph: parts co-purchased within an order (first two
    // lineitems, so the per-order pair expansion is bounded at 1). The
    // oracle re-runs orientation + wedge closing in CTEs; all-long outputs.
    ("graph_triangles",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d).filter(col("l_linenumber") <= 2)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val e = li.alias("x")
          .join(li.alias("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        Graph.triangleCount(e)
      },
      Some(
        """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk
          |            FROM lineitem WHERE l_linenumber <= 2),
          |e0 AS (SELECT DISTINCT x.pk AS u, y.pk AS v
          |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
          |deg AS (SELECT node, count(*)::bigint AS deg
          |        FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
          |        GROUP BY 1),
          |o AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e0.u < e0.v)
          |                  THEN e0.u ELSE e0.v END AS src,
          |             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e0.u < e0.v)
          |                  THEN e0.v ELSE e0.u END AS dst
          |      FROM e0 JOIN deg du ON du.node = e0.u JOIN deg dv ON dv.node = e0.v),
          |w AS (SELECT a.dst AS u, b.dst AS v
          |      FROM o a JOIN o b ON a.src = b.src AND a.dst < b.dst)
          |SELECT (SELECT count(*)::bigint FROM deg) AS n_nodes,
          |       (SELECT count(*)::bigint FROM e0) AS n_edges,
          |       (SELECT count(*)::bigint FROM w) AS n_wedges,
          |       (SELECT count(*)::bigint FROM w JOIN e0 USING (u, v)) AS n_triangles""".stripMargin)),

    // Semi-supervised label propagation: a 10% audited seed labeling spread
    // over the symmetrized embedding kNN graph by two synchronous
    // majority-vote rounds (ties to the smallest label, seeds clamped,
    // unlabeled-neighbor nodes stay out) — how a 100 TB corpus inherits
    // topic/quality labels from a small hand-audited sample. Integer votes
    // + total tie order make the full labeling deterministic, so the oracle
    // unrolls both rounds over the same LSH kNN graph CTE; origin_round
    // records which round produced each node's FINAL value.
    ("graph_label_spread",
      (s: SparkSession, d: String) =>
        Artifacts.labelSpreadChain(Tables.embeddings(s, d)),
      Some(labelSpreadOracle)),

    // WARM twin of graph_label_spread: the propagated labeling loads from
    // the persisted artifact (Artifacts.labelSpread — built once per
    // (sf-dir, family), atomic-rename published) and serves as a PLAIN
    // PARQUET SCAN — zero exchanges, zero aggregates, no graph subtree —
    // gated on the SAME oracle as the training twin. This is how a
    // propagated corpus labeling is actually consumed at 100 TB: train on
    // the audited snapshot once, join the label table everywhere.
    ("graph_label_spread_served",
      (s: SparkSession, d: String) =>
        s.read.parquet(Artifacts.labelSpread(s, d))
          .select(col("node"), col("label"), col("is_seed"),
            col("origin_round")),
      Some(labelSpreadOracle)),

    // Incremental label ADMISSION — the dedup_incremental shape on the
    // graph family: the lowest-4/5 slice plays the already-propagated base
    // (2 full rounds, the graph_label_spread chain), the top 1/5 is the
    // arriving batch. New vectors take candidates from shared LSH buckets
    // (same planes), keep top-5 base neighbors by exact cosine, and inherit
    // the majority base label in ONE vote round — ingest-cost labeling,
    // never corpus-cost re-propagation. Audited new docs (vec_id % 10)
    // keep their own label, clamped. Eager scalar cut, same null-max empty
    // guard as dedup_incremental.
    ("graph_label_spread_incremental",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cutBoxed = emb.agg(floor(max(col("vec_id")) * 4 / 5).cast("long"))
          .head().getAs[java.lang.Long](0)
        if (cutBoxed == null)
          emb.filter(lit(false)).select(col("vec_id").as("node"),
            col("label").cast("int").as("label"), lit(1).as("is_seed"),
            lit(0L).as("n_votes"))
        else {
          val cut = cutBoxed.longValue()
          val old = emb.filter(col("vec_id") < cut)
          val nw = emb.filter(col("vec_id") >= cut)
          val oldLab = Artifacts.labelSpreadChain(old)
            .select(col("node"), col("label"))
          val newSeeds = nw.filter(col("vec_id") % 10 === 0)
            .select(col("vec_id").as("node"), col("label"))
          Graph.labelAdmit(old, oldLab, nw, newSeeds, "vec_id", "embedding",
            k = 5, nBands = 4, rowsPerBand = 2, dim = 64)
        }
      },
      Some(labelAdmitOracle)),

    // Min-max feature scaling: per-dimension corpus min/max fitted eagerly
    // to plan-time literals (the bm25-scalars pattern — no 1-row broadcast
    // join), transform stays a zero-shuffle projection. Scalar projections
    // + quantized checksum pin all 64 dims.
    ("emb_minmax_scale",
      (s: SparkSession, d: String) => {
        val dim = 64
        val emb = Tables.embeddings(s, d)
        val (mins, maxs) = Embeddings.minMaxStats(emb, col("embedding"), dim)
        val scaled = Embeddings.minMaxScale(col("embedding"), mins, maxs)
        emb.select(col("vec_id"),
          element_at(scaled, 1).as("s0"), element_at(scaled, 2).as("s1"),
          element_at(scaled, 3).as("s2"), element_at(scaled, 4).as("s3"),
          aggregate(transform(scaled, x => floor(x * lit(1048576.0)).cast("long")),
            lit(0L), (a, x) => a + x).as("qsum"))
      },
      Some {
        // aggregates cannot appear inside DuckDB lambdas — build the
        // min/max vectors as explicit per-dimension aggregate lists
        val mnList = (1 to 64).map(i => s"min(ve[$i])").mkString(", ")
        val mxList = (1 to 64).map(i => s"max(ve[$i])").mkString(", ")
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |stats AS (
          |  SELECT [$mnList] AS mn,
          |         [$mxList] AS mx
          |  FROM v),
          |sc AS (
          |  SELECT vec_id,
          |         list_transform(range(1, 65),
          |           i -> CASE WHEN mx[i] = mn[i] THEN 0.0
          |                ELSE (ve[i] - mn[i]) / (mx[i] - mn[i]) END) AS sv
          |  FROM v, stats)
          |SELECT vec_id, sv[1] AS s0, sv[2] AS s1, sv[3] AS s2, sv[4] AS s3,
          |       list_sum(list_transform(sv, x -> floor(x * 1048576.0)::bigint))::bigint AS qsum
          |FROM sc""".stripMargin
      }),

    // Robust per-group outlier profile: value quantized to exact longs so
    // n/Σq/Σq² are order-independent; mean/variance/z-threshold derived in
    // identical double arithmetic on both engines. The variance-aggregate
    // shape (sum/sum-of-squares through one exchange, stats broadcast back).
    ("events_outliers",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(col("event_type"),
          floor(col("value") * 1000).cast("long").as("q"))
        val stats = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
            sum(col("q") * col("q")).as("ss"))
          .withColumn("mean_q", col("s").cast("double") / col("n"))
          .withColumn("var_q",
            (col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n"))
              / col("n"))
          .select(col("event_type"), col("n"), col("mean_q"), col("var_q"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("is_out",
            (abs(col("q").cast("double") - col("mean_q")) >
              lit(1.5) * sqrt(col("var_q"))).cast("int"))
          .groupBy(col("event_type"), col("n"), col("mean_q"), col("var_q"))
          .agg(sum(col("is_out")).as("n_outliers"))
      },
      Some(
        """WITH ev AS (
          |  SELECT event_type, floor(value * 1000)::bigint AS q FROM events),
          |stats AS (
          |  SELECT event_type, count(*) AS n,
          |         cast(sum(q) AS double) / count(*) AS mean_q,
          |         (cast(sum(q * q) AS double)
          |            - cast(sum(q) AS double) * cast(sum(q) AS double) / count(*))
          |           / count(*) AS var_q
          |  FROM ev GROUP BY 1)
          |SELECT event_type, n, mean_q, var_q,
          |       sum(CASE WHEN abs(q::double - mean_q) > 1.5 * sqrt(var_q)
          |                THEN 1 ELSE 0 END)::bigint AS n_outliers
          |FROM ev JOIN stats USING (event_type)
          |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // ---- ANN scale path: hyperplane-LSH bucket assignment -----------------
    // Bucket id = sign bits of 8 md5-derived pseudo-random hyperplane
    // projections. Deterministic across engines: coefficients come from the
    // portable hash and both sides fold the projection sum left-to-right.
    ("sim_lsh_buckets",
      (s: SparkSession, d: String) =>
        Tables.embeddings(s, d).select(col("vec_id"),
          Similarity.lshBucket(Similarity.asDouble(col("embedding")), 8).as("bucket")),
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings)
          |SELECT vec_id,
          |       list_sum(list_transform(generate_series(0, 7), p ->
          |         CASE WHEN list_sum(list_transform(generate_series(0, 63), d ->
          |                ve[d + 1] * ((('0x' || substr(md5(p || ':' || d), 1, 15))::bigint
          |                              / 1.152921504606846976e18) * 2 - 1))) >= 0
          |              THEN cast(pow(2.0, p) AS bigint) ELSE 0 END))::bigint AS bucket
          |FROM v""".stripMargin)),

    // ---- ANN recall gates: approx top-k vs brute force, per query ---------
    // Both sides are deterministic (md5-derived planes/centroids, unique-id
    // tie-breaks), so recall itself is oracle-checkable: the DuckDB oracle
    // recomputes the approximate AND exact top-k and must land on the exact
    // same per-query hit counts.
    ("sim_recall_lsh",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        val brute = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.bucketedTopK(q, emb, "vec_id", "embedding", 5, nPlanes = 8)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      Some(
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |bk AS (
          |  SELECT vec_id,
          |         list_sum(list_transform(generate_series(0, 7), p ->
          |           CASE WHEN list_sum(list_transform(generate_series(0, len(ve) - 1), d ->
          |                  ve[d + 1] * ((('0x' || substr(md5(p || ':' || d), 1, 15))::bigint
          |                                / 1.152921504606846976e18) * 2 - 1))) >= 0
          |                THEN cast(pow(2.0, p) AS bigint) ELSE 0 END))::bigint AS bucket
          |  FROM v),
          |q AS (SELECT * FROM v WHERE vec_id < 10),
          |brute AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |             list_dot_product(q.ve, c.ve)
          |               / (sqrt(list_dot_product(q.ve, q.ve)) * sqrt(list_dot_product(c.ve, c.ve))) DESC,
          |             c.vec_id) AS rnk
          |    FROM q CROSS JOIN v c WHERE q.vec_id != c.vec_id)
          |  WHERE rnk <= 5),
          |approx AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |             list_dot_product(q.ve, c.ve)
          |               / (sqrt(list_dot_product(q.ve, q.ve)) * sqrt(list_dot_product(c.ve, c.ve))) DESC,
          |             c.vec_id) AS rnk
          |    FROM q
          |    JOIN bk qb ON qb.vec_id = q.vec_id
          |    JOIN bk cb ON cb.bucket = qb.bucket AND cb.vec_id != q.vec_id
          |    JOIN v c ON c.vec_id = cb.vec_id)
          |  WHERE rnk <= 5)
          |SELECT b.query_id,
          |       count(*) AS n_true,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_hit,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS double)
          |         / count(*) AS recall
          |FROM brute b
          |LEFT JOIN approx a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
          |GROUP BY 1""".stripMargin)),

    ("sim_recall_ivf",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        val brute = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
            nCells = 16, nProbe = 4)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      // Oracle replicates ivfTopK's DEFAULT path: two unrolled k-means
      // iterations (decimal-routed means, bit-exact) from the 16 lowest-id
      // seeds, then probe/assign against the trained cells c2.
      Some {
        def assign(cents: String, out: String) =
          s"""$out AS (SELECT vec_id, ve, cell_id FROM (
             |  SELECT v.vec_id, v.ve, c.cell_id,
             |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |           list_dot_product(v.ve, c.cellv)
             |             / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(c.cellv, c.cellv))) DESC,
             |           c.cell_id) AS rn
             |  FROM v CROSS JOIN $cents c) WHERE rn = 1)"""
        def update(from: String, out: String) =
          s"""$out AS (
             |  SELECT cell_id, list(cx ORDER BY dim) AS cellv FROM (
             |    SELECT cell_id, d AS dim,
             |           cast(sum(cast(ve[d + 1] AS decimal(30,15))) AS double) / count(*) AS cx
             |    FROM $from CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
             |    GROUP BY 1, 2)
             |  GROUP BY 1)"""
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::int AS cell_id, ve AS cellv
          |       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
          |${assign("c0", "a0")},
          |${update("a0", "c1")},
          |${assign("c1", "a1")},
          |${update("a1", "c2")},
          |ranked AS (
          |  SELECT v.vec_id, v.ve, c.cell_id,
          |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
          |           list_dot_product(v.ve, c.cellv)
          |             / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(c.cellv, c.cellv))) DESC,
          |           c.cell_id) AS cell_rank
          |  FROM v CROSS JOIN c2 c),
          |assigned AS (SELECT vec_id, ve, cell_id FROM ranked WHERE cell_rank = 1),
          |probes AS (SELECT vec_id, ve, cell_id FROM ranked WHERE cell_rank <= 4 AND vec_id < 10),
          |q AS (SELECT * FROM v WHERE vec_id < 10),
          |brute AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |             list_dot_product(q.ve, c.ve)
          |               / (sqrt(list_dot_product(q.ve, q.ve)) * sqrt(list_dot_product(c.ve, c.ve))) DESC,
          |             c.vec_id) AS rnk
          |    FROM q CROSS JOIN v c WHERE q.vec_id != c.vec_id)
          |  WHERE rnk <= 5),
          |approx AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY p.vec_id ORDER BY
          |             list_dot_product(p.ve, a.ve)
          |               / (sqrt(list_dot_product(p.ve, p.ve)) * sqrt(list_dot_product(a.ve, a.ve))) DESC,
          |             a.vec_id) AS rnk
          |    FROM probes p JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.vec_id)
          |  WHERE rnk <= 5)
          |SELECT b.query_id,
          |       count(*) AS n_true,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_hit,
          |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS double)
          |         / count(*) AS recall
          |FROM brute b
          |LEFT JOIN approx a ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
          |GROUP BY 1""".stripMargin
      }),

    // ---- IVF cell training: deterministic spherical k-means ---------------
    // Two fixed Lloyd iterations from lowest-id seeds; centroid means are
    // decimal-routed (order-independent), so the trained cells and the final
    // assignment are bit-exact reproducible — the DuckDB oracle unrolls the
    // same two iterations.
    ("sim_ivf_kmeans_cells",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
        Similarity.assignCells(emb, cent, "vec_id", "embedding")
          .select(col("vec_id"), col("cell_id"))
      },
      Some {
        def assign(cents: String, out: String) =
          s"""$out AS (SELECT vec_id, ve, cell_id FROM (
             |  SELECT v.vec_id, v.ve, c.cell_id,
             |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |           list_dot_product(v.ve, c.cellv)
             |             / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(c.cellv, c.cellv))) DESC,
             |           c.cell_id) AS rn
             |  FROM v CROSS JOIN $cents c) WHERE rn = 1)"""
        def update(from: String, out: String) =
          s"""$out AS (
             |  SELECT cell_id, list(cx ORDER BY dim) AS cellv FROM (
             |    SELECT cell_id, d AS dim,
             |           cast(sum(cast(ve[d + 1] AS decimal(30,15))) AS double) / count(*) AS cx
             |    FROM $from CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
             |    GROUP BY 1, 2)
             |  GROUP BY 1)"""
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
           |           FROM embeddings),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::int AS cell_id, ve AS cellv
           |       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
           |${assign("c0", "a0")},
           |${update("a0", "c1")},
           |${assign("c1", "a1")},
           |${update("a1", "c2")},
           |${assign("c2", "a2")}
           |SELECT vec_id, cell_id FROM a2""".stripMargin
      }),

    // Product quantization: per-subspace codebooks (joint Lloyd, m=4 × 16
    // dims, ksub=16, 2 iters) and the code each vector compresses to — the
    // IVF-PQ memory story at 100 TB (m small ints per vector in RAM instead
    // of dim floats). The oracle retrains both codebook iterations in CTEs.
    ("sim_pq_codes",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cents = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4,
          ksub = 16, iters = 2)
        Similarity.pqEncode(emb, cents, "vec_id", "embedding", m = 4)
      },
      Some(PqOracle.codesSql)),

    // Incremental re-encode: the snapshot diff (corpus_snapshot_diff's
    // schedule) picks the added/changed docs of crawl B, and ONLY those are
    // PQ-encoded against the STATIC codebook (collectCodebook +
    // pqEncodeStatic — the serving-side artifact path). The operational
    // shape of "re-embed only what changed": delta discovery is one
    // full-outer fingerprint join, the encode touches |delta| vectors, and
    // unchanged docs keep their stored codes.
    ("corpus_incremental_codes",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val a = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val b = docs.filter(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("fp"))
        val delta = Layout.snapshotDiff(a, b, "doc_id")
          .filter(col("status").isin("added", "changed"))
          .select(col("id").as("vec_id"))
        val codebook = Similarity.collectCodebook(
          Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 16,
            iters = 2))
        Similarity.pqEncodeStatic(emb.join(delta, Seq("vec_id")), codebook,
          "vec_id", "embedding", m = 4)
      },
      Some(PqOracle.incrementalCodesSql)),

    // ADC top-k over the PQ codes: query exact, corpus compressed, distance
    // = sum over subspaces of the precomputed query→codeword partial — the
    // lookup-table trick as a broadcast join, zero corpus shuffle before
    // the per-(query,vec) sum.
    ("sim_pq_adc_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cents = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4,
          ksub = 16, iters = 2)
        val codes = Similarity.pqEncode(emb, cents, "vec_id", "embedding", m = 4)
        Similarity.pqAdcTopK(emb.filter(col("vec_id") < 5), codes, cents,
          "vec_id", "embedding", m = 4, k = 5)
      },
      Some(PqOracle.adcSql)),

    // Recall gate for ADC: fraction of the exact L2 top-5 the compressed
    // search recovers, per query — the measured answer to "what does 32×
    // compression cost in quality", pinned cross-engine.
    ("sim_recall_pq",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cents = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4,
          ksub = 16, iters = 2)
        val codes = Similarity.pqEncode(emb, cents, "vec_id", "embedding", m = 4)
        val q = emb.filter(col("vec_id") < 5)
        val brute = Similarity.l2TopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.pqAdcTopK(q, codes, cents,
            "vec_id", "embedding", m = 4, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      Some(PqOracle.recallSql)),

    // ADC shortlist → exact re-rank: the production IVF-PQ serving shape —
    // compressed codes shortlist 50 candidates, only those touch full
    // vectors. The recall delta vs sim_recall_pq is the measured value of
    // re-ranking (compression's ordering noise concentrates near the
    // boundary, so a 10·k shortlist recovers most of it).
    ("sim_recall_pq_rerank",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val cents = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4,
          ksub = 16, iters = 2)
        val codes = Similarity.pqEncode(emb, cents, "vec_id", "embedding", m = 4)
        val q = emb.filter(col("vec_id") < 5)
        val brute = Similarity.l2TopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.pqRerankTopK(q, codes, cents, emb,
            "vec_id", "embedding", m = 4, shortlist = 50, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      Some(PqOracle.rerankRecallSql)),

    // The full IVF-PQ composite (IVFADC): coarse 16-cell quantizer →
    // integer residuals per inverted list → residual codebook → each query
    // probes its 4 nearest cells and ADC-scores ONLY their members. The
    // candidate space prunes to ~nProbe/nCells of the corpus before any
    // distance work — the 100 TB ANN serving shape. Oracle retrains both
    // quantizers and replays the probe + ADC chain in CTEs.
    ("sim_ivfpq_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfPqTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", m = 4, ksub = 16, iters = 2,
          nCells = 16, nProbe = 4, k = 5)
      },
      Some(PqOracle.ivfPqSql)),

    // The WARM twin of sim_ivfpq_topk: quantizers + packed codes are a
    // fixture-persisted artifact (Artifacts.ivfPq — trained once per
    // sf-dir/JVM at catalog construction, parquet round-trip), and the
    // returned frame is the pure serving plan: ivfPqSearchStatic's literal
    // probe + stream-static code join + projection ADC, then the sink-side
    // top-k rank. Gated on the SAME oracle as the training row — the
    // train/persist/reload/serve ladder must be indistinguishable from
    // training in-query. Bench's min-of-2 runs measures the warm shape;
    // run1 keeps the cold build+serve number (verdict-r11 item 2).
    ("sim_ivfpq_served",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 5)
        val (coarsePath, codebookPath, codesPath) = Artifacts.ivfPq(s, d)
        val coarse = Similarity.readCoarse(s, coarsePath)
        if (coarse.isEmpty)
          // empty corpus trains an empty coarse quantizer; the batch path
          // is empty-safe and yields the same (empty) shape
          Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", m = 4,
            ksub = 16, iters = 2, nCells = 16, nProbe = 4, k = 5)
        else {
          val cents = Similarity.readCodebook(s, codebookPath)
          val packed = s.read.parquet(codesPath)
          val cand = Similarity.ivfPqSearchStatic(q, packed, coarse, cents,
            "vec_id", "embedding", m = 4,
            nProbe = math.min(4, coarse.length))
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("adc_d2"), col("vec_id"))
          cand.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 5)
            .select(col("query_id"), col("rank"),
              col("vec_id").as("neighbor_id"), col("adc_d2"))
        }
      },
      Some(PqOracle.ivfPqSql)),

    // The complete production ANN query path: IVF-PQ probe → ADC shortlist
    // (50) → exact re-rank → recall vs brute. Re-ranking recovers ADC's
    // ordering noise; the residue is the probe's own membership ceiling
    // (raise nProbe, not shortlist, to move it) — the quality/cost dial a
    // 100 TB deployment actually turns, pinned cross-engine.
    ("sim_recall_ivfpq_rerank",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 5)
        val brute = Similarity.l2TopK(q, emb, "vec_id", "embedding", 5)
        val approx = Similarity.ivfPqRerankTopK(q, emb, "vec_id", "embedding",
            m = 4, ksub = 16, iters = 2, nCells = 16, nProbe = 4,
            shortlist = 50, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.select(col("query_id"), col("neighbor_id"))
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_true"))
      },
      Some(PqOracle.ivfPqRerankRecallSql)),

    // Frame sampling: n evenly spaced byte windows per payload — the video
    // keyframe-extraction dataflow with the codec swapped for a byte slice.
    // Payload is ASCII-safe test data, so DuckDB verifies via substring.
    ("multimodal_frames",
      (s: SparkSession, d: String) => {
        val withBin = Tables.documents(s, d).withColumn("bin", col("text").cast("binary"))
        Multimodal.sampleFrames(withBin, col("doc_id"), col("bin"), n = 4)
          .select(col("media_id"), col("frame_idx"),
            length(col("frame_bytes")).as("frame_len"),
            md5(col("frame_bytes")).as("frame_hash"))
      },
      Some(
        """SELECT doc_id AS media_id, i::int AS frame_idx,
          |       length(f)::int AS frame_len,
          |       md5(f) AS frame_hash
          |FROM (SELECT doc_id, i,
          |             substring(text, ((i * length(text)) // 4 + 1)::int, 16) AS f
          |      FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS i))""".stripMargin)),

    // Container decode with an OFFSET INDEX (toy GVID): variable-size GIMG
    // frames behind a uint32 index table, every 2nd frame located through
    // the index and header-decoded — offset indirection, the real-container
    // step past fixed-stride slicing. Spark must parse the actual bytes it
    // built (index + per-frame headers); the oracle recomputes the
    // generation SCHEDULE (the decode_header convention). Corrupt containers
    // (doc_id % 13, XVID magic) emit zero frames.
    ("multimodal_video_frames",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val n = (col("doc_id") % 4 + 1).cast("int")
        def w(i: Column) = ((col("doc_id") + lit(7L) * i) % 300 + 1).cast("int")
        def h(i: Column) = ((col("doc_id") + lit(11L) * i) % 200 + 1).cast("int")
        def pix(i: Column) = ((col("doc_id") + i) % 5).cast("int")
        def fsize(i: Column) = lit(9L) + pix(i).cast("long")
        def frame(i: Column) = concat(
          lit("GIMG".getBytes("US-ASCII")),
          unhex(lpad(hex(w(i)), 4, "0")),
          unhex(lpad(hex(h(i)), 4, "0")),
          unhex(lit("01")),
          lit("AAAA").substr(lit(1), pix(i)).cast("binary"))
        val idxSeq = sequence(lit(0), n - 1)
        def offset(i: Column) = aggregate(
          filter(idxSeq, j => j < i), lit(0L), (acc, j) => acc + fsize(j))
        val emptyBin = lit(Array.empty[Byte])
        val indexBytes = aggregate(
          transform(idxSeq, i => unhex(lpad(hex(offset(i)), 8, "0"))),
          emptyBin, (acc, b) => concat(acc, b))
        val framesBytes = aggregate(
          transform(idxSeq, i => frame(i)), emptyBin, (acc, b) => concat(acc, b))
        val magic = when(col("doc_id") % 13 === 0,
          lit("XVID".getBytes("US-ASCII")))
          .otherwise(lit("GVID".getBytes("US-ASCII")))
        val payload = concat(magic, unhex(lpad(hex(n), 4, "0")),
          indexBytes, framesBytes)
        Multimodal.videoFrameHeaders(docs.withColumn("payload", payload),
          col("doc_id"), col("payload"), stride = 2)
      },
      Some(
        """SELECT doc_id AS media_id, i::int AS frame_idx,
          |       ((doc_id + 7 * i) % 300 + 1)::double AS width,
          |       ((doc_id + 11 * i) % 200 + 1)::double AS height,
          |       1.0 AS channels,
          |       ((doc_id + i) % 5)::double AS n_pixel_bytes
          |FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
          |WHERE doc_id % 13 <> 0 AND i < doc_id % 4 + 1 AND i % 2 = 0""".stripMargin)),

    // ---- Multimodal plumbing: binary payload → metadata + stub features ---
    ("multimodal_features",
      (s: SparkSession, d: String) => {
        val withBin = Tables.documents(s, d).withColumn("bin", col("text").cast("binary"))
        Multimodal.extractFeatures(withBin, col("doc_id"), col("bin"))
          .select(col("media_id"), col("n_bytes"), col("content_hash"),
            col("features")(0).as("feature_0"), col("features")(1).as("feature_1"),
            col("features")(2).as("feature_2"), col("features")(3).as("feature_3"))
      },
      Some(
        """SELECT doc_id AS media_id,
          |       length(text)::int AS n_bytes,
          |       md5(text) AS content_hash,
          |       ('0x' || substr(md5('0:' || md5(text)), 1, 15))::bigint / 1.152921504606846976e18 AS feature_0,
          |       ('0x' || substr(md5('1:' || md5(text)), 1, 15))::bigint / 1.152921504606846976e18 AS feature_1,
          |       ('0x' || substr(md5('2:' || md5(text)), 1, 15))::bigint / 1.152921504606846976e18 AS feature_2,
          |       ('0x' || substr(md5('3:' || md5(text)), 1, 15))::bigint / 1.152921504606846976e18 AS feature_3
          |FROM documents""".stripMargin)),

    // A REAL decode through the MediaCodec seam: GIMG payloads (toy image
    // format — 4-byte magic, big-endian u16 dims, u8 channels, pixel bytes)
    // are constructed from documents, then header-parsed back by
    // GimgHeaderCodec via codegen'd substring/hex/conv — byte plumbing both
    // ways. Every 7th doc gets a corrupted magic and must take the -1
    // reject lane. The oracle never touches the bytes: it recomputes the
    // expected dimensions from the same doc_id arithmetic, so the decode is
    // checked against an INDEPENDENT derivation.
    ("multimodal_decode_header",
      (s: SparkSession, d: String) => {
        val w = (col("doc_id") % 300 + 1).cast("int")
        val h = (col("doc_id") % 200 + 1).cast("int")
        val ch = (col("doc_id") % 3 + 1).cast("int")
        val magic = when(col("doc_id") % 7 === 0, lit("XIMG")).otherwise(lit("GIMG"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(w), 4, "0")),
            unhex(lpad(hex(h), 4, "0")),
            unhex(lpad(hex(ch), 2, "0")),
            substring(col("text").cast("binary"), 1, 32)))
        Multimodal.extractFeatures(withPayload, col("doc_id"), col("payload"),
            Multimodal.GimgHeaderCodec())
          .select(col("media_id"),
            col("features")(0).as("width"), col("features")(1).as("height"),
            col("features")(2).as("channels"), col("features")(3).as("n_pixel_bytes"))
      },
      Some(
        """SELECT doc_id AS media_id,
          |       CASE WHEN doc_id % 7 = 0 THEN -1.0 ELSE (doc_id % 300 + 1)::double END AS width,
          |       CASE WHEN doc_id % 7 = 0 THEN -1.0 ELSE (doc_id % 200 + 1)::double END AS height,
          |       CASE WHEN doc_id % 7 = 0 THEN -1.0 ELSE (doc_id % 3 + 1)::double END AS channels,
          |       CASE WHEN doc_id % 7 = 0 THEN -1.0 ELSE least(32, length(text))::double END AS n_pixel_bytes
          |FROM documents""".stripMargin)),

    // A SECOND real decode through the MediaCodec seam — toy GAUD audio
    // (RIFF-header spirit: 4-byte magic, u32 BE sample rate, u16 BE
    // channels, 1-byte samples) — proving the seam generalizes across media
    // types. Every 5th doc gets a corrupted magic, every 4th has zero
    // channels; both take the -1 reject lane. The oracle recomputes the
    // expected header fields from the same doc_id arithmetic — an
    // independent derivation, never the bytes.
    ("multimodal_decode_audio",
      (s: SparkSession, d: String) => {
        val rate = (col("doc_id") % 48000 + 8000).cast("int")
        val ch = (col("doc_id") % 4).cast("int")
        val magic = when(col("doc_id") % 5 === 0, lit("XAUD")).otherwise(lit("GAUD"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(rate), 8, "0")),
            unhex(lpad(hex(ch), 4, "0")),
            substring(col("text").cast("binary"), 1, 24)))
        Multimodal.extractFeatures(withPayload, col("doc_id"), col("payload"),
            Multimodal.GaudHeaderCodec())
          .select(col("media_id"),
            col("features")(0).as("sample_rate"), col("features")(1).as("channels"),
            col("features")(2).as("n_sample_bytes"), col("features")(3).as("n_frames"))
      },
      Some(
        """SELECT doc_id AS media_id,
          |       CASE WHEN doc_id % 5 = 0 OR doc_id % 4 = 0 THEN -1.0
          |            ELSE (doc_id % 48000 + 8000)::double END AS sample_rate,
          |       CASE WHEN doc_id % 5 = 0 OR doc_id % 4 = 0 THEN -1.0
          |            ELSE (doc_id % 4)::double END AS channels,
          |       CASE WHEN doc_id % 5 = 0 OR doc_id % 4 = 0 THEN -1.0
          |            ELSE least(24, length(text))::double END AS n_sample_bytes,
          |       CASE WHEN doc_id % 5 = 0 OR doc_id % 4 = 0 THEN -1.0
          |            ELSE (least(24, length(text)) // (doc_id % 4))::double END AS n_frames
          |FROM documents""".stripMargin)),

    // Per-window audio frame features: the GAUD sample region cut into
    // 8-byte windows, each reduced to exact integer byte stats — the
    // energy-per-window extractor dataflow. Reject-lane payloads (bad
    // magic / zero channels) emit zero windows; the oracle recomputes the
    // same windows from the text bytes via character arithmetic (ASCII-safe
    // test data, the multimodal_frames precedent).
    ("multimodal_audio_frames",
      (s: SparkSession, d: String) => {
        val rate = (col("doc_id") % 48000 + 8000).cast("int")
        val ch = (col("doc_id") % 4).cast("int")
        val magic = when(col("doc_id") % 5 === 0, lit("XAUD")).otherwise(lit("GAUD"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(rate), 8, "0")),
            unhex(lpad(hex(ch), 4, "0")),
            substring(col("text").cast("binary"), 1, 24)))
        Multimodal.audioFrameFeatures(withPayload, col("doc_id"), col("payload"),
          windowBytes = 8)
      },
      Some(
        """WITH s AS (
          |  SELECT doc_id, substring(text, 1, 24) AS smp
          |  FROM documents
          |  WHERE doc_id % 5 <> 0 AND doc_id % 4 <> 0 AND length(text) > 0),
          |w AS (
          |  SELECT doc_id, i::int AS frame_idx,
          |         substring(smp, (i * 8 + 1)::int, 8) AS win
          |  FROM s CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          |  WHERE i * 8 < length(smp))
          |SELECT doc_id AS media_id, frame_idx,
          |       length(win)::int AS n_bytes,
          |       list_sum(list_transform(range(1, length(win) + 1),
          |         j -> ord(win[j])))::bigint AS byte_sum,
          |       list_min(list_transform(range(1, length(win) + 1),
          |         j -> ord(win[j])))::bigint AS byte_min,
          |       list_max(list_transform(range(1, length(win) + 1),
          |         j -> ord(win[j])))::bigint AS byte_max
          |FROM w""".stripMargin)),

    // Nearest-neighbor resize over complete GIMG images: the resized 2×2
    // raster is pinned by exact integer stats — the position-weighted byte
    // sum makes the sampled byte SEQUENCE observable, so a wrong
    // nearest-neighbor index cannot hide behind a matching total. Every 6th
    // doc gets a corrupted magic and every 9th a one-byte-short pixel
    // payload; both (and null texts) must take the -1 reject lane. The
    // oracle re-derives the sampling arithmetic over the text characters
    // (ASCII-safe test data, the multimodal_frames precedent).
    ("multimodal_resize",
      (s: SparkSession, d: String) => {
        val w = (col("doc_id") % 4 + 1).cast("long")
        val h = (col("doc_id") % 3 + 1).cast("long")
        val ch = (col("doc_id") % 2 + 1).cast("long")
        val full = (w * h * ch).cast("int")
        val pixLen = when(col("doc_id") % 9 === 0, full - 1).otherwise(full)
        val magic = when(col("doc_id") % 6 === 0, lit("XIMG")).otherwise(lit("GIMG"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(w), 4, "0")),
            unhex(lpad(hex(h), 4, "0")),
            unhex(lpad(hex(ch), 2, "0")),
            rpad(col("text"), 24, "x").cast("binary").substr(lit(1), pixLen)))
        Multimodal.imageResizeNearest(withPayload, col("doc_id"), col("payload"),
          outW = 2, outH = 2)
      },
      Some(
        """WITH px AS (
          |  SELECT doc_id,
          |         (doc_id % 4 + 1)::bigint AS w,
          |         (doc_id % 3 + 1)::bigint AS h,
          |         (doc_id % 2 + 1)::bigint AS ch,
          |         substring(rpad(text, 24, 'x'), 1,
          |           ((doc_id % 4 + 1) * (doc_id % 3 + 1) * (doc_id % 2 + 1))::int) AS pix
          |  FROM documents
          |  WHERE doc_id % 6 <> 0 AND doc_id % 9 <> 0 AND text IS NOT NULL),
          |v AS (
          |  SELECT doc_id, ch,
          |         flatten(list_transform(range(0, 4), p ->
          |           list_transform(range(0, ch), j ->
          |             ord(substr(pix,
          |               (((((p // 2) * h) // 2) * w + ((p % 2) * w) // 2) * ch + j + 1)::int,
          |               1))::bigint))) AS vals
          |  FROM px)
          |SELECT doc_id AS media_id,
          |       2::bigint AS out_w, 2::bigint AS out_h, ch AS channels,
          |       len(vals)::bigint AS n_out_bytes,
          |       list_sum(vals)::bigint AS byte_sum,
          |       list_sum(list_transform(range(1, len(vals) + 1),
          |         i -> (i - 1) * vals[i]))::bigint AS pos_weighted_sum,
          |       list_min(vals)::bigint AS byte_min,
          |       list_max(vals)::bigint AS byte_max
          |FROM v
          |UNION ALL
          |SELECT doc_id, -1, -1, -1, -1, -1, -1, -1, -1
          |FROM documents
          |WHERE doc_id % 6 = 0 OR doc_id % 9 = 0 OR text IS NULL""".stripMargin)),

    // Per-channel pixel stats (the mean-RGB / per-band-energy extractor):
    // channel k reads every C-th pixel-region byte. Odd docs carry a
    // one-byte-truncated payload and must still yield exact stats over their
    // COMPLETE pixels (decode-what's-there), while bad-magic docs (every
    // 5th) and null texts emit zero rows.
    ("multimodal_channel_stats",
      (s: SparkSession, d: String) => {
        val w = (col("doc_id") % 3 + 1).cast("long")
        val h = (col("doc_id") % 2 + 1).cast("long")
        val ch = (col("doc_id") % 3 + 1).cast("long")
        val pixLen = (w * h * ch - col("doc_id") % 2).cast("int")
        val magic = when(col("doc_id") % 5 === 0, lit("XIMG")).otherwise(lit("GIMG"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(w), 4, "0")),
            unhex(lpad(hex(h), 4, "0")),
            unhex(lpad(hex(ch), 2, "0")),
            rpad(col("text"), 18, "x").cast("binary").substr(lit(1), pixLen)))
        Multimodal.imageChannelStats(withPayload, col("doc_id"), col("payload"))
      },
      Some(
        """WITH px AS (
          |  SELECT doc_id,
          |         (doc_id % 3 + 1)::bigint AS w,
          |         (doc_id % 2 + 1)::bigint AS h,
          |         (doc_id % 3 + 1)::bigint AS ch,
          |         substring(rpad(text, 18, 'x'), 1,
          |           ((doc_id % 3 + 1) * (doc_id % 2 + 1) * (doc_id % 3 + 1)
          |             - doc_id % 2)::int) AS pix
          |  FROM documents
          |  WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
          |c AS (
          |  SELECT doc_id, ch, pix,
          |         least(w * h, length(pix) // ch)::bigint AS n_pix,
          |         unnest(range(0, ch)) AS channel
          |  FROM px)
          |SELECT doc_id AS media_id, channel::int AS channel, n_pix,
          |       list_sum(list_transform(range(0, n_pix),
          |         i -> ord(substr(pix, (i * ch + channel + 1)::int, 1))))::bigint AS byte_sum,
          |       list_min(list_transform(range(0, n_pix),
          |         i -> ord(substr(pix, (i * ch + channel + 1)::int, 1))))::bigint AS byte_min,
          |       list_max(list_transform(range(0, n_pix),
          |         i -> ord(substr(pix, (i * ch + channel + 1)::int, 1))))::bigint AS byte_max
          |FROM c WHERE n_pix > 0""".stripMargin)),

    // Multimodal → ANN composition: decode → per-channel feature vector →
    // quantized-bucket candidates → exact-L1 verify. Same synthesized GIMG
    // corpus as multimodal_channel_stats (reject lane included: bad-magic
    // and null-text docs contribute no features and so no pairs); duplicate
    // text families give l1 = 0 hits, near-prefix families small-l1 pairs.
    ("multimodal_near_dup",
      (s: SparkSession, d: String) => {
        val w = (col("doc_id") % 3 + 1).cast("long")
        val h = (col("doc_id") % 2 + 1).cast("long")
        val ch = (col("doc_id") % 3 + 1).cast("long")
        val pixLen = (w * h * ch - col("doc_id") % 2).cast("int")
        val magic = when(col("doc_id") % 5 === 0, lit("XIMG")).otherwise(lit("GIMG"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(w), 4, "0")),
            unhex(lpad(hex(h), 4, "0")),
            unhex(lpad(hex(ch), 2, "0")),
            rpad(col("text"), 18, "x").cast("binary").substr(lit(1), pixLen)))
        Multimodal.imageNearDup(withPayload, col("doc_id"), col("payload"))
      },
      Some(
        """WITH px AS (
          |  SELECT doc_id,
          |         (doc_id % 3 + 1)::bigint AS w,
          |         (doc_id % 2 + 1)::bigint AS h,
          |         (doc_id % 3 + 1)::bigint AS ch,
          |         substring(rpad(text, 18, 'x'), 1,
          |           ((doc_id % 3 + 1) * (doc_id % 2 + 1) * (doc_id % 3 + 1)
          |             - doc_id % 2)::int) AS pix
          |  FROM documents
          |  WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
          |f AS (
          |  SELECT doc_id, w, h, ch, pix,
          |         least(w * h, length(pix) // ch)::bigint AS n_pix
          |  FROM px),
          |fv AS (
          |  SELECT doc_id, w, h, ch,
          |         list_transform(range(0, ch), k ->
          |           list_sum(list_transform(range(0, n_pix),
          |             i -> ord(substr(pix, (i * ch + k + 1)::int, 1))))::bigint) AS fvec
          |  FROM f WHERE n_pix > 0),
          |bk AS (
          |  SELECT doc_id, fvec,
          |         w::varchar || ':' || h::varchar || ':' || ch::varchar || ':' ||
          |           array_to_string(list_transform(fvec, s -> (s // 64)::varchar), ',') AS bucket
          |  FROM fv)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       list_sum(list_transform(range(1, len(a.fvec) + 1),
          |         i -> abs(a.fvec[i] - b.fvec[i])))::bigint AS l1,
          |       (CASE WHEN list_sum(list_transform(range(1, len(a.fvec) + 1),
          |               i -> abs(a.fvec[i] - b.fvec[i]))) <= 24
          |             THEN 1 ELSE 0 END)::int AS near_dup
          |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin)),

    // Audio → ANN composition (the multimodal_near_dup precedent on the
    // second modality): GAUD decode → per-8-byte-window energy vector →
    // quantized-bucket candidates → exact-L1 verify. Same synthesized GAUD
    // corpus as multimodal_audio_frames (reject lane included: bad-magic,
    // zero-channel and empty-text docs contribute no features and so no
    // pairs); duplicate text families give l1 = 0 hits, near-prefix
    // families small-l1 pairs.
    ("multimodal_audio_near_dup",
      (s: SparkSession, d: String) => {
        val rate = (col("doc_id") % 48000 + 8000).cast("int")
        val ch = (col("doc_id") % 4).cast("int")
        val magic = when(col("doc_id") % 5 === 0, lit("XAUD")).otherwise(lit("GAUD"))
        val withPayload = Tables.documents(s, d).withColumn("payload",
          concat(magic.cast("binary"),
            unhex(lpad(hex(rate), 8, "0")),
            unhex(lpad(hex(ch), 4, "0")),
            substring(col("text").cast("binary"), 1, 24)))
        Multimodal.audioNearDup(withPayload, col("doc_id"), col("payload"))
      },
      Some(
        """WITH s AS (
          |  SELECT doc_id, substring(text, 1, 24) AS smp
          |  FROM documents
          |  WHERE doc_id % 5 <> 0 AND doc_id % 4 <> 0 AND length(text) > 0),
          |w AS (
          |  SELECT doc_id, i::int AS frame_idx,
          |         substring(smp, (i * 8 + 1)::int, 8) AS win
          |  FROM s CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          |  WHERE i * 8 < length(smp)),
          |fv AS (
          |  SELECT doc_id, list(wsum ORDER BY frame_idx) AS fvec
          |  FROM (SELECT doc_id, frame_idx,
          |               list_sum(list_transform(range(1, length(win) + 1),
          |                 j -> ord(win[j])))::bigint AS wsum
          |        FROM w)
          |  GROUP BY doc_id),
          |bk AS (
          |  SELECT doc_id, fvec,
          |         len(fvec)::varchar || ':' ||
          |           array_to_string(list_transform(fvec,
          |             s -> (s // 64)::varchar), ',') AS bucket
          |  FROM fv)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       list_sum(list_transform(range(1, len(a.fvec) + 1),
          |         i -> abs(a.fvec[i] - b.fvec[i])))::bigint AS l1,
          |       (CASE WHEN list_sum(list_transform(range(1, len(a.fvec) + 1),
          |               i -> abs(a.fvec[i] - b.fvec[i]))) <= 24
          |             THEN 1 ELSE 0 END)::int AS near_dup
          |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin)),

    // Video → ANN composition, completing the modality triple: GVID
    // container parse → per-frame pixel reads through the uint32 OFFSET
    // INDEX → per-frame byte-sum energy vector → quantized-bucket
    // candidates → exact-L1 verify. Frames are 2×2×1 GIMG blobs whose
    // pixels come from text slices at a doc-dependent start offset
    // (doc_id % 4 — the multimodal_near_dup pixLen precedent: it splits
    // exact-duplicate text families across buckets so the pair space stays
    // honest instead of collapsing whole families into one bucket; without
    // it this row emitted 1.67M pairs at sf0.1). Frames are fixed 13-byte
    // blobs, so offset(i) = 13i — but Spark must READ the offsets from the
    // index bytes it built, the multimodal_video_frames convention; the
    // oracle recomputes the generation schedule from the text, never the
    // bytes. Corrupt containers (doc_id % 13, XVID magic) and null texts
    // emit no features and so no pairs.
    ("multimodal_video_near_dup",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val n = (col("doc_id") % 3 + 1).cast("int")
        def frame(i: Column) = concat(
          lit("GIMG".getBytes("US-ASCII")),
          unhex(lit("0002")),
          unhex(lit("0002")),
          unhex(lit("01")),
          rpad(col("text"), 16, "x").cast("binary")
            .substr(i.cast("int") * 4 + (col("doc_id") % 4 + 1).cast("int"), lit(4)))
        val idxSeq = sequence(lit(0L), (n - 1).cast("long"))
        val emptyBin = lit(Array.empty[Byte])
        val indexBytes = aggregate(
          transform(idxSeq, i => unhex(lpad(hex(i * 13L), 8, "0"))),
          emptyBin, (acc, b) => concat(acc, b))
        val framesBytes = aggregate(
          transform(idxSeq, i => frame(i)), emptyBin, (acc, b) => concat(acc, b))
        val magic = when(col("doc_id") % 13 === 0,
          lit("XVID".getBytes("US-ASCII")))
          .otherwise(lit("GVID".getBytes("US-ASCII")))
        val payload = concat(magic, unhex(lpad(hex(n), 4, "0")),
          indexBytes, framesBytes)
        // materialize the SYNTHETIC container bytes before decoding: the
        // index/frames construction is an aggregate-HOF expression, and the
        // operator's ~30 payload references would each re-evaluate it
        // (measured 18 s vs 3 s at sf0.1). A real deployment reads payloads
        // from storage — a materialized binary column — which is exactly
        // what the checkpoint restores here; the operator itself stays a
        // pure plan.
        Multimodal.videoNearDup(
          docs.withColumn("payload", payload)
            .select(col("doc_id"), col("payload")).localCheckpoint(),
          col("doc_id"), col("payload"), quant = 8L)
      },
      Some(
        """WITH p AS (
          |  SELECT doc_id, (doc_id % 3 + 1)::int AS n, rpad(text, 16, 'x') AS px
          |  FROM documents
          |  WHERE doc_id % 13 <> 0 AND text IS NOT NULL),
          |fv AS (
          |  SELECT doc_id,
          |         list_transform(range(0, n), i ->
          |           list_sum(list_transform(
          |             range((i * 4 + doc_id % 4 + 1)::int, (i * 4 + doc_id % 4 + 5)::int),
          |             j -> ord(px[j])))::bigint) AS fvec
          |  FROM p),
          |bk AS (
          |  SELECT doc_id, fvec,
          |         len(fvec)::varchar || ':' ||
          |           array_to_string(list_transform(fvec,
          |             s -> (s // 8)::varchar), ',') AS bucket
          |  FROM fv)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       list_sum(list_transform(range(1, len(a.fvec) + 1),
          |         i -> abs(a.fvec[i] - b.fvec[i])))::bigint AS l1,
          |       (CASE WHEN list_sum(list_transform(range(1, len(a.fvec) + 1),
          |               i -> abs(a.fvec[i] - b.fvec[i]))) <= 24
          |             THEN 1 ELSE 0 END)::int AS near_dup
          |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin)),

    // Cross-modal asset dedup: which standalone GIMG images appear as frames
    // inside GVID videos — exact content identity through a (shape, md5)
    // digest equi-join, pixels projected away before the shuffle (the CAS
    // join shape; see Multimodal.videoImageMatch). Content schedule: both
    // modalities draw 4-byte pixel blocks from md5(source ':' n_chars), a
    // seed whose collision families stay small (max 4 docs at sf0.1 — the
    // video_near_dup pair-space lesson, checked in DuckDB before adoption:
    // 422 matches at sf0.01, 5 824 at sf0.1), while still producing genuine
    // cross-document matches at both gate scales. Videos take frame i's
    // block at offset 4i; image docs take block doc_id % 3 — so an image
    // matches the frame of every same-seed video at its block index.
    // Corrupt containers (XVID via doc_id % 13, XIMG via doc_id % 7) and
    // null texts contribute no keys and so no matches.
    ("multimodal_video_image_match",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val seedHex = md5(concat(col("source"), lit(":"),
          col("n_chars").cast("string")))
        val n = (col("doc_id") % 3 + 1).cast("int")
        def frame(i: Column) = concat(
          lit("GIMG".getBytes("US-ASCII")),
          unhex(lit("0002")), unhex(lit("0002")), unhex(lit("01")),
          seedHex.substr((i.cast("int") * 4 + 1), lit(4)).cast("binary"))
        val idxSeq = sequence(lit(0L), (n - 1).cast("long"))
        val emptyBin = lit(Array.empty[Byte])
        val indexBytes = aggregate(
          transform(idxSeq, i => unhex(lpad(hex(i * 13L), 8, "0"))),
          emptyBin, (acc, b) => concat(acc, b))
        val framesBytes = aggregate(
          transform(idxSeq, i => frame(i)), emptyBin, (acc, b) => concat(acc, b))
        val vMagic = when(col("doc_id") % 13 === 0,
          lit("XVID".getBytes("US-ASCII")))
          .otherwise(lit("GVID".getBytes("US-ASCII")))
        val iMagic = when(col("doc_id") % 7 === 0,
          lit("XIMG".getBytes("US-ASCII")))
          .otherwise(lit("GIMG".getBytes("US-ASCII")))
        // materialize both synthesized payload tables before decoding (the
        // aggregate-HOF re-evaluation lesson pinned on video_near_dup)
        val videos = docs
          .withColumn("payload", concat(vMagic, unhex(lpad(hex(n), 4, "0")),
            indexBytes, framesBytes))
          .select(col("doc_id"), col("payload")).localCheckpoint()
        val images = docs
          .withColumn("payload", concat(iMagic,
            unhex(lit("0002")), unhex(lit("0002")), unhex(lit("01")),
            seedHex.substr(((col("doc_id") % 3) * 4 + 1).cast("int"), lit(4))
              .cast("binary")))
          .select(col("doc_id"), col("payload")).localCheckpoint()
        Multimodal.videoImageMatch(videos, col("doc_id"), col("payload"),
          images, col("doc_id"), col("payload"))
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id, md5(source || ':' || n_chars::varchar) AS seed
          |  FROM documents WHERE text IS NOT NULL),
          |vf AS (
          |  SELECT doc_id AS video_id, i::int AS frame_idx,
          |         substring(seed, (i * 4 + 1)::int, 4) AS pix
          |  FROM d CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          |  WHERE doc_id % 13 <> 0 AND i < doc_id % 3 + 1),
          |im AS (
          |  SELECT doc_id AS image_id,
          |         substring(seed, ((doc_id % 3) * 4 + 1)::int, 4) AS pix
          |  FROM d WHERE doc_id % 7 <> 0)
          |SELECT video_id, frame_idx, image_id,
          |       2::bigint AS w, 2::bigint AS h, 1::bigint AS channels
          |FROM vf JOIN im USING (pix)""".stripMargin)),

    // Cross-modal NEAR-dup (Multimodal.crossModalNearDup — verdict-r14
    // item 4): standalone images that are RESIZED copies of video frames,
    // the case the digest join above can never see. Images here are 4×4
    // nearest-neighbor 2× upscales of a 2×2 frame block — the grid-mean
    // fingerprint (per-channel region means, exact scaled longs) is
    // bit-identical across the rescale, so the (channels, quantized
    // fingerprint) bucket join finds them WITHOUT width/height in the key,
    // and the exact-L1 verify grades near-but-not-identical seeds. Pair
    // space DuckDB-checked before adoption: 1 230 candidates / 1 132 near
    // (422 exact) at sf0.01; 83k / 74k (5 824 exact) at sf0.1 — Σ|bucket|²
    // stays linear in the corpus.
    ("multimodal_cross_near_dup",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val seedHex = md5(concat(col("source"), lit(":"),
          col("n_chars").cast("string")))
        val n = (col("doc_id") % 3 + 1).cast("int")
        def frame(i: Column) = concat(
          lit("GIMG".getBytes("US-ASCII")),
          unhex(lit("0002")), unhex(lit("0002")), unhex(lit("01")),
          seedHex.substr((i.cast("int") * 4 + 1), lit(4)).cast("binary"))
        val idxSeq = sequence(lit(0L), (n - 1).cast("long"))
        val emptyBin = lit(Array.empty[Byte])
        val indexBytes = aggregate(
          transform(idxSeq, i => unhex(lpad(hex(i * 13L), 8, "0"))),
          emptyBin, (acc, b) => concat(acc, b))
        val framesBytes = aggregate(
          transform(idxSeq, i => frame(i)), emptyBin, (acc, b) => concat(acc, b))
        val vMagic = when(col("doc_id") % 13 === 0,
          lit("XVID".getBytes("US-ASCII")))
          .otherwise(lit("GVID".getBytes("US-ASCII")))
        val iMagic = when(col("doc_id") % 7 === 0,
          lit("XIMG".getBytes("US-ASCII")))
          .otherwise(lit("GIMG".getBytes("US-ASCII")))
        val videos = docs
          .withColumn("payload", concat(vMagic, unhex(lpad(hex(n), 4, "0")),
            indexBytes, framesBytes))
          .select(col("doc_id"), col("payload")).localCheckpoint()
        // image = NN 2× upscale of block (doc_id % 3): pixel p of the 4×4
        // copies source char (row div 2)·2 + (col div 2) of the block
        val blockStart = ((col("doc_id") % 3) * 4 + 1).cast("int")
        val pix = concat_ws("", (0 until 16).map { p =>
          val b = (p / 4 / 2) * 2 + (p % 4 / 2)
          seedHex.substr(blockStart + b, lit(1))
        }: _*).cast("binary")
        val images = docs
          .withColumn("payload", concat(iMagic,
            unhex(lit("0004")), unhex(lit("0004")), unhex(lit("01")), pix))
          .select(col("doc_id"), col("payload")).localCheckpoint()
        Multimodal.crossModalNearDup(videos, col("doc_id"), col("payload"),
          images, col("doc_id"), col("payload"), grid = 2, meanScale = 16L,
          quant = 64L, maxL1 = 96L)
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id, md5(source || ':' || n_chars::varchar) AS seed
          |  FROM documents WHERE text IS NOT NULL),
          |vf AS (
          |  SELECT doc_id AS video_id, i::int AS frame_idx,
          |         list_transform(range((i * 4 + 1)::int, (i * 4 + 5)::int),
          |           j -> ord(substring(seed, j, 1))::bigint * 16) AS fvec
          |  FROM d CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
          |  WHERE doc_id % 13 <> 0 AND i < doc_id % 3 + 1),
          |im AS (
          |  SELECT doc_id AS image_id,
          |         list_transform(range(((doc_id % 3) * 4 + 1)::int,
          |                              ((doc_id % 3) * 4 + 5)::int),
          |           j -> ord(substring(seed, j, 1))::bigint * 16) AS fvec
          |  FROM d WHERE doc_id % 7 <> 0),
          |vb AS (
          |  SELECT *, array_to_string(list_transform(fvec,
          |           s -> (s // 64)::varchar), ',') AS bucket
          |  FROM vf),
          |ib AS (
          |  SELECT *, array_to_string(list_transform(fvec,
          |           s -> (s // 64)::varchar), ',') AS bucket
          |  FROM im)
          |SELECT v.video_id, v.frame_idx, i.image_id,
          |       list_sum(list_transform(range(1, 5),
          |         k -> abs(v.fvec[k] - i.fvec[k])))::bigint AS l1,
          |       (CASE WHEN list_sum(list_transform(range(1, 5),
          |               k -> abs(v.fvec[k] - i.fvec[k]))) <= 96
          |             THEN 1 ELSE 0 END)::int AS near_dup
          |FROM vb v JOIN ib i USING (bucket)""".stripMargin)),

    // ==========================================================================
    // Web-corpus curation: URL canonicalization, URL dedup, domain rollups
    // ==========================================================================

    // URLs are synthesized from doc_id arithmetic (the multimodal_decode
    // precedent) with every normalization hazard present: mixed case,
    // explicit :443, trailing slashes, #fragments, tracking-only query
    // strings, an occasionally-kept real parameter, and a multi-label
    // public suffix. The oracle re-derives the CANONICAL form from the
    // same arithmetic — an independent derivation that never runs the
    // normalizer.
    ("web_url_normalize",
      (s: SparkSession, d: String) => {
        val url = webUrl()
        Tables.documents(s, d)
          .select(col("doc_id"), Web.normalizeUrl(url).as("url_norm"),
            Web.hostOf(url).as("host"),
            Web.registeredDomain(Web.hostOf(url)).as("registered_domain"))
      },
      Some(
        s"""WITH u AS ($webUrlCanonCte)
          |SELECT doc_id, concat('https://', host, path, q) AS url_norm,
          |       host, registered_domain
          |FROM u""".stripMargin)),

    // URL-level exact dedup, the C4 first pass: one keeper (min doc_id)
    // per canonical URL + the collapsed-copy count. The synthesized key
    // space is deliberately smaller than the corpus so real collisions
    // exist — case/port/slash/tracking variants of one page collapse.
    ("web_url_dedup",
      (s: SparkSession, d: String) =>
        Web.urlDedup(Tables.documents(s, d), col("doc_id"), webUrl()),
      Some(
        s"""WITH u AS ($webUrlCanonCte)
          |SELECT concat('https://', host, path, q) AS url_norm,
          |       min(doc_id) AS doc_id, count(*) AS n_copies
          |FROM u GROUP BY 1""".stripMargin)),

    // Per-registered-domain rollup: the table domain allow/block lists and
    // per-domain sampling budgets key on. n_docs > n_urls shows crawl
    // near-duplicate pressure per domain.
    ("web_domain_stats",
      (s: SparkSession, d: String) =>
        Web.domainStats(Tables.documents(s, d), col("doc_id"), webUrl(),
          col("n_chars")),
      Some(
        s"""WITH u AS ($webUrlCanonCte)
          |SELECT registered_domain, count(*) AS n_docs,
          |       count(DISTINCT concat('https://', host, path, q)) AS n_urls,
          |       sum(n_chars)::bigint AS total_chars
          |FROM u GROUP BY 1""".stripMargin)),

    // Sub-document exact dedup (the C4 span-level pass): every 4th doc gets
    // a 16-token boilerplate header — exactly two 8-token chunks, so the
    // corpus-wide keeper election must collapse ~125 copies of each to one
    // while the organic chunks survive. The oracle re-runs the whole chain
    // (tile → keeper election → per-doc reassembly) in CTEs, with the
    // kept-text md5 pinning chunk ORDER, not just membership.
    ("dedup_paragraphs",
      (s: SparkSession, d: String) => {
        val boiler = "terms of service apply all rights reserved contact us " +
          "for more information today please read carefully"
        val withBoiler = Tables.documents(s, d).withColumn("text2",
          when(col("doc_id") % 4 === 0, concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")))
        Dedup.paragraphDedup(withBoiler, col("text2"), col("doc_id"),
          chunkTokens = 8)
      },
      Some(
        """WITH d2 AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 4 = 0
          |           THEN concat('terms of service apply all rights reserved ',
          |                       'contact us for more information today ',
          |                       'please read carefully ', text)
          |           ELSE text END AS text
          |  FROM documents),
          |toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
          |                      ' ') AS t
          |  FROM d2),
          |ch AS (
          |  SELECT doc_id, i::int AS chunk_id,
          |         array_to_string(t[(i * 8 + 1)::int:(i * 8 + 8)::int], ' ') AS chunk_text,
          |         least(8, len(t) - i * 8)::int AS chunk_tokens
          |  FROM toks CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
          |  WHERE i = 0 OR i * 8 < len(t)),
          |k AS (
          |  SELECT *, row_number() OVER (PARTITION BY chunk_text
          |                               ORDER BY doc_id, chunk_id) AS rn
          |  FROM ch)
          |SELECT doc_id, count(*) AS n_chunks,
          |       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::bigint AS n_kept,
          |       sum(CASE WHEN rn = 1 THEN chunk_tokens ELSE 0 END)::bigint AS kept_tokens,
          |       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END,
          |                               ' ' ORDER BY chunk_id), ''))
          |         AS kept_text_hash
          |FROM k GROUP BY doc_id""".stripMargin)),

    // Per-doc top-3 salient terms by integer-exact tf-idf: rational idf
    // floor(n_docs·2^20/df) (no cross-engine ln), dfCap=380 drops the
    // near-universal stopword-like terms (most of this corpus's 31-term
    // vocabulary sits at df≈380-402 of 500 docs), term-ascending tie-break
    // pins the top-k set bit-stable.
    ("text_tfidf_topk",
      (s: SparkSession, d: String) =>
        TextOps.tfidfTopTerms(Tables.documents(s, d), col("text"),
          col("doc_id"), k = 3, minDf = 1L, dfCap = 380L),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
          |                             ' ')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY 1, 2),
          |dft AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY 1
          |        HAVING count(*) BETWEEN 1 AND 380),
          |n AS (SELECT count(*)::bigint AS n_docs FROM documents),
          |s AS (
          |  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
          |         tf.tf * ((n.n_docs * 1048576) // dft.df) AS score_scaled
          |  FROM tf JOIN dft USING (term) CROSS JOIN n),
          |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |                                   ORDER BY score_scaled DESC, term) AS rank
          |      FROM s)
          |SELECT doc_id, rank::int AS rank, term, tf, df, score_scaled::bigint AS score_scaled
          |FROM r WHERE rank <= 3""".stripMargin)),

    // ==========================================================================
    // Window-shape coverage beyond the reference: sliding + session windows
    // ==========================================================================

    // Sliding window: 10-minute windows every 5 minutes — each event lands in
    // exactly two windows (duration/slide = 2).
    ("events_sliding_stats",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"))
          .select(ntz(col("window.start")).as("window_start"),
            ntz(col("window.end")).as("window_end"),
            col("event_type"), col("n_events"), col("sum_value")),
      Some(
        """SELECT time_bucket(INTERVAL 5 MINUTES, ts) - to_minutes(k * 5) AS window_start,
          |       time_bucket(INTERVAL 5 MINUTES, ts) - to_minutes(k * 5) + INTERVAL 10 MINUTES AS window_end,
          |       event_type, count(*) AS n_events,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
          |FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k)
          |GROUP BY 1, 2, 3""".stripMargin)),

    // Arbitrary GROUPING SETS through the SQL frontend (the DataFrame API
    // only exposes cube/rollup): per-type, per-(type, day), and grand total
    // in one pass, with GROUPING() disambiguating the null-key rows.
    ("events_grouping_sets",
      (s: SparkSession, d: String) => {
        // unique per-call view name, dropped after the (eager) analysis binds
        // the plan — no session-catalog leak, no cross-build race
        val view = s"graft_events_gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        Tables.events(s, d).createOrReplaceTempView(view)
        try {
          s.sql(
            s"""SELECT event_type, date_trunc('DAY', ts) AS day,
              |       grouping(event_type) AS g_type, grouping(date_trunc('DAY', ts)) AS g_day,
              |       count(*) AS n, cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
              |FROM $view
              |GROUP BY GROUPING SETS ((event_type), (event_type, date_trunc('DAY', ts)), ())
              |""".stripMargin)
            .withColumn("day", ntz(col("day")))
            .withColumn("g_type", col("g_type").cast("int"))
            .withColumn("g_day", col("g_day").cast("int"))
        } finally s.catalog.dropTempView(view)
      },
      Some(
        """SELECT event_type, date_trunc('DAY', ts) AS day,
          |       grouping(event_type)::int AS g_type,
          |       grouping(date_trunc('DAY', ts))::int AS g_day,
          |       count(*) AS n, cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
          |FROM events
          |GROUP BY GROUPING SETS ((event_type), (event_type, date_trunc('DAY', ts)), ())
          |HAVING count(*) > 0""".stripMargin)),
    // ^ HAVING pins Spark's empty-input semantics (the () set emits no row
    //   over zero input rows); no-op on any non-empty input — see events_cube.

    // Time-range window frame: per-user trailing one-hour totals at every
    // event — RANGE frames over event time (not row counts), the shape row
    // frames cannot express when events are irregularly spaced.
    ("events_trailing_hour",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        // frame boundaries in epoch MICROS on both engines: Spark reads the
        // ns-precision parquet truncated to µs, so the oracle casts its
        // TIMESTAMP_NS view down to µs too — otherwise a pair spaced within
        // 1 µs of exactly one hour lands in different frames
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.events(s, d).select(col("event_id"), col("user_id"),
            ntz(col("ts")).as("ts"),
            count(lit(1)).over(w).as("n_trailing_hour"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
              .as("sum_trailing_hour"))
      },
      Some(
        """SELECT event_id, user_id, ts,
          |       count(*) OVER w AS n_trailing_hour,
          |       cast(sum(cast(value AS decimal(18,2))) OVER w AS double) AS sum_trailing_hour
          |FROM (SELECT event_id, user_id, ts::timestamp AS ts, value FROM events)
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Exponentially time-decayed per-user activity: each event weighted
    // 2^-floor(age_hours) relative to the user's LATEST event — the recency
    // signal feature stores keep (EMA-style engagement) in integer-exact
    // form: weights are exact powers of two scaled by 2^30, so the per-user
    // sum is an order-independent long. The CASE clamps k before the shift
    // (both engines mask shift amounts mod 64 — an unguarded `>> k` at
    // k ≥ 64 silently wraps). One window + one aggregation, both on the
    // user_id exchange.
    ("events_decayed_counts",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tu"))
          .withColumn("tmax", max(col("tu")).over(w))
          .withColumn("k", expr("(tmax - tu) div 3600000000"))
          .withColumn("ws",
            expr("CASE WHEN k >= 31 THEN 0L ELSE shiftright(1073741824L, cast(k AS int)) END"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("ws")).as("decayed_scaled"))
          .withColumn("decayed",
            col("decayed_scaled").cast("double") / lit(1073741824.0))
      },
      Some(
        """WITH e AS (SELECT user_id, epoch_us(ts::timestamp) AS tu FROM events),
          |m AS (SELECT user_id, tu,
          |             max(tu) OVER (PARTITION BY user_id) AS tmax FROM e),
          |k AS (SELECT user_id, (tmax - tu) // 3600000000 AS k FROM m),
          |w AS (SELECT user_id,
          |             CASE WHEN k >= 31 THEN 0
          |                  ELSE 1073741824 >> k END AS ws FROM k)
          |SELECT user_id, count(*)::bigint AS n_events,
          |       sum(ws)::bigint AS decayed_scaled,
          |       sum(ws) / 1073741824.0 AS decayed
          |FROM w GROUP BY 1""".stripMargin)),

    // Session window: 30-minute inactivity gap per user; session end = last
    // event + gap (Spark session_window semantics, reproduced via a
    // lag/cumsum session id in the oracle).
    ("events_session_windows",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"))
          .select(col("user_id"),
            ntz(col("session_window.start")).as("session_start"),
            ntz(col("session_window.end")).as("session_end"),
            col("n_events"), col("sum_value")),
      Some(
        """WITH o AS (
          |  SELECT user_id, ts, value,
          |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          |                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTES
          |              THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |s AS (
          |  SELECT user_id, ts, value,
          |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM o)
          |SELECT user_id, min(ts) AS session_start,
          |       max(ts) + INTERVAL 30 MINUTES AS session_end,
          |       count(*) AS n_events,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
          |FROM s GROUP BY user_id, sid""".stripMargin)),

    // ==========================================================================
    // Relational breadth: rollup, pivot, semi/anti joins, set ops, as-of join
    // ==========================================================================

    ("events_rollup",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
          .rollup(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"),
            grouping(col("event_type")).as("g1"), grouping(col("hr")).as("g2"))
          .select(
            when(col("g1") === 1, lit("(all)")).otherwise(col("event_type")).as("event_type"),
            when(col("g2") === 1, lit(-1)).otherwise(col("hr")).cast("int").as("hr"),
            col("n_events"), col("sum_value")),
      Some(
        """SELECT CASE WHEN GROUPING(event_type) = 1 THEN '(all)' ELSE event_type END AS event_type,
          |       (CASE WHEN GROUPING(hr) = 1 THEN -1 ELSE hr END)::int AS hr,
          |       count(*) AS n_events,
          |       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
          |FROM (SELECT event_type, hour(ts) AS hr, value FROM events)
          |GROUP BY ROLLUP (event_type, hr)
          |HAVING count(*) > 0""".stripMargin)),
    // ^ HAVING pins Spark's empty-input semantics (no grand-total row over
    //   zero rows); no-op on any non-empty input — see events_cube.

    ("events_pivot",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L),
      Some(
        """SELECT user_id,
          |       count(*) FILTER (WHERE event_type = 'click') AS click,
          |       count(*) FILTER (WHERE event_type = 'error') AS error,
          |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
          |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
          |       count(*) FILTER (WHERE event_type = 'view') AS view
          |FROM events GROUP BY 1""".stripMargin)),

    // Anti join: customers having no order above 450k (≈1/3 of customers at
    // every SF since orders-per-customer is SF-invariant).
    ("anti_join_customers",
      (s: SparkSession, d: String) => {
        val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        Tables.customer(s, d)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      },
      Some(
        """SELECT c_custkey, c_name, c_mktsegment FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""".stripMargin)),

    ("semi_join_customers",
      (s: SparkSession, d: String) => {
        val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        Tables.customer(s, d)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_acctbal"))
      },
      Some(
        """SELECT c_custkey, c_acctbal FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""".stripMargin)),

    // Set operations over (user, day) activity pairs.
    ("setops_purchase_no_error_days",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        def pairs(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        pairs("purchase").except(pairs("error"))
      },
      Some(
        """SELECT DISTINCT user_id, ts::date AS day FROM events WHERE event_type = 'purchase'
          |EXCEPT
          |SELECT DISTINCT user_id, ts::date FROM events WHERE event_type = 'error'""".stripMargin)),

    ("setops_purchase_and_error_days",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        def pairs(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        pairs("purchase").intersect(pairs("error"))
      },
      Some(
        """SELECT DISTINCT user_id, ts::date AS day FROM events WHERE event_type = 'purchase'
          |INTERSECT
          |SELECT DISTINCT user_id, ts::date FROM events WHERE event_type = 'error'""".stripMargin)),

    // As-of join: each error event picks up the latest purchase (id + value)
    // of the same user at-or-before it. Oracle = DuckDB's native ASOF JOIN —
    // a genuinely independent implementation of the same semantics.
    ("asof_purchase_before_error",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"), col("value").as("purchase_value"))
        AsofJoin.asofLast(errors, purchases, Seq("user_id"), "ts", "ts",
            Seq("purchase_id", "purchase_value"))
          .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
            col("asof_purchase_id"), col("asof_purchase_value"))
      },
      Some(
        """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
          |p AS (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
          |      FROM events WHERE event_type = 'purchase')
          |SELECT e.event_id, e.user_id, e.ts,
          |       p.purchase_id AS asof_purchase_id,
          |       p.purchase_value AS asof_purchase_value
          |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin)),

    // CEP sequence match (Cep.lastSeqMatch — the MATCH_RECOGNIZE / FlinkCEP
    // shape as running windows): per user, a purchase CLOSES a
    // view → click → purchase match within 48 h of the view, with NO error
    // between the matched view and the purchase. Skip-till-last semantics
    // (latest view / latest click), so every purchase reports at most one
    // deterministic match; the negation is two running counters compared
    // (n_upto at close vs at the matched view) — no join, no NFA state,
    // one key shuffle.
    ("events_cep_match",
      (s: SparkSession, d: String) =>
        Cep.lastSeqMatch(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
            stepA = col("event_type") === "view",
            stepB = col("event_type") === "click",
            stepC = col("event_type") === "purchase",
            negation = col("event_type") === "error",
            windowSeconds = 172800L)
          .select(col("key").as("user_id"), col("close_id").as("purchase_id"),
            ntz(col("a_ts")).as("view_ts"), ntz(col("b_ts")).as("click_ts"),
            ntz(col("c_ts")).as("purchase_ts"), col("gap_seconds")),
      Some(
        """WITH o AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS n_upto
          |  FROM events),
          |l AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          |           OVER w AS la_ts,
          |         last_value(CASE WHEN event_type = 'view' THEN n_upto END IGNORE NULLS)
          |           OVER w AS la_n,
          |         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          |           OVER w AS lb_ts
          |  FROM o
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT user_id, event_id AS purchase_id, la_ts AS view_ts,
          |       lb_ts AS click_ts, ts AS purchase_ts,
          |       (epoch_us(ts) - epoch_us(la_ts)) // 1000000 AS gap_seconds
          |FROM l
          |WHERE event_type = 'purchase'
          |  AND la_ts IS NOT NULL AND lb_ts IS NOT NULL
          |  AND la_ts < lb_ts AND lb_ts < ts
          |  AND epoch_us(ts) - epoch_us(la_ts) <= 172800000000
          |  AND n_upto = la_n""".stripMargin)),

    // N-step CEP (Cep.lastSeqMatchN — the generalized MATCH_RECOGNIZE
    // surface, verdict-r13 item 3): a FOUR-step funnel
    // signup → view → click → purchase within 7 days of the signup, no
    // error between the matched signup and the purchase. Same running
    // last-match encoding as the 3-step row — K-1 last(ignoreNulls)
    // trackers + one negation counter in ONE window operator, one key
    // shuffle, no NFA — the plan shape is INDEPENDENT of K.
    ("events_cep_match4",
      (s: SparkSession, d: String) =>
        Cep.lastSeqMatchN(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
            steps = Seq(col("event_type") === "signup",
              col("event_type") === "view",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            negation = col("event_type") === "error",
            windowSeconds = 604800L)
          .select(col("key").as("user_id"), col("close_id").as("purchase_id"),
            ntz(col("ts_1")).as("signup_ts"), ntz(col("ts_2")).as("view_ts"),
            ntz(col("ts_3")).as("click_ts"), ntz(col("ts_4")).as("purchase_ts"),
            col("gap_seconds")),
      Some(
        """WITH o AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS n_upto
          |  FROM events),
          |l AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
          |           OVER w AS l0_ts,
          |         last_value(CASE WHEN event_type = 'signup' THEN n_upto END IGNORE NULLS)
          |           OVER w AS l0_n,
          |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          |           OVER w AS l1_ts,
          |         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          |           OVER w AS l2_ts
          |  FROM o
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT user_id, event_id AS purchase_id, l0_ts AS signup_ts,
          |       l1_ts AS view_ts, l2_ts AS click_ts, ts AS purchase_ts,
          |       (epoch_us(ts) - epoch_us(l0_ts)) // 1000000 AS gap_seconds
          |FROM l
          |WHERE event_type = 'purchase'
          |  AND l0_ts IS NOT NULL AND l1_ts IS NOT NULL AND l2_ts IS NOT NULL
          |  AND l0_ts < l1_ts AND l1_ts < l2_ts AND l2_ts < ts
          |  AND epoch_us(ts) - epoch_us(l0_ts) <= 604800000000
          |  AND n_upto = l0_n""".stripMargin)),

    // Per-GAP negation CEP (Cep.lastSeqMatchGaps — the full MATCH_RECOGNIZE
    // "NOT between specific steps" surface): view → click → purchase within
    // 48 h, with no ERROR between the matched view and click and no SIGNUP
    // between the matched click and the purchase. One running counter per
    // gap predicate, adjacent-gap counter values recorded at each step's
    // last match — still ONE key shuffle, one window operator, no NFA.
    // (For a single shared predicate the per-gap form provably equals the
    // global lastSeqMatchN — the gaps tile the match span — so this row
    // deliberately uses DISTINCT predicates per gap.)
    ("events_cep_gaps",
      (s: SparkSession, d: String) =>
        Cep.lastSeqMatchGaps(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
            steps = Seq(col("event_type") === "view",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            gapNegations = Seq(col("event_type") === "error",
              col("event_type") === "signup"),
            windowSeconds = 172800L)
          .select(col("key").as("user_id"), col("close_id").as("purchase_id"),
            ntz(col("ts_1")).as("view_ts"), ntz(col("ts_2")).as("click_ts"),
            ntz(col("ts_3")).as("purchase_ts"), col("gap_seconds")),
      Some(
        """WITH o AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER w_run AS n0,
          |         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
          |           OVER w_run AS n1
          |  FROM events
          |  WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |l AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          |           OVER w AS l0_ts,
          |         last_value(CASE WHEN event_type = 'view' THEN n0 END IGNORE NULLS)
          |           OVER w AS l0_n0,
          |         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          |           OVER w AS l1_ts,
          |         last_value(CASE WHEN event_type = 'click' THEN n0 END IGNORE NULLS)
          |           OVER w AS l1_n0,
          |         last_value(CASE WHEN event_type = 'click' THEN n1 END IGNORE NULLS)
          |           OVER w AS l1_n1
          |  FROM o
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT user_id, event_id AS purchase_id, l0_ts AS view_ts,
          |       l1_ts AS click_ts, ts AS purchase_ts,
          |       (epoch_us(ts) - epoch_us(l0_ts)) // 1000000 AS gap_seconds
          |FROM l
          |WHERE event_type = 'purchase'
          |  AND l0_ts IS NOT NULL AND l1_ts IS NOT NULL
          |  AND l0_ts < l1_ts AND l1_ts < ts
          |  AND epoch_us(ts) - epoch_us(l0_ts) <= 172800000000
          |  AND l1_n0 = l0_n0
          |  AND n1 = l1_n1""".stripMargin)),

    // Kleene-quantified CEP (Cep.lastSeqMatchKleene — the MATCH_RECOGNIZE
    // quantifier surface `A B{n,m} C`, verdict-r14 item 1): the engagement
    // funnel "view, then AT LEAST 3 clicks and NO error, then purchase
    // within 7 days". The B+ body never becomes a pattern step — it is an
    // occurrence BOUND on the single gap (count ∈ [3, ∞) for clicks,
    // [0, 0] for errors), so the plan is the per-gap-negation machinery
    // verbatim: one key shuffle, one Window operator, two running counters,
    // shape independent of the bound. n_clicks exposes the matched count
    // (quantifier intensity), not just pass/fail.
    ("events_cep_kleene",
      (s: SparkSession, d: String) =>
        Cep.lastSeqMatchKleene(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
            steps = Seq(col("event_type") === "view",
              col("event_type") === "purchase"),
            gapBounds = Seq(Seq(
              Cep.GapBound(col("event_type") === "click", 3L, None),
              Cep.GapBound(col("event_type") === "error", 0L, Some(0L)))),
            windowSeconds = 604800L)
          .select(col("key").as("user_id"), col("close_id").as("purchase_id"),
            ntz(col("ts_1")).as("view_ts"), ntz(col("ts_2")).as("purchase_ts"),
            col("gap_seconds"), col("n_0_0").as("n_clicks")),
      Some(
        """WITH o AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          |           OVER w_run AS n0,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER w_run AS n1
          |  FROM events
          |  WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |l AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          |           OVER w AS l0_ts,
          |         last_value(CASE WHEN event_type = 'view' THEN n0 END IGNORE NULLS)
          |           OVER w AS l0_n0,
          |         last_value(CASE WHEN event_type = 'view' THEN n1 END IGNORE NULLS)
          |           OVER w AS l0_n1
          |  FROM o
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT user_id, event_id AS purchase_id, l0_ts AS view_ts,
          |       ts AS purchase_ts,
          |       (epoch_us(ts) - epoch_us(l0_ts)) // 1000000 AS gap_seconds,
          |       CAST(n0 - l0_n0 AS bigint) AS n_clicks
          |FROM l
          |WHERE event_type = 'purchase'
          |  AND l0_ts IS NOT NULL AND l0_ts < ts
          |  AND epoch_us(ts) - epoch_us(l0_ts) <= 604800000000
          |  AND n0 - l0_n0 >= 3 AND n1 - l0_n1 = 0""".stripMargin)),

    // Time-series motif discovery (TimeSeries.saxMotifs): SAX-shaped
    // sliding-window shape search over per-user value series — quantized
    // readings, exact-long PAA segments (8 framed sums in ONE window
    // operator), per-window min-max integer symbols, word equi-join with
    // hot words > 256 dropped, exact L1 shape verify, trivial same-series
    // overlaps excluded. The sensor-data counterpart of the text near-dup
    // family; pair space DuckDB-checked before adoption (2 912 candidates
    // at sf0.01, hottest word 107 members at sf0.1).
    ("events_sax_motifs",
      (s: SparkSession, d: String) =>
        TimeSeries.saxMotifs(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"),
            tieCol = col("event_id"), valueCol = col("value"),
            windowLen = 16, segments = 8, alphabet = 4,
            quantScale = 1000L, shapeScale = 1000L,
            minSeparation = 16, maxWordSize = 256, maxL1 = 800L)
          .select(col("key_a").as("user_a"), col("start_a"),
            col("key_b").as("user_b"), col("start_b"),
            col("word"), col("l1"), col("is_motif")),
      Some {
        val segs = (0 until 8).map(j =>
          s"sum(qv) OVER (PARTITION BY user_id ORDER BY rn ROWS BETWEEN ${2 * j} FOLLOWING AND ${2 * j + 1} FOLLOWING) AS s$j")
          .mkString(",\n         ")
        val syms = (0 until 8).map(j =>
          s"((s$j - lo) * 4 // (hi - lo + 1))::varchar").mkString(", ")
        val nsegs = (0 until 8).map(j =>
          s"(s$j - lo) * 1000 // (hi - lo + 1) AS ns$j").mkString(",\n         ")
        val l1 = (0 until 8).map(j => s"abs(a.ns$j - b.ns$j)").mkString(" + ")
        s"""WITH s AS (
           |  SELECT user_id, floor(value * 1000)::bigint AS qv,
           |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           |         count(*) OVER (PARTITION BY user_id) AS n
           |  FROM events),
           |w AS (
           |  SELECT user_id, rn AS win_start, n,
           |         $segs
           |  FROM s),
           |sax AS (
           |  SELECT user_id, win_start,
           |         least(s0,s1,s2,s3,s4,s5,s6,s7) AS lo,
           |         greatest(s0,s1,s2,s3,s4,s5,s6,s7) AS hi,
           |         s0,s1,s2,s3,s4,s5,s6,s7
           |  FROM w WHERE win_start + 15 <= n),
           |words AS (
           |  SELECT user_id, win_start, concat_ws(',', $syms) AS word,
           |         $nsegs
           |  FROM sax),
           |kept AS (
           |  SELECT * FROM (
           |    SELECT *, count(*) OVER (PARTITION BY word) AS wsize FROM words)
           |  WHERE wsize <= 256)
           |SELECT a.user_id AS user_a, a.win_start AS start_a,
           |       b.user_id AS user_b, b.win_start AS start_b,
           |       a.word AS word, ($l1)::bigint AS l1,
           |       (CASE WHEN $l1 <= 800 THEN 1 ELSE 0 END)::int AS is_motif
           |FROM kept a JOIN kept b ON a.word = b.word
           |WHERE (a.user_id < b.user_id)
           |   OR (a.user_id = b.user_id AND a.win_start + 16 <= b.win_start)""".stripMargin
      }),

    // Time-series DISCORDS (TimeSeries.saxDiscords — verdict-r13 item 5,
    // the inverse of events_sax_motifs): per window, the nearest
    // non-trivial same-word neighbor's exact L1; windows whose nearest
    // neighbor is far (≥ 1200) or absent are the anomalies. Coarser SAX
    // than the motif row (alphabet 3, 2-reading segments) so words collide
    // enough for nn_l1 to be informative — at the motif row's resolution
    // 97% of windows are lonely and the flag saturates (measured before
    // adoption: 374 lonely / 3 012 hot-word / 77 500 windows at sf0.1,
    // nn_l1 median 445). The min is map-side-combinable over the
    // word-bounded pair space; hot words (> 256) are marked non-discord
    // without pairing — a saturated shape bucket is by construction
    // common. Recall caveat (deterministic, oracle-replayed): a window
    // whose true nearest neighbor holds a different word reports the
    // word-local minimum or none.
    ("events_sax_discords",
      (s: SparkSession, d: String) =>
        TimeSeries.saxDiscords(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"),
            tieCol = col("event_id"), valueCol = col("value"),
            windowLen = 16, segments = 8, alphabet = 3,
            quantScale = 1000L, shapeScale = 1000L,
            minSeparation = 16, maxWordSize = 256, minL1 = 1200L)
          .withColumnRenamed("key", "user_id"),
      Some {
        val segs = (0 until 8).map(j =>
          s"sum(qv) OVER (PARTITION BY user_id ORDER BY rn ROWS BETWEEN ${2 * j} FOLLOWING AND ${2 * j + 1} FOLLOWING) AS s$j")
          .mkString(",\n         ")
        val syms = (0 until 8).map(j =>
          s"((s$j - lo) * 3 // (hi - lo + 1))::varchar").mkString(", ")
        val nsegs = (0 until 8).map(j =>
          s"(s$j - lo) * 1000 // (hi - lo + 1) AS ns$j").mkString(",\n         ")
        val l1 = (0 until 8).map(j => s"abs(a.ns$j - b.ns$j)").mkString(" + ")
        s"""WITH s AS (
           |  SELECT user_id, floor(value * 1000)::bigint AS qv,
           |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           |         count(*) OVER (PARTITION BY user_id) AS n
           |  FROM events),
           |w AS (
           |  SELECT user_id, rn AS win_start, n,
           |         $segs
           |  FROM s),
           |sax AS (
           |  SELECT user_id, win_start,
           |         least(s0,s1,s2,s3,s4,s5,s6,s7) AS lo,
           |         greatest(s0,s1,s2,s3,s4,s5,s6,s7) AS hi,
           |         s0,s1,s2,s3,s4,s5,s6,s7
           |  FROM w WHERE win_start + 15 <= n),
           |words AS (
           |  SELECT user_id, win_start, concat_ws(',', $syms) AS word,
           |         $nsegs
           |  FROM sax),
           |frames AS (
           |  SELECT *, count(*) OVER (PARTITION BY word) AS wsize FROM words),
           |kept AS (SELECT * FROM frames WHERE wsize <= 256),
           |nn AS (
           |  SELECT a.user_id AS k, a.win_start,
           |         min($l1)::bigint AS nn_l1, count(*)::bigint AS n_cands
           |  FROM kept a JOIN kept b ON a.word = b.word
           |  WHERE (a.user_id <> b.user_id OR abs(a.win_start - b.win_start) >= 16)
           |  GROUP BY 1, 2)
           |SELECT f.user_id, f.win_start, f.word,
           |       (CASE WHEN f.wsize > 256 THEN 1 ELSE 0 END)::int AS is_hot_word,
           |       (CASE WHEN f.wsize > 256 THEN NULL
           |             ELSE coalesce(nn.n_cands, 0) END)::bigint AS n_cands,
           |       nn.nn_l1,
           |       (CASE WHEN f.wsize <= 256 AND (nn.nn_l1 IS NULL OR nn.nn_l1 >= 1200)
           |             THEN 1 ELSE 0 END)::int AS is_discord
           |FROM frames f
           |LEFT JOIN nn ON nn.k = f.user_id AND nn.win_start = f.win_start""".stripMargin
      }),

    // Seasonal-profile anomalies (TimeSeries.seasonalAnomalies) — the
    // LEVEL half of the time-series family (motifs/discords match shape):
    // every event compared against its user's hour-of-day norm, entirely
    // in exact integers (resid_scaled = qv·cnt − sum; the flag
    // cross-multiplies instead of dividing, so no float mean exists to
    // diverge). One map-side-combined (user, hour) aggregation + one
    // equi-join back — the profile is |users|·24 rows, broadcastable.
    // tau = 200.0 units (qv scale 1000) flags 2/12/160 events across the
    // three SFs — the deliberate rare-tail regime.
    ("events_ts_seasonal",
      (s: SparkSession, d: String) =>
        TimeSeries.seasonalAnomalies(Tables.events(s, d),
            keyCol = col("user_id"), idCol = col("event_id"),
            phaseCol = hour(col("ts")), valueCol = col("value"),
            quantScale = 1000L, tauScaled = 200000L)
          .select(col("key").as("user_id"), col("id").as("event_id"),
            col("phase").as("hr"), col("qv"), col("resid_scaled"),
            col("s_cnt"), col("is_anomaly")),
      Some(
        """WITH s AS (
          |  SELECT user_id, event_id, extract(hour FROM ts)::int AS hr,
          |         floor(value * 1000)::bigint AS qv
          |  FROM events),
          |seas AS (
          |  SELECT user_id, hr, sum(qv)::bigint AS s_num, count(*)::bigint AS s_cnt
          |  FROM s GROUP BY 1, 2)
          |SELECT s.user_id, s.event_id, s.hr, s.qv,
          |       (s.qv * seas.s_cnt - seas.s_num)::bigint AS resid_scaled,
          |       seas.s_cnt,
          |       (CASE WHEN abs(s.qv * seas.s_cnt - seas.s_num) > 200000 * seas.s_cnt
          |             THEN 1 ELSE 0 END)::int AS is_anomaly
          |FROM s JOIN seas ON seas.user_id = s.user_id AND seas.hr = s.hr""".stripMargin)),

    // CUSUM changepoint detection (TimeSeries.cusumChangepoints —
    // verdict-r14 item 3, the REGIME third of the TS story): two-sided
    // cumulative-sum test of each user's readings against their keyProfile
    // baseline, all in cross-multiplied exact integers. The sequential
    // CUSUM recursion max(0, S+d) is planned as its closed form
    // P_t − min(P_0..P_t) — two window passes over ONE key shuffle, which
    // is what makes the oracle (and a 100 TB plan) possible. Thresholds
    // slack=20, h=200 value-units (×1000 quant): 325 flags / 10k rows at
    // sf0.01 — sparse but present on stationary synthetic data.
    ("events_ts_changepoints",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        TimeSeries.cusumChangepoints(ev,
            TimeSeries.keyProfile(ev, col("user_id"), col("value"), 1000L),
            keyCol = col("user_id"), idCol = col("event_id"),
            tsCol = col("ts"), tieCol = col("event_id"),
            valueCol = col("value"), quantScale = 1000L,
            slackScaled = 20000L, hScaled = 200000L)
          .select(col("key").as("user_id"), col("id").as("event_id"),
            col("qv"), col("cusum_up"), col("cusum_dn"),
            col("is_shift_up"), col("is_shift_dn"))
      },
      Some(
        """WITH s AS (
          |  SELECT user_id AS k, event_id AS id, ts,
          |         floor(value * 1000)::bigint AS qv
          |  FROM events),
          |prof AS (
          |  SELECT k, sum(qv)::bigint AS s_num, count(*)::bigint AS s_cnt
          |  FROM s GROUP BY 1),
          |j AS (
          |  SELECT s.*, p.s_num, p.s_cnt,
          |         (qv * s_cnt - s_num) - 20000 * s_cnt AS d_up,
          |         (s_num - qv * s_cnt) - 20000 * s_cnt AS d_dn
          |  FROM s JOIN prof p ON p.k = s.k),
          |w AS (
          |  SELECT *, sum(d_up) OVER win AS p_up, sum(d_dn) OVER win AS p_dn
          |  FROM j
          |  WINDOW win AS (PARTITION BY k ORDER BY ts, id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |c AS (
          |  SELECT *,
          |         p_up - least(0, min(p_up) OVER win) AS cusum_up,
          |         p_dn - least(0, min(p_dn) OVER win) AS cusum_dn
          |  FROM w
          |  WINDOW win AS (PARTITION BY k ORDER BY ts, id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT k AS user_id, id AS event_id, qv,
          |       cusum_up::bigint AS cusum_up, cusum_dn::bigint AS cusum_dn,
          |       (CASE WHEN cusum_up > 200000 * s_cnt THEN 1 ELSE 0 END)::int
          |         AS is_shift_up,
          |       (CASE WHEN cusum_dn > 200000 * s_cnt THEN 1 ELSE 0 END)::int
          |         AS is_shift_dn
          |FROM c""".stripMargin)),

    // Seasonal-profile MERGE admission (verdict-r14 item 9): the profile is
    // (key, phase, cnt, sum) exact longs, so two epochs' profiles merge by
    // plain addition — a persistable incremental artifact like the HLL
    // registers and the dedup index (no base-corpus rescan to absorb an
    // epoch). The oracle pins merge ≡ whole by computing the union profile
    // DIRECTLY; the Spark side builds the two halves separately (even/odd
    // event split) and merges.
    ("events_ts_profile_merged",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val halfA = TimeSeries.seasonalProfile(
          ev.filter(col("event_id") % 2 === 0), col("user_id"),
          hour(col("ts")), col("value"), 1000L)
        val halfB = TimeSeries.seasonalProfile(
          ev.filter(col("event_id") % 2 === 1), col("user_id"),
          hour(col("ts")), col("value"), 1000L)
        TimeSeries.mergeProfiles(halfA, halfB)
          .select(col("k").as("user_id"), col("phase").as("hr"),
            col("s_num"), col("s_cnt"))
      },
      Some(
        """SELECT user_id, extract(hour FROM ts)::int AS hr,
          |       sum(floor(value * 1000)::bigint)::bigint AS s_num,
          |       count(*)::bigint AS s_cnt
          |FROM events GROUP BY 1, 2""".stripMargin)),

    // Interval (range) join via bucketed equi-join: purchases landing in the
    // 6-hour window after each error by the same user, aggregated per error.
    // The bucket width matches the window span, so each interval registers
    // in at most 2 buckets and the exact predicate filters the slack — the
    // scale-safe form of a join Spark would otherwise plan as a nested-loop
    // theta-join. The oracle IS that theta-join, directly in DuckDB.
    ("events_interval_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 6 HOURS")).as("end_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("value"))
        IntervalJoin.intervalJoin(purchases, errors, "p_ts", "start_ts",
            "end_ts", keys = Seq("user_id"), bucketWidthSec = 21600L)
          .groupBy(col("error_id"))
          .agg(count(lit(1)).as("n_purchases"), sumDec(col("value")).as("sum_value"))
      },
      Some(
        """SELECT e.event_id AS error_id, count(*) AS n_purchases,
          |       cast(sum(cast(p.value AS decimal(18,2))) AS double) AS sum_value
          |FROM events e JOIN events p
          |  ON p.user_id = e.user_id
          | AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 6 HOURS
          |WHERE e.event_type = 'error' AND p.event_type = 'purchase'
          |GROUP BY 1""".stripMargin)),

    // Percentile-band length gate per source: keep docs whose token count
    // sits in [p10, p90] of their source's distribution — computed from the
    // per-source length HISTOGRAM (documents never sort; the window input
    // is distinct lengths), joined back exactly. The oracle uses DuckDB's
    // native percent_rank over the full partition — same min-rank/(n-1)
    // definition, so the histogram form must reproduce it bit for bit.
    ("corpus_length_gate",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Sampling.percentileGate(docs, col("source"), col("doc_id"),
          size(TextOps.tokens(TextOps.normalize(col("text")))),
          lo = 0.1, hi = 0.9)
      },
      Some(
        """WITH b AS (
          |  SELECT doc_id, source,
          |         len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
          |                          ' '))::bigint AS gate_value
          |  FROM documents),
          |r AS (SELECT doc_id, source AS grp, gate_value,
          |             percent_rank() OVER (PARTITION BY source
          |                                  ORDER BY gate_value) AS pct_rank
          |      FROM b)
          |SELECT doc_id, grp, gate_value, pct_rank FROM r
          |WHERE pct_rank >= 0.1 AND pct_rank <= 0.9""".stripMargin)),

    // The same band as a per-source THRESHOLD artifact (one row per source)
    // — what a streaming gate broadcast-joins against arriving documents;
    // `BETWEEN v_lo AND v_hi` admits exactly the rows the gate keeps.
    ("corpus_length_thresholds",
      (s: SparkSession, d: String) =>
        Sampling.percentileThresholds(Tables.documents(s, d), col("source"),
          size(TextOps.tokens(TextOps.normalize(col("text")))),
          lo = 0.1, hi = 0.9),
      Some(
        """WITH b AS (
          |  SELECT source,
          |         len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
          |                          ' '))::bigint AS gate_value
          |  FROM documents),
          |r AS (SELECT source AS grp, gate_value,
          |             percent_rank() OVER (PARTITION BY source
          |                                  ORDER BY gate_value) AS pr
          |      FROM b)
          |SELECT grp, min(CASE WHEN pr >= 0.1 THEN gate_value END)::bigint AS v_lo,
          |       max(CASE WHEN pr <= 0.9 THEN gate_value END)::bigint AS v_hi
          |FROM r GROUP BY 1""".stripMargin)),

    // SimHash near-dup endpoint: Hamming distance between consecutive docs'
    // fingerprints (bit_count of xor — identical in both engines).
    ("dedup_simhash_pairs",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val ids = docs.select(col("doc_id"))
        val pairs = ids.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
          .join(ids.select(col("doc_id").as("doc_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"))
        Dedup.simhashPairs(pairs, Dedup.simhash(docs, col("text"), col("doc_id")))
      },
      Some(
        """WITH tok AS (
          |  SELECT DISTINCT doc_id, t AS token
          |  FROM (SELECT doc_id,
          |               unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
          |        FROM documents)),
          |h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::bigint AS h FROM tok),
          |bits AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2),
          |sh AS (
          |  SELECT doc_id,
          |         cast(sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END) AS bigint) AS simhash
          |  FROM bits GROUP BY 1)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       bit_count(xor(a.simhash, b.simhash))::int AS hamming,
          |       (CASE WHEN bit_count(xor(a.simhash, b.simhash)) <= 12 THEN 1 ELSE 0 END)::int AS near_dup
          |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin)),

    // Winnowing rolling-hash fingerprints (k=8 char-grams, window w=4).
    ("text_winnow_fingerprints",
      (s: SparkSession, d: String) =>
        TextOps.winnowFingerprints(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
          |  FROM documents),
          |g AS (
          |  SELECT doc_id, pos,
          |         ('0x' || substr(md5(substr(norm, pos::int, 8)), 1, 15))::bigint AS h,
          |         length(norm) - 7 AS n_pos
          |  FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, length(norm) - 6)) AS pos)
          |  WHERE length(norm) >= 8),
          |w AS (
          |  SELECT doc_id, pos, n_pos,
          |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
          |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min
          |  FROM g)
          |SELECT DISTINCT doc_id, win_min AS fingerprint
          |FROM w WHERE pos <= n_pos - 3""".stripMargin)),

    // Exact shared-substring runs (Lee et al. 2021's suffix-array dedup
    // signal as a bounded equi-join): per doc pair sharing >= 8 verbatim
    // consecutive tokens, the longest run and the maximal-run count.
    // Anchors are positional 5-grams; occurrences per (doc, gram) capped at
    // 8; grams in > 64 docs dropped by broadcast anti-join (pigeonhole-small
    // heavy list) — the pair space is bounded BEFORE the join, LSH-cap
    // discipline. Runs = gaps-and-islands per (d1, d2, diagonal). All-int
    // output, no hashes on the match path (the join key is the gram text).
    ("text_substring_runs",
      (s: SparkSession, d: String) =>
        TextOps.substringRuns(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents),
          |g0 AS (
          |  SELECT doc_id, pos, array_to_string(t[pos + 1 : pos + 5], ' ') AS gram
          |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(0, len(t) - 4)) AS pos)
          |  WHERE len(t) >= 5),
          |capped AS (
          |  SELECT doc_id, pos, gram FROM (
          |    SELECT *, row_number() OVER (PARTITION BY doc_id, gram ORDER BY pos) AS occ
          |    FROM g0) WHERE occ <= 8),
          |light AS (SELECT gram FROM capped GROUP BY gram
          |          HAVING count(DISTINCT doc_id) <= 64),
          |g AS (SELECT c.* FROM capped c JOIN light USING (gram)),
          |pairs AS (
          |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, a.pos - b.pos AS diag
          |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
          |runs AS (
          |  SELECT d1, d2, count(*) + 4 AS run_tokens
          |  FROM (SELECT d1, d2, diag, p1,
          |               p1 - row_number() OVER (PARTITION BY d1, d2, diag
          |                                       ORDER BY p1) AS isl
          |        FROM pairs)
          |  GROUP BY d1, d2, diag, isl)
          |SELECT d1, d2, max(run_tokens)::bigint AS longest_run,
          |       count(*)::bigint AS n_runs
          |FROM runs WHERE run_tokens >= 8 GROUP BY d1, d2""".stripMargin)),

    // Substring-run REMOVAL (the cut half of Lee et al. 2021): every
    // verbatim >= 8-token run shared by a doc pair is cut from the
    // higher-id doc (keep-first); overlapping intervals merge per doc with
    // the running-max sweep; output pins the cut byte-for-byte via the
    // portable hash of the re-concatenated text. Inherits the runs query's
    // bounded pair space; the final attach is one left_outer equi-join of
    // the (cuts-only) interval table onto the corpus.
    ("text_substring_cut",
      (s: SparkSession, d: String) =>
        TextOps.cutRuns(Tables.documents(s, d), col("text"), col("doc_id")),
      Some(
        """WITH toks AS (
          |  SELECT doc_id,
          |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents),
          |g0 AS (
          |  SELECT doc_id, pos, array_to_string(t[pos + 1 : pos + 5], ' ') AS gram
          |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(0, len(t) - 4)) AS pos)
          |  WHERE len(t) >= 5),
          |capped AS (
          |  SELECT doc_id, pos, gram FROM (
          |    SELECT *, row_number() OVER (PARTITION BY doc_id, gram ORDER BY pos) AS occ
          |    FROM g0) WHERE occ <= 8),
          |light AS (SELECT gram FROM capped GROUP BY gram
          |          HAVING count(DISTINCT doc_id) <= 64),
          |g AS (SELECT c.* FROM capped c JOIN light USING (gram)),
          |pairs AS (
          |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2,
          |         a.pos - b.pos AS diag
          |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
          |isl AS (
          |  SELECT d1, d2, diag, isl, count(*) + 4 AS run_tokens,
          |         min(p2) AS s, max(p2) + 4 AS e
          |  FROM (SELECT d1, d2, p1, p2, diag,
          |               p1 - row_number() OVER (PARTITION BY d1, d2, diag
          |                                       ORDER BY p1) AS isl
          |        FROM pairs)
          |  GROUP BY d1, d2, diag, isl),
          |cuts AS (SELECT d2 AS doc_id, s, e FROM isl WHERE run_tokens >= 8),
          |sw AS (SELECT doc_id, s, e,
          |              max(e) OVER (PARTITION BY doc_id ORDER BY s, e
          |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
          |       FROM cuts),
          |grps AS (SELECT doc_id, s, e,
          |                sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
          |                  OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
          |         FROM sw),
          |miv AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM grps GROUP BY 1, 2),
          |ivl AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS iv FROM miv GROUP BY 1),
          |joined AS (SELECT t.doc_id, t.t, i.iv FROM toks t LEFT JOIN ivl i USING (doc_id)),
          |res AS (
          |  SELECT doc_id, len(t)::int AS n_tokens,
          |         CASE WHEN iv IS NULL THEN t
          |              ELSE list_transform(list_filter(range(0, len(t)),
          |                     ix -> len(list_filter(iv, v -> ix >= v['s'] AND ix <= v['e'])) = 0),
          |                     ix -> t[ix + 1]) END AS kept
          |  FROM joined)
          |SELECT doc_id, n_tokens, len(kept)::int AS n_tokens_after,
          |       ('0x' || substr(md5(coalesce(array_to_string(kept, ' '), '')), 1, 15))::bigint AS cut_text_hash
          |FROM res""".stripMargin)),

    // Embedding-cosine near-dup pairs, the corpus-scale shape: banded
    // hyperplane-LSH candidates (equi-join on (band, bucket) — a hash
    // shuffle, never a nested loop) with exact in-bucket cosine verification.
    // The oracle replicates the SAME banding, so the gate verifies the
    // bucketed implementation exactly; recall vs the brute-force baseline is
    // measured separately in SimilaritySpec (LSH prunes cross-bucket pairs —
    // see Dedup.embeddingNearDupBucketed's recall contract).
    ("dedup_embedding_near",
      (s: SparkSession, d: String) =>
        Dedup.embeddingNearDupBucketed(Tables.embeddings(s, d), col("vec_id"),
          col("embedding"), 0.35, nBands = 4, rowsPerBand = 2, dim = 64),
      Some(
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
          |           FROM embeddings),
          |n AS (SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nn FROM v),
          |bb AS (
          |  SELECT vec_id, ve, nn, band,
          |         list_sum(list_transform(generate_series(0, 1), j ->
          |           CASE WHEN list_sum(list_transform(generate_series(0, len(ve) - 1), d ->
          |                  ve[d + 1] * ((('0x' || substr(md5((band * 2 + j) || ':' || d), 1, 15))::bigint
          |                                / 1.152921504606846976e18) * 2 - 1))) >= 0
          |                THEN cast(pow(2.0, j) AS bigint) ELSE 0 END))::bigint AS bucket
          |  FROM n CROSS JOIN (SELECT unnest(range(0, 4)) AS band))
          |SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b,
          |       list_dot_product(a.ve, b.ve) / (a.nn * b.nn) AS cosine
          |FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
          |WHERE list_dot_product(a.ve, b.ve) / (a.nn * b.nn) >= 0.35""".stripMargin)),

    // Semantic dedup (SemDeDup): deterministic spherical k-means (8 cells,
    // 2 Lloyd iterations — the sim_ivf trainer), pairwise cosine ONLY
    // within a cell (equi-join on cell_id — pair space Σ(cell size)², never
    // corpus²), drop the higher id of any pair at cosine >= 0.3 (the p99 of
    // the within-cell cosine distribution on this corpus — SemDeDup prunes
    // the most-similar tail). Gated output is (vec_id, cell_id, sem_keep):
    // the verdict depends only on RAW-vector cosines (bit-exact
    // cross-engine); cell_cos — a centroid-involving double whose
    // decimal→double conversion can differ by 1 ulp between engines (the
    // int128 sum rounds before DuckDB's 10^15 division) — stays a
    // library-level column, spec-tested, not hash-gated.
    ("dedup_semantic",
      (s: SparkSession, d: String) =>
        Dedup.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          nCells = 8, trainIters = 2, tau = 0.3)
          .select(col("vec_id"), col("cell_id"), col("sem_keep")),
      Some {
        def assign(cents: String, out: String) =
          s"""$out AS (SELECT vec_id, ve, cell_id FROM (
             |  SELECT v.vec_id, v.ve, c.cell_id,
             |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |           list_dot_product(v.ve, c.cellv)
             |             / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(c.cellv, c.cellv))) DESC,
             |           c.cell_id) AS rn
             |  FROM v CROSS JOIN $cents c) WHERE rn = 1)"""
        def update(from: String, out: String) =
          s"""$out AS (
             |  SELECT cell_id, list(cx ORDER BY dim) AS cellv FROM (
             |    SELECT cell_id, d AS dim,
             |           cast(sum(cast(ve[d + 1] AS decimal(30,15))) AS double) / count(*) AS cx
             |    FROM $from CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
             |    GROUP BY 1, 2)
             |  GROUP BY 1)"""
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
           |           FROM embeddings),
           |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::int AS cell_id, ve AS cellv
           |       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
           |${assign("c0", "a0")},
           |${update("a0", "c1")},
           |${assign("c1", "a1")},
           |${update("a1", "c2")},
           |${assign("c2", "a2")},
           |drops AS (
           |  SELECT DISTINCT b.vec_id
           |  FROM a2 a JOIN a2 b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
           |  WHERE list_dot_product(a.ve, b.ve)
           |          / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))) >= 0.3)
           |SELECT a.vec_id, a.cell_id,
           |       (CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::int AS sem_keep
           |FROM a2 a LEFT JOIN drops d ON d.vec_id = a.vec_id""".stripMargin
      }),

    // Record-linkage entity matching (Dedup.entityMatch): the customer
    // table plus typo'd duplicate records (every 3rd gets a 1-edit copy at
    // a key-dependent digit position, every 9th also a fixed 2-edit copy),
    // matched through segment-pair blocking over the 9-digit name suffix
    // (thirds; an edit confined to one third leaves one key intact) with
    // hot keys > 64 dropped, then exact levenshtein verify — the catalog's
    // first cross-engine edit-distance surface. The verdict is the
    // ALGORITHM's (blocking recall trades and near-key false positives
    // included, both deterministic): edits landing where the surviving key
    // pair is hot are missed by construction — the LSH
    // quantization-boundary convention. DuckDB-checked pair space before
    // adoption: 7 226 candidates / 2 697 matches at sf0.01, key size ≤ 23
    // at sf0.1.
    ("dedup_entity_match",
      (s: SparkSession, d: String) =>
        Dedup.entityMatch(dirtyCustomers(s, d), col("id"), col("name"),
          col("blk"), entityPieces, maxDist = 2, maxKeySize = 64),
      Some(
        """WITH base AS (
          |  SELECT c_custkey AS id, c_name AS name,
          |         c_nationkey::varchar || ':' || c_mktsegment AS blk,
          |         c_custkey AS k
          |  FROM customer),
          |d1 AS (
          |  SELECT id + 1000000000 AS id,
          |         substr(name, 1, (10 + k % 9) - 1) || 'x' ||
          |           substr(name, (10 + k % 9) + 1) AS name,
          |         blk FROM base WHERE k % 3 = 0),
          |d2 AS (
          |  SELECT id + 2000000000 AS id,
          |         substr(name, 1, 9) || 'xy' || substr(name, 12) AS name,
          |         blk FROM base WHERE k % 9 = 0),
          |dirty AS (
          |  SELECT id, name, blk FROM base
          |  UNION ALL SELECT * FROM d1
          |  UNION ALL SELECT * FROM d2),
          |pieces AS (
          |  SELECT id, name, blk, substr(name, 10, 3) AS t0,
          |         substr(name, 13, 3) AS t1, substr(name, 16, 3) AS t2
          |  FROM dirty),
          |keys AS (
          |  SELECT id, name, blk || '|01|' || t0 || '|' || t1 AS key FROM pieces
          |  UNION ALL SELECT id, name, blk || '|02|' || t0 || '|' || t2 FROM pieces
          |  UNION ALL SELECT id, name, blk || '|12|' || t1 || '|' || t2 FROM pieces),
          |kept AS (
          |  SELECT id, name, key FROM (
          |    SELECT id, name, key, count(*) OVER (PARTITION BY key) AS ksize
          |    FROM keys)
          |  WHERE ksize <= 64),
          |cand AS (
          |  SELECT DISTINCT a.id AS id_a, a.name AS name_a,
          |         b.id AS id_b, b.name AS name_b
          |  FROM kept a JOIN kept b ON a.key = b.key AND a.id < b.id)
          |SELECT id_a, id_b, levenshtein(name_a, name_b)::int AS lev,
          |       (CASE WHEN levenshtein(name_a, name_b) <= 2
          |             THEN 1 ELSE 0 END)::int AS is_match
          |FROM cand""".stripMargin)),

    // Entity resolution END-TO-END (verdict-r13 item 4): the full
    // record-linkage pipeline — segment-pair blocking + levenshtein verify
    // (Dedup.entityMatch) → transitive components over the match edges
    // (Dedup.connectedComponents; matches chain, so an entity is the
    // CLOSURE, not a pair list — 145-member chains exist at sf0.1) →
    // golden-record election per entity (longest name, then lowest id —
    // the dedup_canonical_pick election convention on the name attribute).
    // Output is the resolved mapping: every dirty record with its entity
    // id, entity size, and whether it is the golden record. Scale shape:
    // pair space stays Σ|key|² (blocking), components run the two-tier
    // star solve, the election is one window over the mapping — nothing
    // quadratic in the corpus anywhere. DuckDB-checked before adoption:
    // 455 entities / 2 167 records at sf0.01, 2 848 / 21 667 at sf0.1.
    ("dedup_entity_resolve",
      (s: SparkSession, d: String) => {
        val dirty = dirtyCustomers(s, d)
        entityElection(dirty, Dedup.entityResolve(dirty, col("id"),
          col("name"), col("blk"), entityPieces, maxDist = 2, maxKeySize = 64))
      },
      Some(entityResolveOracle)),

    // The SERVED twin of dedup_entity_resolve: the (id, entity_id) label
    // mapping is an Artifacts-persisted parquet (built once per sf-dir from
    // the same deterministic training chain); the returned frame is the
    // election only — artifact scan + dirty join + two entity_id windows,
    // no blocking, no levenshtein, no components solve. Gated on the SAME
    // oracle as the training row. This is the row that answers the sf10
    // finding (the 100× components solve crossing into distributed star
    // rounds at 41 s): at serving time that cost is paid once, not
    // per-query.
    ("dedup_entity_resolve_served",
      (s: SparkSession, d: String) =>
        entityElection(dirtyCustomers(s, d),
          s.read.parquet(Artifacts.entityLabels(s, d))),
      Some(entityResolveOracle)),

    // CDC record-linkage admission (verdict-r13 item 7's batch gate): the
    // typo'd duplicate feed matched against the CLEAN master through the
    // persistable blocking index (Dedup.entityBlockingIndex +
    // entityMatchAgainst) — hot-key hygiene lives in the index, arrivals
    // cost O(slots) rows each, the master is never rescanned. The
    // STREAMING twin (StatefulOps.entityMatchStream, a stateless
    // stream-static equi-join over the Artifacts-persisted index) is
    // parity-pinned against this operator in StreamingSpec. DuckDB-checked
    // pair space: 1 801 candidates / 884 matches at sf0.01, 20 315 / 9 414
    // at sf0.1.
    ("dedup_entity_admit",
      (s: SparkSession, d: String) => {
        val (base, arrivals) = dirtyCustomerParts(s, d)
        val index = Dedup.entityBlockingIndex(base, col("id"), col("name"),
          col("blk"), entityPieces, maxKeySize = 64)
        Dedup.entityMatchAgainst(index, arrivals, col("id"), col("name"),
          col("blk"), entityPieces, maxDist = 2)
      },
      Some(
        """WITH base AS (
          |  SELECT c_custkey AS id, c_name AS name,
          |         c_nationkey::varchar || ':' || c_mktsegment AS blk,
          |         c_custkey AS k
          |  FROM customer),
          |d1 AS (
          |  SELECT id + 1000000000 AS id,
          |         substr(name, 1, (10 + k % 9) - 1) || 'x' ||
          |           substr(name, (10 + k % 9) + 1) AS name,
          |         blk FROM base WHERE k % 3 = 0),
          |d2 AS (
          |  SELECT id + 2000000000 AS id,
          |         substr(name, 1, 9) || 'xy' || substr(name, 12) AS name,
          |         blk FROM base WHERE k % 9 = 0),
          |arrivals AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2),
          |bp AS (
          |  SELECT id, name, blk, substr(name, 10, 3) AS t0,
          |         substr(name, 13, 3) AS t1, substr(name, 16, 3) AS t2
          |  FROM base),
          |bkeys AS (
          |  SELECT id, name, blk || '|01|' || t0 || '|' || t1 AS key FROM bp
          |  UNION ALL SELECT id, name, blk || '|02|' || t0 || '|' || t2 FROM bp
          |  UNION ALL SELECT id, name, blk || '|12|' || t1 || '|' || t2 FROM bp),
          |idx AS (
          |  SELECT id, name, key FROM (
          |    SELECT id, name, key, count(*) OVER (PARTITION BY key) AS ksize
          |    FROM bkeys)
          |  WHERE ksize <= 64),
          |ap AS (
          |  SELECT id, name, blk, substr(name, 10, 3) AS t0,
          |         substr(name, 13, 3) AS t1, substr(name, 16, 3) AS t2
          |  FROM arrivals),
          |akeys AS (
          |  SELECT id, name, blk || '|01|' || t0 || '|' || t1 AS key FROM ap
          |  UNION ALL SELECT id, name, blk || '|02|' || t0 || '|' || t2 FROM ap
          |  UNION ALL SELECT id, name, blk || '|12|' || t1 || '|' || t2 FROM ap),
          |cand AS (
          |  SELECT DISTINCT i.id AS base_id, i.name AS base_name,
          |         a.id AS new_id, a.name AS new_name
          |  FROM idx i JOIN akeys a ON i.key = a.key AND i.id <> a.id)
          |SELECT base_id, new_id, levenshtein(base_name, new_name)::int AS lev,
          |       (CASE WHEN levenshtein(base_name, new_name) <= 2
          |             THEN 1 ELSE 0 END)::int AS is_match
          |FROM cand""".stripMargin)),

    // Exact order statistics without interpolation ambiguity: the value at
    // rank ceil(p*n) per group (deterministic in any engine).
    ("events_value_percentiles",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val ranked = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        def pick(p: Double, pct: Int) = ranked
          .filter(col("rn") === greatest(ceil(col("n") * p), lit(1L)))
          .select(col("event_type"), lit(pct).as("pct"), col("value"))
        pick(0.5, 50).unionAll(pick(0.9, 90))
      },
      Some(
        """WITH r AS (
          |  SELECT event_type, value,
          |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM events)
          |SELECT event_type, 50 AS pct, value FROM r WHERE rn = greatest(ceil(n * 0.5), 1)
          |UNION ALL
          |SELECT event_type, 90 AS pct, value FROM r WHERE rn = greatest(ceil(n * 0.9), 1)""".stripMargin)),

    // Sketch aggregation: HLL++ approximate distinct — engine-specific sketch,
    // The raw estimate is engine-private (Spark's HLL++ register layout),
    // so the oracle gates a BOUNDED-ERROR contract instead of the estimate
    // itself: |estimate − exact| ≤ 3·rsd·exact (rsd = the 0.01 the query
    // requests; 3σ of the sketch's published relative standard deviation).
    // Spark computes the boolean from its own estimate; DuckDB recomputes
    // the exact count and pins the boolean at TRUE — an out-of-bound
    // estimate hash-mismatches. The estimate is deterministic for a fixed
    // input (order-independent register merge), so the row is replayable;
    // the raw estimate's value stays spec-bounded in the test suite and
    // oracle-gated for the portable sketch via sketch_hll_daily_users.
    // GATE-MARGIN NOTE (r14 advice): within_bound pins the HLL++ estimate
    // inside 3·rsd of exact — a ~99.7% STATISTICAL bound, not a guarantee.
    // The bound is validated at the gate scales (sf0.001/0.01/0.1, margin
    // comfortable: observed error ≲1·rsd); if this row ever trips at a NEW
    // scale factor or dataset, first re-validate the margin there (the
    // sketch may be functioning correctly at the tail of its error
    // distribution) before treating it as a regression.
    ("approx_distinct_users",
      (s: SparkSession, d: String) =>
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")).cast("double")
              <= lit(3.0 * 0.01) * col("exact_users").cast("double"))
              .cast("int").as("within_bound")),
      Some(
        """SELECT event_type, count(DISTINCT user_id)::bigint AS exact_users,
          |       1::int AS within_bound
          |FROM events GROUP BY 1""".stripMargin)),

    // Count-Min point-frequency estimates (Cormode/Muthukrishnan 2005):
    // d=4 × w=256 counters over event user_ids, then the min-over-depths
    // upper bound per distinct user. Unlike HLL, the ESTIMATE is a pure
    // function of md5-derived bucket hashes — DuckDB rebuilds the identical
    // d×w table and the oracle gates the approximation itself. The sketch,
    // not the key domain, is what shuffles (≤ d·w rows per partition after
    // the partial aggregate) and the probe side broadcasts the d·w table.
    ("sketch_countmin_users",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val cms = Sketches.countMinSketch(ev, col("user_id"), 4, 256)
        Sketches.countMinEstimate(cms, ev, col("user_id"), 4, 256)
          .withColumnRenamed("key", "user_id")
      },
      Some(
        """WITH ds AS (SELECT unnest(range(0, 4)) AS depth),
          |h AS (
          |  SELECT depth,
          |         ('0x' || substr(md5(depth::varchar || ':' || user_id::varchar), 1, 15))::bigint
          |           % 256 AS bucket
          |  FROM events CROSS JOIN ds),
          |cms AS (SELECT depth, bucket, count(*) AS cnt FROM h GROUP BY 1, 2),
          |kb AS (
          |  SELECT DISTINCT user_id, depth,
          |         ('0x' || substr(md5(depth::varchar || ':' || user_id::varchar), 1, 15))::bigint
          |           % 256 AS bucket
          |  FROM events CROSS JOIN ds)
          |SELECT user_id, min(coalesce(cnt, 0))::bigint AS est_count
          |FROM kb LEFT JOIN cms USING (depth, bucket)
          |GROUP BY 1""".stripMargin)),

    // KMV / bottom-k distinct estimate (Bar-Yossef et al. 2002) per
    // language over the distinct-token domain: k=64 smallest md5-derived
    // hashes per group through one partial/final aggregate pair (O(k) state
    // per mapper — the custom KMinValues aggregate), estimate
    // (k-1)·2^60/h_k emitted alongside the sketch state it derives from.
    // Every output — including the double — is a deterministic function of
    // the hashes ((k-1)·2^60 is exact in double, the division is one IEEE
    // op), so the oracle gates the estimator, not just the sketch.
    ("sketch_kmv_tokens",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Sketches.kmvDistinct(
          docs.select(col("lang"),
            explode(TextOps.tokens(TextOps.normalize(col("text")))).as("tok")),
          col("lang"), col("tok"), 64)
          .withColumnRenamed("grp", "lang")
      },
      Some(
        """WITH tok AS (
          |  SELECT lang,
          |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS tk
          |  FROM documents),
          |h AS (SELECT DISTINCT lang, ('0x' || substr(md5(tk), 1, 15))::bigint AS h FROM tok),
          |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h)
          |SELECT lang, count(*)::int AS n_kept, max(h) AS kth_min,
          |       CASE WHEN count(*) < 64 THEN count(*)::double
          |            ELSE 63::double * 1152921504606846976::double / max(h)::double END
          |         AS est_distinct
          |FROM r WHERE rn <= 64 GROUP BY 1""".stripMargin)),

    // KMV set-overlap probe (Beyer et al. 2007's ratio estimator) between
    // the even- and odd-doc_id halves of the corpus over the distinct
    // 3-shingle domain: per-side bottom-k sketches built in ONE corpus scan
    // (conditional inputs to two KMinValues aggregates), union k-mins by
    // array merge on the single result row, intersection scaled by the
    // fraction of union k-mins present in both sides — the train/test
    // contamination-rate shape that never joins or shuffles the shingle
    // domain itself. n_common_kmins is integer-exact; the est_* doubles
    // follow the single-IEEE-op discipline and hash-match the oracle.
    ("sketch_kmv_overlap",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Sketches.kmvOverlap(
          docs.select(col("doc_id"),
            explode(TextOps.shingles(col("text"), 3)).as("sh")),
          col("doc_id") % 2 === 0, col("doc_id") % 2 =!= 0, col("sh"), 64)
      },
      Some(shingleCte +
        """, hs AS (
          |  SELECT doc_id % 2 = 0 AS in_a,
          |         ('0x' || substr(md5(shingle), 1, 15))::bigint AS h
          |  FROM shingle_rows),
          |ka AS (SELECT h FROM (
          |  SELECT DISTINCT h FROM hs WHERE in_a) ORDER BY h LIMIT 64),
          |kb AS (SELECT h FROM (
          |  SELECT DISTINCT h FROM hs WHERE NOT in_a) ORDER BY h LIMIT 64),
          |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
          |       ORDER BY h LIMIT 64),
          |st AS (
          |  SELECT (SELECT count(*) FROM ka)::int AS n_a,
          |         (SELECT count(*) FROM kb)::int AS n_b,
          |         (SELECT count(*) FROM ku)::int AS n_u,
          |         (SELECT count(*) FROM ku
          |          WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))::int
          |           AS n_common_kmins,
          |         (SELECT max(h) FROM ka) AS hka,
          |         (SELECT max(h) FROM kb) AS hkb,
          |         (SELECT max(h) FROM ku) AS hku)
          |SELECT n_a, n_b, n_u, n_common_kmins,
          |       CASE WHEN n_a < 64 THEN n_a::double
          |            ELSE 63::double * 1152921504606846976::double / hka::double END
          |         AS est_distinct_a,
          |       CASE WHEN n_b < 64 THEN n_b::double
          |            ELSE 63::double * 1152921504606846976::double / hkb::double END
          |         AS est_distinct_b,
          |       CASE WHEN n_u < 64 THEN n_u::double
          |            ELSE 63::double * 1152921504606846976::double / hku::double END
          |         AS est_distinct_union,
          |       n_common_kmins::double / n_u::double *
          |         (CASE WHEN n_u < 64 THEN n_u::double
          |               ELSE 63::double * 1152921504606846976::double / hku::double END)
          |         AS est_intersection
          |FROM st""".stripMargin)),

    // ==== portable HyperLogLog ============================================
    // Spark's approx_count_distinct (the `approx_distinct_users` row) is
    // HLL++ with an engine-private register layout — oracle-gated only via
    // its 3σ bounded-error contract. This family is the same algorithm on the
    // 60-bit md5 portable hash so the REGISTERS are a pure cross-engine
    // function of the data (bucket = low 6 bits, rank = leading-zero count
    // of the high 54 bits + 1, bit-length via base-2 digit count — exact
    // integer/string ops only). Sketched domain: daily-active user-days
    // (user_id × day, ~1-2k per event_type at sf0.01 — the raw-estimate
    // regime where uncorrected HLL is accurate). Per (mapper, group) state
    // is ≤ 64 small ints; the shuffle carries registers, never user-days.
    ("sketch_hll_registers",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        Sketches.hllRegisters(ev, col("event_type"),
            concat_ws(":", col("user_id"), to_date(col("ts"))))
          .withColumnRenamed("grp", "event_type")
      },
      Some(hllRegisterCtes +
        "SELECT grp AS event_type, bucket, register FROM regs")),

    // The estimate itself, oracle-gated: Ê = α_64·64²/Σ 2^(−r_j) with the
    // harmonic denominator carried as the INTEGER s_num = Σ 2^(55−r_j)
    // (≤ 64·2^55 < 2^62), so the only float op is ONE IEEE division of a
    // shared plan-time literal (hllConstLiteral — Double.toString shortest
    // round-trip, re-parsed correctly-rounded by DuckDB) by s_num. n_zero
    // rides along for small-range correction by callers; exact_user_days
    // joins in the true distinct count so the row self-reports its error.
    ("sketch_hll_daily_users",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val v = concat_ws(":", col("user_id"), to_date(col("ts")))
        val est = Sketches.hllEstimateCorrected(
          Sketches.hllRegisters(ev, col("event_type"), v))
        val exact = ev.groupBy(col("event_type").as("grp"))
          .agg(countDistinct(v).as("exact_user_days"))
        est.join(exact, Seq("grp")).withColumnRenamed("grp", "event_type")
      },
      Some(hllRegisterCtes + hllEstimateCte +
        s"""SELECT e.grp AS event_type, e.n_zero, e.s_num, e.est_raw,
          |       $hllCorrectedEstSql,
          |       x.exact_user_days
          |FROM est e JOIN (
          |  SELECT event_type AS grp,
          |         count(DISTINCT user_id::varchar || ':' || (ts::date)::varchar)::bigint
          |           AS exact_user_days
          |  FROM events GROUP BY 1) x USING (grp)""".stripMargin)),

    // Small-range regime, correction branch EXERCISED: distinct nations per
    // market segment is 25 « 2.5·m = 160, where the raw harmonic estimate
    // biases high and linear counting m·ln(m/V) is the standard fix
    // (Flajolet et al. 2007 §4). ln is libm — so NEITHER engine computes it
    // at query time: the m-entry table m·ln(m/V), V ∈ [1..64], is rendered
    // once driver-side as shortest-round-trip literals into BOTH plans and
    // selected by the integer empty-bucket count (element_at / list index).
    // exact_nations rides along so the row self-reports correction quality.
    ("sketch_hll_small_range",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d)
        val est = Sketches.hllEstimateCorrected(
          Sketches.hllRegisters(c, col("c_mktsegment"), col("c_nationkey")))
        val exact = c.groupBy(col("c_mktsegment").as("grp"))
          .agg(countDistinct(col("c_nationkey")).as("exact_nations"))
        est.join(exact, Seq("grp")).withColumnRenamed("grp", "c_mktsegment")
      },
      Some(
        s"""WITH hv AS (
          |  SELECT c_mktsegment AS grp,
          |         ('0x' || substr(md5(c_nationkey::varchar), 1, 15))::bigint AS h
          |  FROM customer),
          |regs AS MATERIALIZED (
          |  SELECT grp, h % 64 AS bucket,
          |         max(CASE WHEN h // 64 = 0 THEN 55
          |                  ELSE 55 - length(bin(h // 64)) END)::bigint AS register
          |  FROM hv GROUP BY 1, 2)
          |""".stripMargin + hllEstimateCte +
        s"""SELECT e.grp AS c_mktsegment, e.n_zero, e.s_num, e.est_raw,
          |       $hllCorrectedEstSql,
          |       x.exact_nations
          |FROM est e JOIN (
          |  SELECT c_mktsegment AS grp,
          |         count(DISTINCT c_nationkey)::bigint AS exact_nations
          |  FROM customer GROUP BY 1) x USING (grp)""".stripMargin)),

    // Mergeability, oracle-pinned: registers over the even- and odd-
    // event_id halves built SEPARATELY, combined by bucket-wise max
    // (associative/commutative/idempotent), then estimated. The oracle
    // computes the union directly — merge-of-parts must hash-equal the
    // whole, which is exactly the property that makes the register frame a
    // persistable incremental-admission artifact (yesterday's ≤ 64 rows
    // per group + today's batch, never rescan — the signatureIndex warm
    // path, HLL edition).
    ("sketch_hll_merged",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val v = concat_ws(":", col("user_id"), to_date(col("ts")))
        val a = Sketches.hllRegisters(
          ev.where(col("event_id") % 2 === 0), col("event_type"), v)
        val b = Sketches.hllRegisters(
          ev.where(col("event_id") % 2 =!= 0), col("event_type"), v)
        Sketches.hllEstimate(Sketches.hllMerge(a, b))
          .withColumnRenamed("grp", "event_type")
      },
      Some(hllRegisterCtes + hllEstimateCte +
        "SELECT grp AS event_type, n_zero, s_num, est_raw FROM est"))
  )

  /** DuckDB register-table SQL for the portable-HLL family (p=6, m=64 over
    * the 60-bit portable hash: bucket = h % 64, rank = 55 − bitlen(h//64),
    * bitlen via base-2 digit count — the exact mirror of
    * [[Sketches.hllRegisters]]). */
  private lazy val hllRegisterCtes: String =
    """WITH hv AS (
      |  SELECT event_type AS grp,
      |         ('0x' || substr(md5(user_id::varchar || ':' || (ts::date)::varchar), 1, 15))::bigint
      |           AS h
      |  FROM events),
      |regs AS MATERIALIZED (
      |  SELECT grp, h % 64 AS bucket,
      |         max(CASE WHEN h // 64 = 0 THEN 55
      |                  ELSE 55 - length(bin(h // 64)) END)::bigint AS register
      |  FROM hv GROUP BY 1, 2)
      |""".stripMargin

  /** DuckDB oracle for the BPE encode rows (train CTE chain re-deriving
    * the same 3 merges, then the same greedy folds per document) — shared
    * by `text_bpe_encode` (in-query training) and `text_bpe_served`
    * (persisted-vocabulary serving). */
  private lazy val bpeEncodeSql: String = {
          def iter(i: Int): String =
            s"""p$i AS (
               |  SELECT pr['a'] AS a, pr['b'] AS b, sum(w)::bigint AS n
               |  FROM (SELECT unnest(list_transform(range(1, len(syms)),
               |                      j -> {'a': syms[j], 'b': syms[j + 1]})) AS pr, w
               |        FROM w${i - 1} WHERE len(syms) >= 2)
               |  GROUP BY 1, 2),
               |r$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
               |w$i AS (
               |  SELECT list_reduce(list_prepend([]::varchar[], list_transform(syms, x -> [x])),
               |           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = r$i.a AND x[1] = r$i.b
               |                       THEN list_append(acc[1:-2], r$i.a || r$i.b)
               |                       ELSE list_append(acc, x[1]) END) AS syms, w
               |  FROM w${i - 1}, r$i),
               |""".stripMargin
          s"""WITH tok AS (
             |  SELECT token, count(*) AS w
             |  FROM (SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
             |        FROM documents)
             |  GROUP BY 1),
             |w0 AS (SELECT list_transform(range(1, length(token) + 1), i -> token[i]) AS syms, w FROM tok),
             |${iter(1)}${iter(2)}${iter(3)}dtoks AS (
             |  SELECT doc_id,
             |         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
             |  FROM documents),
             |enc AS (
             |  SELECT doc_id, toks,
             |         flatten(list_transform(toks, tok ->
             |           list_reduce(list_prepend([]::varchar[], list_transform(
             |             list_reduce(list_prepend([]::varchar[], list_transform(
             |               list_reduce(list_prepend([]::varchar[], list_transform(
             |                 list_transform(range(1, length(tok) + 1), i -> tok[i]),
             |                 x -> [x])),
             |                 (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = r1.a AND x[1] = r1.b
             |                             THEN list_append(acc[1:-2], r1.a || r1.b)
             |                             ELSE list_append(acc, x[1]) END),
             |               x -> [x])),
             |               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = r2.a AND x[1] = r2.b
             |                           THEN list_append(acc[1:-2], r2.a || r2.b)
             |                           ELSE list_append(acc, x[1]) END),
             |             x -> [x])),
             |             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = r3.a AND x[1] = r3.b
             |                         THEN list_append(acc[1:-2], r3.a || r3.b)
             |                         ELSE list_append(acc, x[1]) END))) AS flat
             |  FROM dtoks, r1, r2, r3)
             |SELECT doc_id, len(toks)::int AS n_tokens, len(flat)::int AS n_bpe_tokens,
             |       coalesce(list_sum(list_transform(flat,
             |         s -> ('0x' || substr(md5(s), 1, 15))::bigint % 1099511627776)), 0)::bigint AS bpe_checksum
             |FROM enc""".stripMargin
  }

  /** Small-range-corrected estimate as a DuckDB select-list expression over
    * the `est` CTE (aliased `e`): linear counting m·ln(m/V) via the shared
    * driver-rendered literal table when any bucket is empty and the raw
    * estimate sits below 2.5·m, else the raw estimate — the exact mirror of
    * [[Sketches.hllEstimateCorrected]]'s branch. */
  private lazy val hllCorrectedEstSql: String =
    s"""CASE WHEN e.n_zero > 0 AND e.est_raw <= 160.0
       |            THEN (${Sketches.hllLinearLiteralList(6)})[e.n_zero::int]
       |            ELSE e.est_raw END AS est""".stripMargin

  /** The estimate CTE over [[hllRegisterCtes]]'s register table — integer
    * harmonic numerator, then ONE IEEE division by the shared
    * [[Sketches.hllConstLiteral]] plan-time constant. */
  private lazy val hllEstimateCte: String =
    s""", est AS MATERIALIZED (
       |  SELECT grp,
       |         (64 - count(*))::bigint AS n_zero,
       |         (sum(1::bigint << (55 - register)::int)
       |            + (64 - count(*)) * (1::bigint << 55))::bigint AS s_num,
       |         ${Sketches.hllConstLiteral(6)}::double /
       |           ((sum(1::bigint << (55 - register)::int)
       |               + (64 - count(*)) * (1::bigint << 55))::bigint)::double
       |           AS est_raw
       |  FROM regs GROUP BY 1)
       |""".stripMargin

  /** DuckDB MinHash signature SQL generated from the SAME (a,b) constants as
    * [[Dedup.minhashSignatures]] — single source of truth for the family. */
  private lazy val minhashSigsSql: String = {
    val aList = Dedup.minhashPerms.map(_._1).mkString("[", ", ", "]")
    val bList = Dedup.minhashPerms.map(_._2).mkString("[", ", ", "]")
    s"""SELECT doc_id, perm::int AS perm,
       |       min(($aList[perm + 1] * h + $bList[perm + 1]) % ${Dedup.MinhashPrime}) AS minhash
       |FROM (SELECT doc_id,
       |             ('0x' || substr(md5(shingle), 1, 15))::bigint % ${Dedup.MinhashPrime} AS h
       |      FROM shingle_rows)
       |CROSS JOIN (SELECT unnest(range(0, 16)) AS perm)
       |GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB CTE chain shingles → MinHash sigs → LSH bands → candidate pairs,
    * mirroring [[Dedup.lshCandidates]]'s clique semantics (the testdata's
    * buckets are far below the hot-bucket cap, where clique == capped). */
  private lazy val lshCandCtes: String =
    shingleCte +
      s""", sigs AS ($minhashSigsSql),
        |buckets AS (
        |  SELECT doc_id, perm // 4 AS band,
        |         md5(string_agg(minhash::varchar, ',' ORDER BY perm)) AS bucket
        |  FROM sigs GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        |  FROM buckets l JOIN buckets r
        |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
        |""".stripMargin

  /** DuckDB CTEs verifying candidate pairs with exact n-gram Jaccard,
    * mirroring [[Dedup.ngramJaccard]] fed by `cand`. */
  // ==== perceptron oracle: the training loop unrolled as CTEs =============
  // Each iteration k is one aggregate over `feats` gated on the PREVIOUS
  // iteration's weights (scalar subqueries into it{k-1}); weight sums are
  // ::bigint-cast out of DuckDB's HUGEINT. Mirrors Learn.solve exactly.
  private lazy val learnFeatsCte: String = {
    val split =
      """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""
    val counts = Learn.markerWords.map(w =>
      s"len(list_filter($split, t -> t = '$w'))::bigint AS x_$w")
      .mkString(",\n           ")
    val (posW, negW) = Learn.markerWords.splitAt(3)
    val pos = posW.map(w => s"x_$w").mkString(" + ")
    val neg = negW.map(w => s"x_$w").mkString(" + ")
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id,
       |         (CASE WHEN $pos > $neg THEN 1 ELSE -1 END)::bigint AS y,
       |         ${Learn.markerWords.map(w => s"x_$w").mkString(", ")},
       |         1::bigint AS x_bias
       |  FROM (
       |    SELECT doc_id,
       |           $counts
       |    FROM documents))""".stripMargin
  }

  private def perceptronIterCtes(iters: Int): String = {
    val fc = Learn.featureCols
    def w(k: Int, n: String) = if (k == 0) "0" else s"(SELECT w_$n FROM it$k)"
    (1 to iters).map { k =>
      val margin = fc.map(n => s"${w(k - 1, n)} * $n").mkString(" + ")
      val mis = s"y * ($margin) <= 0"
      val ws = fc.map(n =>
        s"${w(k - 1, n)} + coalesce(sum(CASE WHEN $mis THEN y * $n ELSE 0 END), 0)::bigint AS w_$n")
        .mkString(",\n         ")
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
      // reference, and it{k} references it{k-1} once per weight — without
      // it the 16-iteration chain re-evaluates ~6^16 scans of documents
      s"""it$k AS MATERIALIZED (
         |  SELECT ${k}::bigint AS iter,
         |         $ws,
         |         coalesce(sum(CASE WHEN $mis THEN 1 ELSE 0 END), 0)::bigint AS n_mis
         |  FROM feats)""".stripMargin
    }.mkString(",\n")
  }

  private def perceptronHistorySql(iters: Int): String =
    s"WITH $learnFeatsCte,\n${perceptronIterCtes(iters)}\n" +
      (1 to iters).map(k =>
        s"SELECT iter, ${Learn.featureCols.map(n => s"w_$n").mkString(", ")}, n_mis FROM it$k")
        .mkString("\nUNION ALL\n")

  private def perceptronPredsSql(iters: Int): String = {
    val score = Learn.featureCols.map(n => s"w_$n * $n").mkString(" + ")
    s"WITH $learnFeatsCte,\n${perceptronIterCtes(iters)}\n" +
      s"""SELECT doc_id, y, ($score)::bigint AS score,
         |       CASE WHEN y * ($score) > 0 THEN 1 ELSE 0 END AS correct
         |FROM feats, it$iters""".stripMargin
  }

  private def perceptronAvgPredsSql(iters: Int): String = {
    val fc = Learn.featureCols
    val sums = fc.map(n => s"sum(w_$n)::bigint AS w_$n").mkString(", ")
    val score = fc.map(n => s"w_$n * $n").mkString(" + ")
    s"WITH $learnFeatsCte,\n${perceptronIterCtes(iters)},\n" +
      s"""avgw AS MATERIALIZED (
         |  SELECT $sums
         |  FROM (${(1 to iters).map(k => s"SELECT * FROM it$k").mkString(" UNION ALL ")}))
         |SELECT doc_id, y, ($score)::bigint AS score,
         |       CASE WHEN y * ($score) > 0 THEN 1 ELSE 0 END AS correct
         |FROM feats, avgw""".stripMargin
  }

  // ==== ridge oracle: 3×3 normal equations in HUGEINT =====================
  // Same marker-count features as the perceptron family; x = (scan, join,
  // bias), target y_t = filter+sort+merge counts. Cramer numerators and the
  // determinant expand symbolically (A is symmetric), all in HUGEINT,
  // emitted ::varchar to match Spark's decimal(38,0)-as-string encoding.
  private[graft] val ridgeXc: Seq[String] = Seq("x_scan", "x_join", "x_bias")

  private def ridgeFeats(s: SparkSession, d: String): DataFrame =
    Learn.markerFeatures(Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumn("y_t", col("x_filter") + col("x_sort") + col("x_merge"))

  private lazy val ridgeSolveCtes: String =
    s"WITH $learnFeatsCte,\n" +
      """ft AS MATERIALIZED (
        |  SELECT doc_id, x_scan AS x1, x_join AS x2, x_bias AS x3,
        |         (x_filter + x_sort + x_merge)::bigint AS yt
        |  FROM feats),
        |g AS (
        |  SELECT coalesce(sum(x1*x1), 0)::hugeint AS s11,
        |         coalesce(sum(x1*x2), 0)::hugeint AS s12,
        |         coalesce(sum(x1*x3), 0)::hugeint AS s13,
        |         coalesce(sum(x2*x2), 0)::hugeint AS s22,
        |         coalesce(sum(x2*x3), 0)::hugeint AS s23,
        |         coalesce(sum(x3*x3), 0)::hugeint AS s33,
        |         coalesce(sum(x1*yt), 0)::hugeint AS b1,
        |         coalesce(sum(x2*yt), 0)::hugeint AS b2,
        |         coalesce(sum(x3*yt), 0)::hugeint AS b3
        |  FROM ft),
        |a AS (
        |  SELECT s11 + 1 AS a11, s12 AS a12, s13 AS a13,
        |         s22 + 1 AS a22, s23 AS a23, s33 + 1 AS a33,
        |         b1, b2, b3
        |  FROM g),
        |slv AS MATERIALIZED (
        |  SELECT a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |           + a13*(a12*a23 - a22*a13) AS det,
        |         b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
        |           + a13*(b2*a23 - a22*b3) AS w1,
        |         a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
        |           + a13*(a12*b3 - b2*a13) AS w2,
        |         a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
        |           + b1*(a12*a23 - a22*a13) AS w3
        |  FROM a)
        |""".stripMargin

  private lazy val ridgeWeightsSql: String =
    ridgeSolveCtes +
      """SELECT 0::bigint AS pos, 'x_scan' AS feature,
        |       w1::varchar AS w_num, det::varchar AS det FROM slv
        |UNION ALL
        |SELECT 1::bigint, 'x_join', w2::varchar, det::varchar FROM slv
        |UNION ALL
        |SELECT 2::bigint, 'x_bias', w3::varchar, det::varchar FROM slv""".stripMargin

  private lazy val ridgePredsSql: String =
    ridgeSolveCtes +
      """SELECT doc_id, yt AS y_t,
        |       (x1*w1 + x2*w2 + x3*w3)::varchar AS pred_num,
        |       (x1*w1 + x2*w2 + x3*w3 - yt*det)::varchar AS res_num
        |FROM ft CROSS JOIN slv""".stripMargin

  /** Grouped (per-source) 3×3 ridge solve — the same cofactor expansion as
    * [[ridgeSolveCtes]] applied per group; DuckDB's sum(BIGINT) is already
    * HUGEINT so every product stays in 128-bit integers. */
  private lazy val ridgeGroupedSql: String = {
    val split =
      """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""
    def cnt(w: String) = s"len(list_filter($split, t -> t = '$w'))::bigint"
    s"""WITH ftg AS MATERIALIZED (
       |  SELECT source AS grp,
       |         ${cnt("scan")} AS x1,
       |         ${cnt("join")} AS x2,
       |         1::bigint AS x3,
       |         (${cnt("filter")} + ${cnt("sort")} + ${cnt("merge")})::bigint AS yt
       |  FROM documents),
       |gg AS (
       |  SELECT grp,
       |         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x1*x3) AS s13,
       |         sum(x2*x2) AS s22, sum(x2*x3) AS s23, sum(x3*x3) AS s33,
       |         sum(x1*yt) AS b1, sum(x2*yt) AS b2, sum(x3*yt) AS b3
       |  FROM ftg GROUP BY grp),
       |ag AS (
       |  SELECT grp, s11 + 1 AS a11, s12 AS a12, s13 AS a13,
       |         s22 + 1 AS a22, s23 AS a23, s33 + 1 AS a33, b1, b2, b3
       |  FROM gg),
       |sg AS MATERIALIZED (
       |  SELECT grp,
       |         a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
       |           + a13*(a12*a23 - a22*a13) AS det,
       |         b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
       |           + a13*(b2*a23 - a22*b3) AS w1,
       |         a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
       |           + a13*(a12*b3 - b2*a13) AS w2,
       |         a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
       |           + b1*(a12*a23 - a22*a13) AS w3
       |  FROM ag)
       |SELECT grp, 0::bigint AS pos, 'x_scan' AS feature,
       |       w1::varchar AS w_num, det::varchar AS det FROM sg
       |UNION ALL
       |SELECT grp, 1::bigint, 'x_join', w2::varchar, det::varchar FROM sg
       |UNION ALL
       |SELECT grp, 2::bigint, 'x_bias', w3::varchar, det::varchar FROM sg""".stripMargin
  }

  private lazy val nearDupVerifyCtes: String =
    """, ssets AS (SELECT doc_id, count(*) AS n FROM shingle_rows GROUP BY 1),
      |inter AS (
      |  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      |  FROM cand p
      |  JOIN shingle_rows a ON a.doc_id = p.doc_a
      |  JOIN shingle_rows b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2),
      |verified AS (
      |  SELECT p.doc_a, p.doc_b,
      |         coalesce(i.n_inter, 0) AS n_inter,
      |         cast(sa.n AS int) AS n_a, cast(sb.n AS int) AS n_b,
      |         cast(coalesce(i.n_inter, 0) AS double)
      |           / (sa.n + sb.n - coalesce(i.n_inter, 0)) AS jaccard
      |  FROM cand p
      |  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
      |  JOIN ssets sa ON sa.doc_id = p.doc_a
      |  JOIN ssets sb ON sb.doc_id = p.doc_b)
      |""".stripMargin

  /** DuckDB CTE chain computing [[TextOps.qualityFilter]]'s metrics over
    * `table` (which must expose doc_id, text); terminal CTE is `qmetrics`.
    * Thresholds live in the caller's SQL so they stay visibly in sync with
    * the Scala defaults. */
  private def qualityMetricsCtes(table: String): String =
    s"""WITH qn AS (
      |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
      |  FROM $table),
      |qt AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM qn),
      |qmetrics AS (
      |  SELECT doc_id,
      |         len(toks)::int AS n_tokens,
      |         cast(length(norm) - (len(toks) - 1) AS double) / len(toks) AS avg_token_len,
      |         cast(len(regexp_extract_all(norm, '[^a-z0-9 ]')) AS double) / len(toks) AS symbol_ratio,
      |         cast(len(list_filter(toks, x -> regexp_matches(x, '[0-9]'))) AS double)
      |           / len(toks) AS digit_token_ratio,
      |         len(list_filter(toks, x -> x IN ('the','a','of','and','is')))::int AS n_stopwords
      |  FROM qt)
      |""".stripMargin

  /** The catalog's fixed hash-classifier weight vector (text_classifier_score
    * and both eval rows — one definition so they cannot drift). */
  private val clfWeights: Seq[Long] =
    Seq(5L, -3L, 7L, 2L, -8L, 4L, 1L, -2L, 6L, -5L, 3L, 9L, -1L, -4L, 8L, 2L)

  /** DuckDB CTEs producing the (score = classifier margin, label = quality
    * gate) frame `joined` — the input both eval rows aggregate. Mirrors
    * [[TextOps.classifierScore]] (clfWeights, bias −40) joined to
    * [[TextOps.qualityFilter]]'s default-threshold verdict. */
  private lazy val clfLabelCtes: String =
    qualityMetricsCtes("documents") +
      """, ct AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |cw AS (SELECT [5, -3, 7, 2, -8, 4, 1, -2, 6, -5, 3, 9, -1, -4, 8, 2] AS wv),
        |cv AS (
        |  SELECT doc_id,
        |         list_transform(range(0, 16),
        |           b -> len(list_filter(toks,
        |                  tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 16 = b))) AS vec
        |  FROM ct),
        |cm AS (
        |  SELECT doc_id,
        |         (list_sum(list_transform(range(0, 16), i -> vec[i + 1] * wv[i + 1])) - 40)::bigint AS margin
        |  FROM cv CROSS JOIN cw),
        |labels AS (
        |  SELECT doc_id,
        |         (CASE WHEN n_tokens BETWEEN 20 AND 80 AND avg_token_len BETWEEN 3.0 AND 8.0
        |               AND symbol_ratio <= 0.1 AND digit_token_ratio <= 0.2
        |               AND n_stopwords >= 1 THEN 1 ELSE 0 END) AS label
        |  FROM qmetrics),
        |joined AS (
        |  SELECT cm.margin AS score, l.label
        |  FROM cm JOIN labels l USING (doc_id))
        |""".stripMargin

  /** Shared DuckDB CTE: distinct 3-gram word shingles per document, matching
    * [[TextOps.shingles]] exactly (incl. the short-document whole-text case). */
  private lazy val shingleCte: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |shingle_rows AS (
      |  SELECT DISTINCT doc_id, shingle
      |  FROM (SELECT doc_id,
      |               unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
      |                      ELSE list_transform(range(0, len(toks) - 2),
      |                                          i -> array_to_string(toks[i + 1:i + 3], ' ')) END) AS shingle
      |        FROM toks))
      |""".stripMargin

  /** Synthesized raw URL per document row — every canonicalization hazard
    * on a deterministic doc_id schedule: mixed-case scheme/host, www and
    * multi-label-suffix variants, explicit :443, shared /p/N paths (real
    * dedup collisions), trailing slash, tracking-only query with an
    * occasionally-kept real parameter, #fragment. */
  private def webUrl(): Column =
    concat(lit("HTTPS://"),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"),
      when(col("doc_id") % 3 === 0, lit(".CO.UK")).otherwise(lit(".COM")),
      when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), (col("doc_id") % 5).cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&ref=tw"),
      when(col("doc_id") % 11 === 0, lit("&page=2")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))

  /** The train/test contamination oracle — shared VERBATIM by
    * `text_contamination` and `text_contamination_bloom`: the bloom variant
    * is exact (no false negatives + exact verify join), so both rows must
    * hash-match this one SQL. */
  private lazy val contaminationOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % 100 AS b,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, b, shingle FROM (
      |    SELECT doc_id, b,
      |           unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
      |                  ELSE list_transform(range(0, len(toks) - 2),
      |                                      i -> array_to_string(toks[i + 1:i + 3], ' ')) END) AS shingle
      |    FROM toks)),
      |train AS (SELECT DISTINCT shingle FROM sh WHERE b < 80),
      |tst AS (SELECT doc_id, shingle FROM sh WHERE b >= 90),
      |ov AS (
      |  SELECT t.doc_id, count(*)::bigint AS n_shingles,
      |         sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_overlap
      |  FROM tst t LEFT JOIN train tr ON t.shingle = tr.shingle
      |  GROUP BY 1)
      |SELECT doc_id, n_shingles, n_overlap,
      |       cast(n_overlap AS double) / n_shingles AS overlap_ratio,
      |       (CASE WHEN cast(n_overlap AS double) / n_shingles >= 0.9
      |             THEN 1 ELSE 0 END)::int AS contaminated
      |FROM ov""".stripMargin

  /** DuckDB CTE body deriving the CANONICAL parts of [[webUrl]] from the
    * same doc_id arithmetic — independent of the Spark normalizer: the
    * scheme/case/port/slash/fragment/tracking hazards never appear, the
    * kept parameter and multi-label suffix do. */
  private lazy val webUrlCanonCte: String =
    """SELECT doc_id, n_chars,
      |       concat(CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END, source,
      |              CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END) AS host,
      |       concat('/p/', (doc_id % 5)::varchar) AS path,
      |       CASE WHEN doc_id % 11 = 0 THEN '?page=2' ELSE '' END AS q,
      |       concat(source,
      |              CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END)
      |         AS registered_domain
      |FROM documents""".stripMargin

  // ==== retrieval-ranking eval (eval_ndcg_retrieval / eval_retrieval_mean)

  /** The fixed query set: (query id, term bag). Terms are corpus-common
    * marker words so every query retrieves a full candidate list.
    * defs/lazy, not vals: the catalog val initializes BEFORE later object
    * members, and a strict val here would still be null when the catalog
    * row forces the oracle SQL (the entityMatchCtes lesson). */
  private[graft] def retrievalQueries: Seq[(String, Seq[String])] = Seq(
    ("q_ops", Seq("join", "filter", "scan")),
    ("q_data", Seq("data", "table", "vector")),
    ("q_win", Seq("window", "group", "merge")))

  private def retrievalK = 5
  private def retrievalTopN = 20
  private def rrScale = 1L << 20

  /** Per-query NDCG@5 frame: BM25 top-20 per query, term-coverage
    * relevance, [[Eval.ndcgAtK]]. The hits side is 3 × 20 rows — it
    * BROADCASTS against the corpus-sized token frame for the relevance
    * join, so the only full-corpus work is the BM25 scoring itself. */
  private[graft] def retrievalNdcgPerQuery(s: SparkSession, d: String)
      : DataFrame = {
    val docs = Tables.documents(s, d)
    val hits = retrievalQueries.map { case (qid, terms) =>
      TextOps.bm25(docs, col("text"), col("doc_id"), terms)
        .orderBy(col("score").desc, col("doc_id")).limit(retrievalTopN)
        .withColumn("query", lit(qid))
    }.reduce(_ unionByName _)
    val docToks = docs.select(col("doc_id"),
      TextOps.tokens(TextOps.normalize(col("text"))).as("toks"))
    val rel = retrievalQueries.foldRight(lit(0L): Column) {
      case ((qid, terms), acc) =>
        when(col("query") === qid,
          terms.map(t => when(array_contains(col("toks"), t), 1L)
            .otherwise(0L)).reduce(_ + _)).otherwise(acc)
    }
    val withRel = docToks.join(broadcast(hits), "doc_id")
      .withColumn("rel", rel)
    Eval.ndcgAtK(withRel, col("query"), col("doc_id"), col("score"),
      col("rel"), retrievalK, rrScale)
  }

  /** DuckDB CTE chain up to the per-query metric frame `perq` — the BM25
    * pipeline replicated per query (same expression association order as
    * the text_bm25_search oracle), term-coverage relevance, rank/irank
    * windows, and the SAME [[Eval.dcgWeights]] literals Spark plans. */
  private lazy val retrievalNdcgCtes: String = {
    val wList = Eval.dcgWeights(retrievalK).mkString("[", ", ", "]")
    val perQueryCtes = retrievalQueries.map { case (qid, terms) =>
      val inList = terms.map(t => s"'$t'").mkString(", ")
      val mix = terms.map(t =>
        s"coalesce(max(CASE WHEN token = '$t' THEN term_score END), 0.0)")
        .mkString("\n|         + ")
      s"""tf_$qid AS (
         |  SELECT doc_id, dl, token, count(*)::bigint AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dl)
         |  WHERE token IN ($inList) GROUP BY 1, 2, 3),
         |df_$qid AS (SELECT token, count(*)::bigint AS df FROM tf_$qid GROUP BY 1),
         |sc_$qid AS (
         |  SELECT tf.doc_id, tf.token,
         |         ((cast(s.n_docs - df.df AS double) + 0.5)
         |            / (cast(df.df AS double) + 0.5))
         |           * (cast(tf.tf AS double) * (1.2 + 1.0))
         |           / (cast(tf.tf AS double) + 1.2 * ((1.0 - 0.75)
         |                + 0.75 * (cast(tf.dl AS double)
         |                            / (cast(s.sum_dl AS double)
         |                                 / cast(s.n_docs AS double))))) AS term_score
         |  FROM tf_$qid tf CROSS JOIN stats s JOIN df_$qid df ON tf.token = df.token),
         |agg_$qid AS (
         |  SELECT doc_id,
         |         $mix AS score
         |  FROM sc_$qid GROUP BY 1),
         |top_$qid AS (
         |  SELECT '$qid' AS query, doc_id, score FROM agg_$qid
         |  ORDER BY score DESC, doc_id LIMIT $retrievalTopN)""".stripMargin
    }.mkString(",\n")
    val hitsUnion = retrievalQueries
      .map { case (qid, _) => s"SELECT * FROM top_$qid" }
      .mkString("\n|  UNION ALL ")
    val relCase = retrievalQueries.map { case (qid, terms) =>
      val cover = terms.map(t =>
        s"(CASE WHEN list_contains(d.toks, '$t') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"WHEN h.query = '$qid' THEN $cover"
    }.mkString("\n|              ")
    s"""WITH lens AS (
       |  SELECT doc_id,
       |         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, len(toks)::bigint AS dl, toks FROM lens),
       |stats AS (SELECT count(*)::bigint AS n_docs, sum(len(toks))::bigint AS sum_dl
       |          FROM lens),
       |$perQueryCtes,
       |hits AS (
       |  $hitsUnion),
       |hr AS (
       |  SELECT h.query, h.doc_id, h.score,
       |         (CASE $relCase
       |              END)::bigint AS rel
       |  FROM hits h JOIN dl d ON d.doc_id = h.doc_id),
       |ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank,
       |         row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc_id) AS irank
       |  FROM hr),
       |perq AS (
       |  SELECT query, count(*)::bigint AS n_hits,
       |         sum(CASE WHEN rank <= $retrievalK
       |                  THEN rel * list_extract($wList, rank::int) ELSE 0 END)::bigint AS dcg_scaled,
       |         sum(CASE WHEN irank <= $retrievalK
       |                  THEN rel * list_extract($wList, irank::int) ELSE 0 END)::bigint AS idcg_scaled,
       |         min(CASE WHEN rel > 0 THEN rank END)::int AS first_rel_rank
       |  FROM ranked GROUP BY 1)""".stripMargin
  }

  private lazy val retrievalNdcgSql: String = retrievalNdcgCtes +
    s"""
       |SELECT query, n_hits, dcg_scaled, idcg_scaled,
       |       CASE WHEN idcg_scaled > 0
       |            THEN CAST((dcg_scaled * $rrScale) // idcg_scaled AS bigint)
       |            END AS ndcg_scaled,
       |       CASE WHEN idcg_scaled > 0
       |            THEN dcg_scaled::double / idcg_scaled END AS ndcg,
       |       first_rel_rank,
       |       CAST($rrScale // first_rel_rank AS bigint) AS rr_scaled
       |FROM perq""".stripMargin

  private lazy val retrievalMeanSql: String = retrievalNdcgCtes +
    s""",
       |scaled AS (
       |  SELECT CASE WHEN idcg_scaled > 0
       |              THEN CAST((dcg_scaled * $rrScale) // idcg_scaled AS bigint)
       |              END AS ndcg_scaled,
       |         CAST($rrScale // first_rel_rank AS bigint) AS rr_scaled
       |  FROM perq)
       |SELECT count(*)::bigint AS n_queries,
       |       sum(coalesce(ndcg_scaled, 0))::bigint AS sum_ndcg_scaled,
       |       sum(coalesce(ndcg_scaled, 0))::double
       |         / (${rrScale.toDouble} * count(*)) AS mean_ndcg,
       |       sum(coalesce(rr_scaled, 0))::bigint AS sum_rr_scaled,
       |       sum(coalesce(rr_scaled, 0))::double
       |         / (${rrScale.toDouble} * count(*)) AS mrr
       |FROM scaled""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (n, f, _) => n -> f }.toMap ++
      QueriesSql.entries.map { case (n, f, _) => n -> f }

  def oracleSql: Map[String, String] = {
    val base = catalog.collect { case (n, _, Some(sql)) => n -> sql }.toMap
    // SQL-frontend battery rows are gated on their DataFrame twin's oracle:
    // one oracle, two frontends, one hash.
    base ++ QueriesSql.entries.flatMap { case (n, _, twin) =>
      base.get(twin).map(n -> _)
    }
  }
}
