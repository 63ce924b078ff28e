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

  private[graft] def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Exact, order-independent double sum: through decimal(18,scale).
    * The scale must cover the value's exact decimal width (2 for raw money
    * columns, 4 for price*(1-disc), 6 for price*(1-disc)*(1+tax)) so the
    * double→decimal rounding never lands on a tie — Spark rounds HALF_UP,
    * DuckDB half-even, and only ties expose the difference. */
  private[graft] def sumDec(c: Column, scale: Int = 2): Column =
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
  private[graft] val usersCte =
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
  private[graft] val flightCte =
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
  private[graft] val knnGraphCte = knnGraphCteOver("embeddings")

  /** DuckDB CTE chain computing per-band LSH buckets (plus double vectors
    * and norms) for `table`, every CTE name prefixed with `p` so TWO
    * corpora can carry the chain side by side in one query (the admission
    * oracles). Planes mirror [[graft.operators.Similarity.lshBandBucketsFast]]
    * (nBands=4, rowsPerBand=2). Emits `<p>v`, `<p>n`, `<p>bb`; ends with a
    * trailing comma for further CTEs. */
  private[graft] def lshBucketsCteOver(table: String, p: String = ""): String =
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
  private[graft] def knnGraphCteOver(table: String, k: Int = 5): String =
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
  private[graft] lazy val labelSpreadOracle: String = knnGraphCte +
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
  private[graft] lazy val labelAdmitOracle: String =
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
  private[graft] def dirtyCustomerParts(s: SparkSession, d: String)
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
  private[graft] lazy val entityResolveOracle = entityMatchCtes +
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
  private[graft] def entityElection(dirty: DataFrame, labels: DataFrame): DataFrame = {
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
  private[graft] val entityMatchCtes =
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

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    QueriesCore.rows ++ QueriesTpch.rows ++ QueriesTextDedup.rows ++
      QueriesSimMedia.rows ++ QueriesRelTs.rows

  /** DuckDB register-table SQL for the portable-HLL family (p=6, m=64 over
    * the 60-bit portable hash: bucket = h % 64, rank = 55 − bitlen(h//64),
    * bitlen via base-2 digit count — the exact mirror of
    * [[Sketches.hllRegisters]]). */
  private[graft] lazy val hllRegisterCtes: String =
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
  private[graft] lazy val bpeEncodeSql: String = {
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
  private[graft] lazy val hllCorrectedEstSql: String =
    s"""CASE WHEN e.n_zero > 0 AND e.est_raw <= 160.0
       |            THEN (${Sketches.hllLinearLiteralList(6)})[e.n_zero::int]
       |            ELSE e.est_raw END AS est""".stripMargin

  /** The estimate CTE over [[hllRegisterCtes]]'s register table — integer
    * harmonic numerator, then ONE IEEE division by the shared
    * [[Sketches.hllConstLiteral]] plan-time constant. */
  private[graft] lazy val hllEstimateCte: String =
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
  private[graft] lazy val minhashSigsSql: String = {
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
  private[graft] lazy val lshCandCtes: String =
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
  private[graft] lazy val learnFeatsCte: String = {
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

  private[graft] def perceptronIterCtes(iters: Int): String = {
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

  private[graft] def perceptronHistorySql(iters: Int): String =
    s"WITH $learnFeatsCte,\n${perceptronIterCtes(iters)}\n" +
      (1 to iters).map(k =>
        s"SELECT iter, ${Learn.featureCols.map(n => s"w_$n").mkString(", ")}, n_mis FROM it$k")
        .mkString("\nUNION ALL\n")

  private[graft] def perceptronPredsSql(iters: Int): String = {
    val score = Learn.featureCols.map(n => s"w_$n * $n").mkString(" + ")
    s"WITH $learnFeatsCte,\n${perceptronIterCtes(iters)}\n" +
      s"""SELECT doc_id, y, ($score)::bigint AS score,
         |       CASE WHEN y * ($score) > 0 THEN 1 ELSE 0 END AS correct
         |FROM feats, it$iters""".stripMargin
  }

  private[graft] def perceptronAvgPredsSql(iters: Int): String = {
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

  private[graft] def ridgeFeats(s: SparkSession, d: String): DataFrame =
    Learn.markerFeatures(Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumn("y_t", col("x_filter") + col("x_sort") + col("x_merge"))

  private[graft] lazy val ridgeSolveCtes: String =
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

  private[graft] lazy val ridgeWeightsSql: String =
    ridgeSolveCtes +
      """SELECT 0::bigint AS pos, 'x_scan' AS feature,
        |       w1::varchar AS w_num, det::varchar AS det FROM slv
        |UNION ALL
        |SELECT 1::bigint, 'x_join', w2::varchar, det::varchar FROM slv
        |UNION ALL
        |SELECT 2::bigint, 'x_bias', w3::varchar, det::varchar FROM slv""".stripMargin

  private[graft] lazy val ridgePredsSql: String =
    ridgeSolveCtes +
      """SELECT doc_id, yt AS y_t,
        |       (x1*w1 + x2*w2 + x3*w3)::varchar AS pred_num,
        |       (x1*w1 + x2*w2 + x3*w3 - yt*det)::varchar AS res_num
        |FROM ft CROSS JOIN slv""".stripMargin

  /** Grouped (per-source) 3×3 ridge solve — the same cofactor expansion as
    * [[ridgeSolveCtes]] applied per group; DuckDB's sum(BIGINT) is already
    * HUGEINT so every product stays in 128-bit integers. */
  private[graft] lazy val ridgeGroupedSql: String = {
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

  private[graft] lazy val nearDupVerifyCtes: String =
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
  private[graft] def qualityMetricsCtes(table: String): String =
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
  private[graft] val clfWeights: Seq[Long] =
    Seq(5L, -3L, 7L, 2L, -8L, 4L, 1L, -2L, 6L, -5L, 3L, 9L, -1L, -4L, 8L, 2L)

  /** DuckDB CTEs producing the (score = classifier margin, label = quality
    * gate) frame `joined` — the input both eval rows aggregate. Mirrors
    * [[TextOps.classifierScore]] (clfWeights, bias −40) joined to
    * [[TextOps.qualityFilter]]'s default-threshold verdict. */
  private[graft] lazy val clfLabelCtes: String =
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
  private[graft] lazy val shingleCte: String =
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
  private[graft] def webUrl(): Column =
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
  private[graft] lazy val contaminationOracleSql: String =
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
  private[graft] lazy val webUrlCanonCte: String =
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

  private[graft] def retrievalK = 5
  private[graft] def retrievalTopN = 20
  private[graft] def rrScale = 1L << 20

  /** Per-query NDCG@5 frame: BM25 top-20 per query, term-coverage
    * relevance, [[Eval.ndcgAtK]]. The hits side is 3 × 20 rows — it
    * BROADCASTS against the corpus-sized token frame for the relevance
    * join, so the only full-corpus work is the BM25 scoring itself —
    * which runs as ONE multi-query pass ([[TextOps.bm25Multi]]: one tf
    * explode over the term union, one stats job, per-query top-20 via a
    * single partitioned rank window; bit-equal to per-query bm25 at a
    * third of the scans). */
  private[graft] def retrievalNdcgPerQuery(s: SparkSession, d: String)
      : DataFrame = {
    val docs = Tables.documents(s, d)
    val scoredAll = TextOps.bm25Multi(docs, col("text"), col("doc_id"),
      retrievalQueries)
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("score").desc, col("doc_id"))
    val hits = scoredAll
      .withColumn("__r", row_number().over(wTop))
      .filter(col("__r") <= retrievalTopN).drop("__r")
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
  private[graft] lazy val retrievalNdcgCtes: String = {
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

  private[graft] lazy val retrievalNdcgSql: String = retrievalNdcgCtes +
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

  private[graft] lazy val retrievalMeanSql: String = retrievalNdcgCtes +
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
