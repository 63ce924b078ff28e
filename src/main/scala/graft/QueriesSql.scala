package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SQL-frontend parity battery: representative catalog queries re-expressed
 * as pure `spark.sql(...)` text over registered temp views — proof that a
 * user can drive the engine from the SQL surface alone (BI tools, notebook
 * SQL cells, `spark-sql` shells) and get BIT-IDENTICAL results to the
 * DataFrame API rows. Each entry is gated on the SAME DuckDB oracle as its
 * DataFrame twin, so the driver's hash compare holds the two frontends to
 * one answer.
 *
 * The slice deliberately spans the engine's families: a TPC-H aggregate, the
 * reference's JSON-parse → window → aggregate flagship (from_json and
 * window() in SQL text), exact/fingerprint dedup, per-user and windowed
 * event stats, text statistics (lambda HOFs in SQL), brute-force ANN through
 * the NATIVE `array_dot` expression, the portable-hash token-budget window,
 * and the `kmin_values` native AGGREGATE — the last two exercising
 * [[graft.plans.GraftExtensions.registerAll]]'s runtime registration path
 * on a session built without extensions (Verify/Bench's sessions).
 *
 * SQL dialect notes (the cross-frontend determinism discipline):
 *  - double literals carry the `D` suffix — Spark parses bare `0.6` as
 *    DECIMAL(1,1), and while decimal→double widening lands on the same
 *    value, the explicit form keeps the expression tree identical to the
 *    DataFrame twin's `lit(0.6)`;
 *  - decimal-routed sums (`CAST(sum(CAST(x AS decimal(18,s))) AS double)`)
 *    mirror Queries.sumDec exactly;
 *  - portable hashes spell the full conv(substr(md5(CAST(.. AS binary))))
 *    chain that TextOps.portableHash builds.
 */
object QueriesSql {

  /** Spark-SQL text for the LSH candidate chain (the `dedup_lsh_candidates`
    * twin): shingles → portable-hash MinHash signatures → banded buckets →
    * same-bucket pairs, with the (a, b) permutation constants and prime
    * interpolated from [[graft.operators.Dedup.minhashPerms]] — one source
    * of truth across the DataFrame operator, the DuckDB oracle, and this
    * SQL frontend. */
  private lazy val lshCandidatesSql: String = {
    import graft.operators.Dedup
    val aArr = Dedup.minhashPerms.map(_._1).mkString("array(", "L, ", "L)")
    val bArr = Dedup.minhashPerms.map(_._2).mkString("array(", "L, ", "L)")
    val p = Dedup.MinhashPrime
    val nPerms = Dedup.minhashPerms.length
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' ') AS toks
       |  FROM documents),
       |shingle_rows AS (
       |  SELECT DISTINCT doc_id, shingle
       |  FROM (SELECT doc_id,
       |               explode(CASE WHEN size(toks) <= 3 THEN array(array_join(toks, ' '))
       |                       ELSE transform(sequence(0, size(toks) - 3),
       |                                      i -> array_join(slice(toks, i + 1, 3), ' ')) END) AS shingle
       |        FROM toks)),
       |hs AS (
       |  SELECT doc_id,
       |         CAST(conv(substr(md5(CAST(shingle AS binary)), 1, 15), 16, 10) AS bigint) % $p AS h
       |  FROM shingle_rows),
       |sigs AS (
       |  SELECT doc_id, perm,
       |         min((element_at($aArr, perm + 1) * h + element_at($bArr, perm + 1)) % $p) AS minhash
       |  FROM (SELECT doc_id, h, explode(sequence(0, ${nPerms - 1})) AS perm FROM hs)
       |  GROUP BY doc_id, perm),
       |buckets AS (
       |  SELECT doc_id, band,
       |         md5(CAST(array_join(transform(sort_array(collect_list(struct(perm, minhash))),
       |                                       s -> CAST(s.minhash AS string)), ',') AS binary)) AS bucket
       |  FROM (SELECT doc_id, perm div 4 AS band, perm, minhash FROM sigs)
       |  GROUP BY doc_id, band)
       |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |FROM buckets l JOIN buckets r
       |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id""".stripMargin
  }

  /** (name, twin catalog row whose oracle gates this entry, views, SQL). */
  val battery: Seq[(String, String, Seq[String], String)] = Seq(

    ("sql_tpch_q1", "tpch_q1", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS sum_disc_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(18,6))) AS double) AS sum_charge,
        |       count(*) AS count_order,
        |       CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),

    ("sql_dedup_exact", "dedup_exact", Seq("documents"),
      """SELECT md5(CAST(text AS binary)) AS text_md5,
        |       min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),

    ("sql_dedup_fingerprint", "dedup_fingerprint", Seq("documents"),
      """SELECT md5(CAST(regexp_replace(trim(lower(text)), '\\s+', ' ') AS binary)) AS fingerprint,
        |       min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),

    // The reference's P1+K1/W1/A1 flagship, SQL end to end: synthesize the
    // JSON wire off events, from_json-parse it (the union delay flag, the
    // required-field reject filter), window 2 minutes, aggregate per airline.
    ("sql_flight_airline_stats", "flight_airline_stats", Seq("events"),
      """WITH wire AS (
        |  SELECT to_json(named_struct(
        |    'flightId', concat('F', CAST(event_id AS string)),
        |    'flightNumber', concat(upper(event_type), '-', CAST(event_id % 1000 AS string)),
        |    'airline', event_type,
        |    'origin', concat('O', CAST(user_id % 10 AS string)),
        |    'destination', concat('D', CAST(event_id % 7 AS string)),
        |    'scheduledArrival', date_format(date_trunc('second', ts), "yyyy-MM-dd'T'HH:mm:ss"),
        |    'actualArrival', date_format(timestamp_seconds(
        |        unix_timestamp(date_trunc('second', ts)) + (CAST(floor(value) AS bigint) - 50) * 60),
        |      "yyyy-MM-dd'T'HH:mm:ss"),
        |    'delayed', CASE WHEN event_id % 2 = 0 THEN value > 75 END,
        |    'status', CASE WHEN event_id % 2 != 0
        |                   THEN CASE WHEN value > 75 THEN 'Delayed' ELSE 'ON_TIME' END END,
        |    'userId', concat('u', CAST(user_id AS string)))) AS value
        |  FROM events),
        |parsed AS (
        |  SELECT from_json(value,
        |    'flightId STRING, flightNumber STRING, airline STRING, origin STRING,
        |     destination STRING, scheduledArrival STRING, actualArrival STRING,
        |     delayed BOOLEAN, status STRING, userId STRING') AS j
        |  FROM wire),
        |flights AS (
        |  SELECT j.airline AS airline,
        |         to_timestamp(j.scheduledArrival) AS scheduled_time,
        |         CASE WHEN j.delayed IS NOT NULL THEN CASE WHEN j.delayed THEN 1 ELSE 0 END
        |              ELSE CASE WHEN upper(j.status) = 'DELAYED' THEN 1 ELSE 0 END END AS is_delayed,
        |         CAST((unix_timestamp(to_timestamp(j.actualArrival))
        |               - unix_timestamp(to_timestamp(j.scheduledArrival))) / 60 AS bigint) AS delay_minutes
        |  FROM parsed
        |  WHERE j.flightId IS NOT NULL AND j.flightNumber IS NOT NULL
        |    AND j.airline IS NOT NULL AND j.origin IS NOT NULL
        |    AND j.destination IS NOT NULL AND j.userId IS NOT NULL
        |    AND to_timestamp(j.scheduledArrival) IS NOT NULL
        |    AND to_timestamp(j.actualArrival) IS NOT NULL)
        |SELECT CAST(w.start AS timestamp_ntz) AS window_start,
        |       CAST(w.end AS timestamp_ntz) AS window_end,
        |       airline, total_flights, delayed_flights, avg_delay_minutes,
        |       CAST(delayed_flights AS double) / total_flights * 100.0D AS delay_rate
        |FROM (
        |  SELECT window(scheduled_time, '2 minutes') AS w, airline,
        |         count(*) AS total_flights,
        |         CAST(sum(is_delayed) AS bigint) AS delayed_flights,
        |         avg(delay_minutes) AS avg_delay_minutes
        |  FROM flights GROUP BY 1, 2)""".stripMargin),

    ("sql_events_window_stats", "events_window_stats", Seq("events"),
      """SELECT CAST(w.start AS timestamp_ntz) AS window_start,
        |       CAST(w.end AS timestamp_ntz) AS window_end,
        |       event_type, total_events, high_value_events, sum_value,
        |       sum_value / total_events AS avg_value
        |FROM (
        |  SELECT window(ts, '1 hour') AS w, event_type,
        |         count(*) AS total_events,
        |         CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS bigint) AS high_value_events,
        |         CAST(sum(CAST(value AS decimal(18,2))) AS double) AS sum_value
        |  FROM events GROUP BY 1, 2)""".stripMargin),

    ("sql_events_user_stats", "events_user_stats", Seq("events"),
      """SELECT user_id, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_event_types,
        |       count(DISTINCT to_date(ts)) AS n_active_days,
        |       CAST(sum(CAST(value AS decimal(18,2))) AS double) AS total_value,
        |       CAST(min(ts) AS timestamp_ntz) AS first_ts,
        |       CAST(max(ts) AS timestamp_ntz) AS last_ts
        |FROM events GROUP BY user_id""".stripMargin),

    ("sql_text_stats", "text_stats", Seq("documents"),
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ') AS norm
        |  FROM documents),
        |tok AS (SELECT doc_id, norm, split(norm, ' ') AS toks FROM t),
        |b AS (
        |  SELECT doc_id,
        |         length(norm) AS n_chars,
        |         size(toks) AS n_tokens,
        |         size(array_distinct(toks)) AS n_distinct_tokens,
        |         size(filter(toks, x -> x IN ('the','a','of','and','is'))) AS n_stopwords,
        |         regexp_count(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS n_subtokens
        |  FROM tok)
        |SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_stopwords, n_subtokens,
        |       CAST(n_chars - (n_tokens - 1) AS double) / n_tokens AS avg_token_len,
        |       CAST(n_stopwords AS double) / n_tokens AS stopword_ratio,
        |       CAST(n_distinct_tokens AS double) / n_tokens AS type_token_ratio,
        |       CAST(n_distinct_tokens AS double) / n_tokens * 0.6D
        |         + least(CAST(n_tokens AS double) / 100.0D, 1.0D) * 0.3D
        |         + (1.0D - CAST(n_stopwords AS double) / n_tokens) * 0.1D AS quality_score
        |FROM b""".stripMargin),

    // brute-force ANN through the native codegen'd array_dot expression —
    // SQL-reachable only via the registered function
    ("sql_sim_topk", "sim_topk", Seq("embeddings"),
      """WITH v AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS double)) AS ve
        |  FROM embeddings),
        |w AS (SELECT vec_id, ve, sqrt(array_dot(ve, ve)) AS nn FROM v),
        |q AS (SELECT * FROM w WHERE vec_id < 10),
        |s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         array_dot(q.ve, c.ve) / (q.nn * c.nn) AS cosine
        |  FROM q JOIN w c ON q.vec_id != c.vec_id)
        |SELECT query_id, CAST(rnk AS int) AS rank, neighbor_id
        |FROM (SELECT query_id, neighbor_id,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY cosine DESC, neighbor_id) AS rnk
        |      FROM s)
        |WHERE rnk <= 5""".stripMargin),

    ("sql_corpus_token_budget", "corpus_token_budget", Seq("documents"),
      """SELECT doc_id, source, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, source, n_tokens,
        |         sum(coalesce(n_tokens, CAST(0 AS bigint))) OVER (
        |           PARTITION BY source
        |           ORDER BY CAST(conv(substr(md5(CAST(CAST(doc_id AS string) AS binary)), 1, 15), 16, 10) AS bigint),
        |                    doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM (SELECT doc_id, source,
        |               CAST(size(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' ')) AS bigint) AS n_tokens
        |        FROM documents))
        |WHERE cum_tokens <= 1500""".stripMargin),

    ("sql_tpch_q6_revenue", "tpch_q6_revenue", Seq("lineitem"),
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS decimal(18,4))) AS double) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05D AND l_discount <= 0.07D AND l_quantity < 24""".stripMargin),

    // the full MinHash → LSH-band → candidate chain as ONE SQL text — the
    // hash constants interpolate from the same Dedup.minhashPerms source of
    // truth the DataFrame operator and the DuckDB oracle share
    ("sql_dedup_lsh_candidates", "dedup_lsh_candidates", Seq("documents"),
      lshCandidatesSql),

    // the kmin_values native aggregate from SQL: per-language KMV sketch
    ("sql_sketch_kmv_tokens", "sketch_kmv_tokens", Seq("documents"),
      """WITH tok AS (
        |  SELECT lang,
        |         explode(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' ')) AS tok
        |  FROM documents),
        |k AS (
        |  SELECT lang,
        |         kmin_values(CAST(conv(substr(md5(CAST(tok AS binary)), 1, 15), 16, 10) AS bigint), 64) AS kmins
        |  FROM tok GROUP BY lang)
        |SELECT lang,
        |       size(kmins) AS n_kept,
        |       CASE WHEN size(kmins) > 0 THEN element_at(kmins, size(kmins)) END AS kth_min,
        |       CASE WHEN size(kmins) < 64 THEN CAST(size(kmins) AS double)
        |            ELSE 63.0D * 1152921504606846976.0D / CAST(element_at(kmins, 64) AS double) END AS est_distinct
        |FROM k""".stripMargin),

    // Portable-HLL register build (the `sketch_hll_registers` twin), SQL end
    // to end: daily-active user-day values → 60-bit portable hash → bucket
    // (low 6 bits via %) and rank (55 − base-2 digit count of the high 54
    // bits via shiftright + conv) — the exact integer discipline of
    // Sketches.hllRegisters spelled in SQL functions.
    ("sql_sketch_hll_registers", "sketch_hll_registers", Seq("events"),
      """WITH hv AS (
        |  SELECT event_type AS grp,
        |         CAST(conv(substr(md5(CAST(concat_ws(':', user_id, to_date(ts)) AS binary)), 1, 15), 16, 10) AS bigint) AS h
        |  FROM events),
        |b AS (
        |  SELECT grp, h % 64 AS bucket, shiftright(h, 6) AS w
        |  FROM hv WHERE h IS NOT NULL)
        |SELECT grp AS event_type, bucket,
        |       max(CASE WHEN w = 0 THEN CAST(55 AS bigint)
        |                ELSE 55 - length(conv(CAST(w AS string), 10, 2)) END) AS register
        |FROM b GROUP BY 1, 2""".stripMargin),

    // ---- r12 additions: the analytic-SQL families BI users hit first ------

    // OVER-window ranking (top-3 orders per customer)
    ("sql_window_rank_orders", "window_rank_orders", Seq("orders"),
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3""".stripMargin),

    // full grouping-set lattice via GROUP BY CUBE + grouping() sentinels
    ("sql_events_cube", "events_cube", Seq("events"),
      """SELECT CASE WHEN grouping(event_type) = 1 THEN '(all)' ELSE event_type END AS event_type,
        |       CAST(CASE WHEN grouping(user_bucket) = 1 THEN -1 ELSE user_bucket END AS bigint) AS user_bucket,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS decimal(18,2))) AS double) AS sum_value
        |FROM (SELECT event_type, user_id % 5 AS user_bucket, value FROM events)
        |GROUP BY CUBE (event_type, user_bucket)""".stripMargin),

    // As-of join in SQL text — the scalable union-and-sweep shape of
    // AsofJoin.asofLast (ONE shuffle, running last(…, true) over the
    // time-sorted union), NOT the nested-loop theta-join a naive SQL
    // as-of would plan. Purchases sort before errors at equal ts
    // (side 0 < 1) — the inclusive `>=` tie rule.
    ("sql_asof_purchase_before_error", "asof_purchase_before_error", Seq("events"),
      """WITH u AS (
        |  SELECT user_id, ts AS t, 0 AS side,
        |         event_id AS pid, value AS pval,
        |         CAST(NULL AS bigint) AS error_id, CAST(NULL AS timestamp) AS error_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, 1,
        |         CAST(NULL AS bigint), CAST(NULL AS double),
        |         event_id, ts
        |  FROM events WHERE event_type = 'error'),
        |f AS (
        |  SELECT user_id, side, error_id, error_ts,
        |         last(pid, true) OVER (PARTITION BY user_id ORDER BY t, side
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purchase_id,
        |         last(pval, true) OVER (PARTITION BY user_id ORDER BY t, side
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purchase_value
        |  FROM u)
        |SELECT error_id AS event_id, user_id, CAST(error_ts AS timestamp_ntz) AS ts,
        |       asof_purchase_id, asof_purchase_value
        |FROM f WHERE side = 1""".stripMargin),

    // Interval join in SQL text — the bucketed equi-join shape of
    // IntervalJoin.intervalJoin (intervals register in every overlapped
    // tile via explode(sequence), points land in ONE tile, exact predicate
    // filters the slack), not the nested-loop theta-join.
    ("sql_events_interval_join", "events_interval_join", Seq("events"),
      """WITH e AS (
        |  SELECT event_id AS error_id, user_id, ts AS start_ts,
        |         ts + INTERVAL 6 HOURS AS end_ts
        |  FROM events WHERE event_type = 'error'),
        |i AS (
        |  SELECT error_id, user_id, start_ts, end_ts,
        |         explode(sequence(CAST(start_ts AS long) div 21600L,
        |                          CAST(end_ts AS long) div 21600L)) AS bucket
        |  FROM e),
        |p AS (
        |  SELECT user_id, ts AS p_ts, value,
        |         CAST(ts AS long) div 21600L AS bucket
        |  FROM events WHERE event_type = 'purchase')
        |SELECT i.error_id, count(*) AS n_purchases,
        |       CAST(sum(CAST(p.value AS decimal(18,2))) AS double) AS sum_value
        |FROM p JOIN i ON p.user_id = i.user_id AND p.bucket = i.bucket
        |WHERE p.p_ts >= i.start_ts AND p.p_ts < i.end_ts
        |GROUP BY i.error_id""".stripMargin),

    // Closed-form ridge predictions, SQL end to end: marker-count features,
    // one Gram/moment aggregate (bigint, coalesced for empty input), the
    // 3×3 Cramer cofactor expansion in exact decimal(38,0) — the same
    // expressions as the learn_ridge_by_source Catalyst solve — folded in
    // via scalar subqueries (no cross join in the plan), predictions as
    // det-scaled integer numerators rendered as strings.
    //
    // SCALE BOUND (r12 advice item): the decimal(38,0) solve is exact only
    // while the Cramer terms (triple products of Gram sums) fit 38 digits —
    // safe to roughly 1e12-scale Gram sums, i.e. ~1e10 docs at these
    // O(10)-count features. Beyond that the in-plan products overflow
    // precision 38 (throw under ANSI, null otherwise), while the
    // `learn_ridge_preds` DataFrame twin keeps going: its solve runs in
    // unbounded BigInt on the driver and folds w1..w3/det in as literals.
    // At 100 TB prefer the DataFrame row; this SQL twin exists to pin the
    // frontend-equivalence at oracle scales.
    ("sql_learn_ridge_preds", "learn_ridge_preds", Seq("documents"),
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(size(filter(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '), t -> t = 'scan')) AS bigint) AS x1,
        |         CAST(size(filter(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '), t -> t = 'join')) AS bigint) AS x2,
        |         CAST(1 AS bigint) AS x3,
        |         CAST(size(filter(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '), t -> t = 'filter'))
        |            + size(filter(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '), t -> t = 'sort'))
        |            + size(filter(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' '), t -> t = 'merge')) AS bigint) AS yt
        |  FROM documents),
        |a AS (
        |  SELECT CAST(coalesce(sum(x1*x1), 0) + 1 AS decimal(38,0)) AS a11,
        |         CAST(coalesce(sum(x1*x2), 0) AS decimal(38,0)) AS a12,
        |         CAST(coalesce(sum(x1*x3), 0) AS decimal(38,0)) AS a13,
        |         CAST(coalesce(sum(x2*x2), 0) + 1 AS decimal(38,0)) AS a22,
        |         CAST(coalesce(sum(x2*x3), 0) AS decimal(38,0)) AS a23,
        |         CAST(coalesce(sum(x3*x3), 0) + 1 AS decimal(38,0)) AS a33,
        |         CAST(coalesce(sum(x1*yt), 0) AS decimal(38,0)) AS b1,
        |         CAST(coalesce(sum(x2*yt), 0) AS decimal(38,0)) AS b2,
        |         CAST(coalesce(sum(x3*yt), 0) AS decimal(38,0)) AS b3
        |  FROM f),
        |slv AS (
        |  SELECT a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |           + a13*(a12*a23 - a22*a13) AS det,
        |         b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
        |           + a13*(b2*a23 - a22*b3) AS w1,
        |         a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
        |           + a13*(a12*b3 - b2*a13) AS w2,
        |         a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
        |           + b1*(a12*a23 - a22*a13) AS w3
        |  FROM a)
        |SELECT doc_id, yt AS y_t,
        |       CAST(x1*(SELECT w1 FROM slv) + x2*(SELECT w2 FROM slv)
        |              + x3*(SELECT w3 FROM slv) AS string) AS pred_num,
        |       CAST(x1*(SELECT w1 FROM slv) + x2*(SELECT w2 FROM slv)
        |              + x3*(SELECT w3 FROM slv) - yt*(SELECT det FROM slv) AS string) AS res_num
        |FROM f""".stripMargin),

    // Portable-HLL ESTIMATE read with the small-range correction, SQL end
    // to end (the `sketch_hll_small_range` twin): register build → integer
    // harmonic numerator → one IEEE division by the shared plan-time
    // constant → linear-counting branch via the shared literal table
    // (element_at by empty-bucket count — no runtime ln in the plan).
    ("sql_sketch_hll_small_range", "sketch_hll_small_range", Seq("customer"),
      hllSmallRangeSql),

    // Multimodal decode → ANN, SQL end to end (the
    // `multimodal_audio_near_dup` twin): the GAUD payload is BUILT in SQL
    // (concat/unhex/lpad/hex over doc_id arithmetic), header-validated and
    // cut into 8-byte windows whose byte sums come from nested lambda HOFs
    // over hex(substring(...)) — proof the binary-decode family is fully
    // drivable from SQL text, including the bucket equi-join and the
    // zip_with/aggregate exact-L1 verify.
    ("sql_multimodal_audio_near_dup", "multimodal_audio_near_dup",
      Seq("documents"),
      """WITH src AS (
        |  SELECT doc_id,
        |         concat(CAST(CASE WHEN doc_id % 5 = 0 THEN 'XAUD' ELSE 'GAUD' END AS binary),
        |                unhex(lpad(hex(CAST(doc_id % 48000 + 8000 AS int)), 8, '0')),
        |                unhex(lpad(hex(CAST(doc_id % 4 AS int)), 4, '0')),
        |                substring(CAST(text AS binary), 1, 24)) AS payload
        |  FROM documents),
        |dec AS (
        |  SELECT doc_id,
        |         substring(payload, 11, length(payload)) AS smp,
        |         CAST(conv(hex(substring(payload, 9, 2)), 16, 10) AS bigint) AS channels,
        |         substring(payload, 1, 4) = CAST('GAUD' AS binary)
        |           AND length(payload) >= 10 AS hdr_ok
        |  FROM src),
        |fv AS (
        |  SELECT doc_id,
        |         transform(sequence(0, CAST(ceil(CAST(length(smp) AS double) / 8.0D) AS int) - 1),
        |           i -> aggregate(
        |                  transform(sequence(1, length(substring(smp, i * 8 + 1, 8))),
        |                    j -> CAST(conv(hex(substring(substring(smp, i * 8 + 1, 8), j, 1)), 16, 10) AS bigint)),
        |                  CAST(0 AS bigint), (acc, b) -> acc + b)) AS fvec
        |  FROM dec
        |  WHERE hdr_ok AND channels > 0 AND length(smp) > 0),
        |bk AS (
        |  SELECT doc_id, fvec,
        |         concat_ws(':', CAST(size(fvec) AS string),
        |           concat_ws(',', transform(fvec, s -> CAST(s div 64 AS string)))) AS bucket
        |  FROM fv)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       aggregate(zip_with(a.fvec, b.fvec, (x, y) -> abs(x - y)),
        |                 CAST(0 AS bigint), (acc, x) -> acc + x) AS l1,
        |       CAST(aggregate(zip_with(a.fvec, b.fvec, (x, y) -> abs(x - y)),
        |                      CAST(0 AS bigint), (acc, x) -> acc + x) <= 24 AS int) AS near_dup
        |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin),

    // SAX motif discovery from SQL text: framed window sums, integer
    // min-max symbols, the hot-word window filter, and the L1 shape verify
    // — gated on the events_sax_motifs oracle.
    ("sql_events_sax_motifs", "events_sax_motifs", Seq("events"), {
      val segs = (0 until 8).map(j =>
        s"sum(qv) OVER (PARTITION BY user_id ORDER BY rn ROWS BETWEEN ${2 * j} FOLLOWING AND ${2 * j + 1} FOLLOWING) AS s$j")
        .mkString(",\n        |         ").stripMargin
      val syms = (0 until 8).map(j =>
        s"CAST((s$j - lo) * 4 div (hi - lo + 1) AS string)").mkString(", ")
      val nsegs = (0 until 8).map(j =>
        s"(s$j - lo) * 1000 div (hi - lo + 1) AS ns$j").mkString(", ")
      val l1 = (0 until 8).map(j => s"abs(a.ns$j - b.ns$j)").mkString(" + ")
      s"""WITH s AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS bigint) AS qv,
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
        |       a.word AS word, CAST($l1 AS bigint) AS l1,
        |       CAST($l1 <= 800 AS int) AS is_motif
        |FROM kept a JOIN kept b ON a.word = b.word
        |WHERE (a.user_id < b.user_id)
        |   OR (a.user_id = b.user_id AND a.win_start + 16 <= b.win_start)""".stripMargin
    }),

    // CEP from SQL text: the running-window encoding of the
    // MATCH_RECOGNIZE pattern — last_value IGNORE NULLS step tracking, two
    // negation counters, exact-microsecond window bound — gated on the
    // events_cep_match oracle.
    ("sql_events_cep_match", "events_cep_match", Seq("events"),
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS n_upto
        |  FROM events),
        |l AS (
        |  SELECT *,
        |         last_value(CASE WHEN event_type = 'view' THEN ts END)
        |           IGNORE NULLS OVER w AS la_ts,
        |         last_value(CASE WHEN event_type = 'view' THEN n_upto END)
        |           IGNORE NULLS OVER w AS la_n,
        |         last_value(CASE WHEN event_type = 'click' THEN ts END)
        |           IGNORE NULLS OVER w AS lb_ts
        |  FROM o
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id,
        |       CAST(la_ts AS timestamp_ntz) AS view_ts,
        |       CAST(lb_ts AS timestamp_ntz) AS click_ts,
        |       CAST(ts AS timestamp_ntz) AS purchase_ts,
        |       (unix_micros(ts) - unix_micros(la_ts)) div 1000000 AS gap_seconds
        |FROM l
        |WHERE event_type = 'purchase'
        |  AND la_ts IS NOT NULL AND lb_ts IS NOT NULL
        |  AND la_ts < lb_ts AND lb_ts < ts
        |  AND unix_micros(ts) - unix_micros(la_ts) <= 172800000000
        |  AND n_upto = la_n""".stripMargin),

    // N-step CEP from SQL text: the 4-step funnel — one more last_value
    // tracker, same single window operator — gated on the
    // events_cep_match4 oracle.
    ("sql_events_cep_match4", "events_cep_match4", Seq("events"),
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS n_upto
        |  FROM events),
        |l AS (
        |  SELECT *,
        |         last_value(CASE WHEN event_type = 'signup' THEN ts END)
        |           IGNORE NULLS OVER w AS l0_ts,
        |         last_value(CASE WHEN event_type = 'signup' THEN n_upto END)
        |           IGNORE NULLS OVER w AS l0_n,
        |         last_value(CASE WHEN event_type = 'view' THEN ts END)
        |           IGNORE NULLS OVER w AS l1_ts,
        |         last_value(CASE WHEN event_type = 'click' THEN ts END)
        |           IGNORE NULLS OVER w AS l2_ts
        |  FROM o
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id,
        |       CAST(l0_ts AS timestamp_ntz) AS signup_ts,
        |       CAST(l1_ts AS timestamp_ntz) AS view_ts,
        |       CAST(l2_ts AS timestamp_ntz) AS click_ts,
        |       CAST(ts AS timestamp_ntz) AS purchase_ts,
        |       (unix_micros(ts) - unix_micros(l0_ts)) div 1000000 AS gap_seconds
        |FROM l
        |WHERE event_type = 'purchase'
        |  AND l0_ts IS NOT NULL AND l1_ts IS NOT NULL AND l2_ts IS NOT NULL
        |  AND l0_ts < l1_ts AND l1_ts < l2_ts AND l2_ts < ts
        |  AND unix_micros(ts) - unix_micros(l0_ts) <= 604800000000
        |  AND n_upto = l0_n""".stripMargin),

    // Seasonal anomalies from SQL text: the exact cross-multiplied
    // residual — gated on the events_ts_seasonal oracle.
    ("sql_events_ts_seasonal", "events_ts_seasonal", Seq("events"),
      """WITH s AS (
        |  SELECT user_id, event_id, CAST(hour(ts) AS int) AS hr,
        |         CAST(floor(value * 1000) AS bigint) AS qv
        |  FROM events),
        |seas AS (
        |  SELECT user_id, hr, CAST(sum(qv) AS bigint) AS s_num,
        |         CAST(count(*) AS bigint) AS s_cnt
        |  FROM s GROUP BY 1, 2)
        |SELECT s.user_id, s.event_id, s.hr, s.qv,
        |       CAST(s.qv * seas.s_cnt - seas.s_num AS bigint) AS resid_scaled,
        |       seas.s_cnt,
        |       CAST(abs(s.qv * seas.s_cnt - seas.s_num) > 200000 * seas.s_cnt
        |            AS int) AS is_anomaly
        |FROM s JOIN seas ON seas.user_id = s.user_id AND seas.hr = s.hr""".stripMargin),

    // Per-gap negation CEP from SQL text: one running counter per gap
    // predicate, adjacent-gap counter values via last_value IGNORE NULLS —
    // gated on the events_cep_gaps oracle.
    ("sql_events_cep_gaps", "events_cep_gaps", Seq("events"),
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
        |         last_value(CASE WHEN event_type = 'view' THEN ts END)
        |           IGNORE NULLS OVER w AS l0_ts,
        |         last_value(CASE WHEN event_type = 'view' THEN n0 END)
        |           IGNORE NULLS OVER w AS l0_n0,
        |         last_value(CASE WHEN event_type = 'click' THEN ts END)
        |           IGNORE NULLS OVER w AS l1_ts,
        |         last_value(CASE WHEN event_type = 'click' THEN n0 END)
        |           IGNORE NULLS OVER w AS l1_n0,
        |         last_value(CASE WHEN event_type = 'click' THEN n1 END)
        |           IGNORE NULLS OVER w AS l1_n1
        |  FROM o
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id,
        |       CAST(l0_ts AS timestamp_ntz) AS view_ts,
        |       CAST(l1_ts AS timestamp_ntz) AS click_ts,
        |       CAST(ts AS timestamp_ntz) AS purchase_ts,
        |       (unix_micros(ts) - unix_micros(l0_ts)) div 1000000 AS gap_seconds
        |FROM l
        |WHERE event_type = 'purchase'
        |  AND l0_ts IS NOT NULL AND l1_ts IS NOT NULL
        |  AND l0_ts < l1_ts AND l1_ts < ts
        |  AND unix_micros(ts) - unix_micros(l0_ts) <= 172800000000
        |  AND l1_n0 = l0_n0
        |  AND n1 = l1_n1""".stripMargin),

    // Kleene-quantified CEP from SQL text: occurrence bounds as predicates
    // on the gap counters ("at least 3 clicks, zero errors") instead of
    // zero-equality — gated on the events_cep_kleene oracle.
    ("sql_events_cep_kleene", "events_cep_kleene", Seq("events"),
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
        |         last_value(CASE WHEN event_type = 'view' THEN ts END)
        |           IGNORE NULLS OVER w AS l0_ts,
        |         last_value(CASE WHEN event_type = 'view' THEN n0 END)
        |           IGNORE NULLS OVER w AS l0_n0,
        |         last_value(CASE WHEN event_type = 'view' THEN n1 END)
        |           IGNORE NULLS OVER w AS l0_n1
        |  FROM o
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id,
        |       CAST(l0_ts AS timestamp_ntz) AS view_ts,
        |       CAST(ts AS timestamp_ntz) AS purchase_ts,
        |       (unix_micros(ts) - unix_micros(l0_ts)) div 1000000 AS gap_seconds,
        |       n0 - l0_n0 AS n_clicks
        |FROM l
        |WHERE event_type = 'purchase'
        |  AND l0_ts IS NOT NULL AND l0_ts < ts
        |  AND unix_micros(ts) - unix_micros(l0_ts) <= 604800000000
        |  AND n0 - l0_n0 >= 3 AND n1 - l0_n1 = 0""".stripMargin),

    // CUSUM changepoints from SQL text: the max(0, S+d) recursion as its
    // P − min(prefix) window closed form, cross-multiplied integer
    // deviations — gated on the events_ts_changepoints oracle.
    ("sql_events_ts_changepoints", "events_ts_changepoints", Seq("events"),
      """WITH s AS (
        |  SELECT user_id AS k, event_id AS id, ts,
        |         CAST(floor(value * 1000) AS bigint) AS qv
        |  FROM events),
        |prof AS (
        |  SELECT k, CAST(sum(qv) AS bigint) AS s_num, count(*) AS s_cnt
        |  FROM s GROUP BY 1),
        |j AS (
        |  SELECT s.*, p.s_num, p.s_cnt,
        |         (qv * s_cnt - s_num) - 20000L * s_cnt AS d_up,
        |         (s_num - qv * s_cnt) - 20000L * s_cnt AS d_dn
        |  FROM s JOIN prof p ON p.k = s.k),
        |w AS (
        |  SELECT *, sum(d_up) OVER win AS p_up, sum(d_dn) OVER win AS p_dn
        |  FROM j
        |  WINDOW win AS (PARTITION BY k ORDER BY ts, id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT *,
        |         p_up - least(0L, min(p_up) OVER win) AS cusum_up,
        |         p_dn - least(0L, min(p_dn) OVER win) AS cusum_dn
        |  FROM w
        |  WINDOW win AS (PARTITION BY k ORDER BY ts, id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT k AS user_id, id AS event_id, qv, cusum_up, cusum_dn,
        |       CAST(cusum_up > 200000L * s_cnt AS int) AS is_shift_up,
        |       CAST(cusum_dn > 200000L * s_cnt AS int) AS is_shift_dn
        |FROM c""".stripMargin),

    // Seasonal-profile epoch merge from SQL text: two grouped halves
    // unioned and re-summed — the merge-by-addition artifact property
    // drivable from a SQL cell, gated on the events_ts_profile_merged
    // oracle.
    ("sql_events_ts_profile_merged", "events_ts_profile_merged", Seq("events"),
      """WITH halves AS (
        |  SELECT user_id, CAST(hour(ts) AS int) AS hr, event_id % 2 AS epoch,
        |         CAST(floor(value * 1000) AS bigint) AS qv
        |  FROM events),
        |prof AS (
        |  SELECT epoch, user_id, hr,
        |         CAST(sum(qv) AS bigint) AS s_num, count(*) AS s_cnt
        |  FROM halves GROUP BY 1, 2, 3)
        |SELECT user_id, hr, CAST(sum(s_num) AS bigint) AS s_num,
        |       CAST(sum(s_cnt) AS bigint) AS s_cnt
        |FROM prof GROUP BY 1, 2""".stripMargin),

    // Retrieval-ranking eval from SQL text: the BM25 pipeline per query,
    // term-coverage relevance, and NDCG@5/MRR over the same plan-literal
    // 1/log2 weight table — gated on the eval_ndcg_retrieval oracle.
    ("sql_eval_ndcg_retrieval", "eval_ndcg_retrieval", Seq("documents"),
      retrievalNdcgSparkSql),

    // Rolling-origin OLS forecast from SQL text: the trailing-window
    // normal equations with their literal position sums (SI=36, SII=204,
    // D=336), the position-weighted sum re-based from sum(rn·qv) — gated
    // on the events_ts_forecast oracle.
    ("sql_events_ts_forecast", "events_ts_forecast", Seq("events"),
      """WITH s AS (
        |  SELECT user_id AS k, event_id AS id, ts,
        |         CAST(floor(value * 1000) AS bigint) AS qv,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |w AS (
        |  SELECT *,
        |         sum(qv) OVER win AS sy,
        |         sum(rn * qv) OVER win AS s2,
        |         count(*) OVER win AS c
        |  FROM s
        |  WINDOW win AS (PARTITION BY k ORDER BY rn
        |                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
        |f AS (
        |  SELECT *,
        |         CASE WHEN c = 8 THEN
        |           (204L * sy - 36L * (s2 - (rn - 9) * sy))
        |           + (8L * (s2 - (rn - 9) * sy) - 36L * sy) * 9L END AS fc_num
        |  FROM w)
        |SELECT k AS user_id, id AS event_id, qv, fc_num,
        |       CASE WHEN fc_num IS NOT NULL
        |            THEN qv * 336L - fc_num END AS err_scaled
        |FROM f""".stripMargin),

    // The MASE backtest from SQL text (verdict-r16 item 9): the same
    // forecast CTE chain extended with the naive one-step error and
    // rolled up per key — Σ|forecast error| vs Σ|naive error| in exact
    // longs, MASE as one final double division. Gated on the
    // events_ts_forecast_eval oracle.
    ("sql_events_ts_forecast_eval", "events_ts_forecast_eval", Seq("events"),
      """WITH s AS (
        |  SELECT user_id AS k, event_id AS id, ts,
        |         CAST(floor(value * 1000) AS bigint) AS qv,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |w AS (
        |  SELECT *,
        |         sum(qv) OVER win AS sy,
        |         sum(rn * qv) OVER win AS s2,
        |         count(*) OVER win AS c,
        |         qv - lag(qv) OVER (PARTITION BY k ORDER BY rn) AS nd
        |  FROM s
        |  WINDOW win AS (PARTITION BY k ORDER BY rn
        |                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
        |f AS (
        |  SELECT *,
        |         CASE WHEN c = 8 THEN
        |           (204L * sy - 36L * (s2 - (rn - 9) * sy))
        |           + (8L * (s2 - (rn - 9) * sy) - 36L * sy) * 9L END AS fc_num
        |  FROM w)
        |SELECT k AS user_id, count(*) AS n_eval,
        |       sum(abs(qv * 336L - fc_num)) AS sae_fc_scaled,
        |       sum(abs(nd)) AS sae_naive,
        |       CASE WHEN sum(abs(nd)) > 0
        |            THEN CAST(sum(abs(qv * 336L - fc_num)) AS double)
        |                 / (sum(abs(nd)) * 336L) END AS mase
        |FROM f WHERE fc_num IS NOT NULL GROUP BY k""".stripMargin),

    // All-matches CEP from SQL text: the bounded anchor enumeration as an
    // explicit anchors×closes join + recency rank (the oracle's own shape
    // — a SQL cell has no bounded-collect idiom, so the join IS the
    // frontend form; the DataFrame operator keeps the one-shuffle
    // collect). Gated on the events_cep_all_matches oracle.
    ("sql_events_cep_all_matches", "events_cep_all_matches", Seq("events"),
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |           OVER w_run AS n_upto
        |  FROM events
        |  WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |l AS (
        |  SELECT *,
        |         last_value(CASE WHEN event_type = 'click' THEN ts END)
        |           IGNORE NULLS OVER w AS l1_ts
        |  FROM o
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cl AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS c_ts,
        |         n_upto AS c_n, l1_ts
        |  FROM l
        |  WHERE event_type = 'purchase' AND l1_ts IS NOT NULL AND l1_ts < ts),
        |an AS (
        |  SELECT user_id, event_id AS a_id, ts AS a_ts, n_upto AS a_n
        |  FROM o WHERE event_type = 'view'),
        |cand AS (
        |  SELECT cl.user_id, cl.purchase_id, cl.c_ts, cl.c_n, cl.l1_ts,
        |         an.a_ts, an.a_id, an.a_n,
        |         row_number() OVER (PARTITION BY cl.user_id, cl.purchase_id
        |                            ORDER BY an.a_ts DESC, an.a_id DESC) AS rk
        |  FROM cl JOIN an ON an.user_id = cl.user_id
        |   AND an.a_ts <= cl.c_ts
        |   AND unix_micros(cl.c_ts) - unix_micros(an.a_ts) <= 604800000000L)
        |SELECT user_id, purchase_id,
        |       CAST(a_ts AS timestamp_ntz) AS view_ts,
        |       CAST(l1_ts AS timestamp_ntz) AS click_ts,
        |       CAST(c_ts AS timestamp_ntz) AS purchase_ts,
        |       (unix_micros(c_ts) - unix_micros(a_ts)) div 1000000 AS gap_seconds,
        |       CAST(rk AS int) AS span_rank
        |FROM cand
        |WHERE rk <= 8 AND a_ts < l1_ts AND c_n = a_n""".stripMargin),

    // Record linkage from SQL text: the dirty-table synthesis, segment-pair
    // blocking keys, hot-key drop (window count), candidate equi-join and
    // levenshtein verify — the whole entity-resolution chain drivable from
    // a SQL cell, gated on the DataFrame twin's oracle.
    ("sql_dedup_entity_match", "dedup_entity_match", Seq("customer"),
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         concat(CAST(c_nationkey AS string), ':', c_mktsegment) AS blk,
        |         c_custkey AS k
        |  FROM customer),
        |d1 AS (
        |  SELECT id + 1000000000 AS id,
        |         concat(substr(name, 1, CAST(10 + k % 9 AS int) - 1), 'x',
        |                substr(name, CAST(10 + k % 9 AS int) + 1)) AS name,
        |         blk FROM base WHERE k % 3 = 0),
        |d2 AS (
        |  SELECT id + 2000000000 AS id,
        |         concat(substr(name, 1, 9), 'xy', substr(name, 12)) AS name,
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
        |  SELECT id, name, concat(blk, '|01|', t0, '|', t1) AS key FROM pieces
        |  UNION ALL SELECT id, name, concat(blk, '|02|', t0, '|', t2) FROM pieces
        |  UNION ALL SELECT id, name, concat(blk, '|12|', t1, '|', t2) FROM pieces),
        |kept AS (
        |  SELECT id, name, key FROM (
        |    SELECT id, name, key, count(*) OVER (PARTITION BY key) AS ksize
        |    FROM keys)
        |  WHERE ksize <= 64),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, a.name AS name_a,
        |         b.id AS id_b, b.name AS name_b
        |  FROM kept a JOIN kept b ON a.key = b.key AND a.id < b.id)
        |SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS int) AS lev,
        |       CAST(levenshtein(name_a, name_b) <= 2 AS int) AS is_match
        |FROM cand""".stripMargin),

    // CDC record-linkage admission from SQL text (the dedup_entity_admit
    // twin): master-side blocking index with hot-key drop, arrival keys,
    // candidate equi-join, levenshtein verify — gated on the same oracle.
    // (The entity RESOLVE twin is blocked on the engine: Spark 4.1
    // recursive CTEs are UNION ALL-only — UNION_NOT_SUPPORTED_IN_
    // RECURSIVE_CTE — and min-label component propagation diverges without
    // the recursion-level dedup. The family stays SQL-reachable through
    // this row and sql_dedup_entity_match.)
    ("sql_dedup_entity_admit", "dedup_entity_admit", Seq("customer"),
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         concat(CAST(c_nationkey AS string), ':', c_mktsegment) AS blk,
        |         c_custkey AS k
        |  FROM customer),
        |d1 AS (
        |  SELECT id + 1000000000 AS id,
        |         concat(substr(name, 1, CAST(10 + k % 9 AS int) - 1), 'x',
        |                substr(name, CAST(10 + k % 9 AS int) + 1)) AS name,
        |         blk FROM base WHERE k % 3 = 0),
        |d2 AS (
        |  SELECT id + 2000000000 AS id,
        |         concat(substr(name, 1, 9), 'xy', substr(name, 12)) AS name,
        |         blk FROM base WHERE k % 9 = 0),
        |arrivals AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2),
        |bp AS (
        |  SELECT id, name, blk, substr(name, 10, 3) AS t0,
        |         substr(name, 13, 3) AS t1, substr(name, 16, 3) AS t2
        |  FROM base),
        |bkeys AS (
        |  SELECT id, name, concat(blk, '|01|', t0, '|', t1) AS key FROM bp
        |  UNION ALL SELECT id, name, concat(blk, '|02|', t0, '|', t2) FROM bp
        |  UNION ALL SELECT id, name, concat(blk, '|12|', t1, '|', t2) FROM bp),
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
        |  SELECT id, name, concat(blk, '|01|', t0, '|', t1) AS key FROM ap
        |  UNION ALL SELECT id, name, concat(blk, '|02|', t0, '|', t2) FROM ap
        |  UNION ALL SELECT id, name, concat(blk, '|12|', t1, '|', t2) FROM ap),
        |cand AS (
        |  SELECT DISTINCT i.id AS base_id, i.name AS base_name,
        |         a.id AS new_id, a.name AS new_name
        |  FROM idx i JOIN akeys a ON i.key = a.key AND i.id <> a.id)
        |SELECT base_id, new_id,
        |       CAST(levenshtein(base_name, new_name) AS int) AS lev,
        |       CAST(levenshtein(base_name, new_name) <= 2 AS int) AS is_match
        |FROM cand""".stripMargin),

    // SAX discords from SQL text: the same frame CTEs as the motif twin at
    // the discord row's coarser resolution, the word-bounded
    // nearest-neighbor min, hot-word exemption — gated on the
    // events_sax_discords oracle.
    ("sql_events_sax_discords", "events_sax_discords", Seq("events"), {
      val segs = (0 until 8).map(j =>
        s"sum(qv) OVER (PARTITION BY user_id ORDER BY rn ROWS BETWEEN ${2 * j} FOLLOWING AND ${2 * j + 1} FOLLOWING) AS s$j")
        .mkString(",\n        |         ").stripMargin
      val syms = (0 until 8).map(j =>
        s"CAST((s$j - lo) * 3 div (hi - lo + 1) AS string)").mkString(", ")
      val nsegs = (0 until 8).map(j =>
        s"(s$j - lo) * 1000 div (hi - lo + 1) AS ns$j").mkString(", ")
      val l1 = (0 until 8).map(j => s"abs(a.ns$j - b.ns$j)").mkString(" + ")
      s"""WITH s AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS bigint) AS qv,
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
        |         CAST(min($l1) AS bigint) AS nn_l1,
        |         CAST(count(*) AS bigint) AS n_cands
        |  FROM kept a JOIN kept b ON a.word = b.word
        |  WHERE (a.user_id <> b.user_id OR abs(a.win_start - b.win_start) >= 16)
        |  GROUP BY 1, 2)
        |SELECT f.user_id, f.win_start, f.word,
        |       CAST(f.wsize > 256 AS int) AS is_hot_word,
        |       CAST(CASE WHEN f.wsize > 256 THEN NULL
        |                 ELSE coalesce(nn.n_cands, 0) END AS bigint) AS n_cands,
        |       nn.nn_l1,
        |       CAST(f.wsize <= 256 AND (nn.nn_l1 IS NULL OR nn.nn_l1 >= 1200)
        |            AS int) AS is_discord
        |FROM frames f
        |LEFT JOIN nn ON nn.k = f.user_id AND nn.win_start = f.win_start""".stripMargin
    }),

    // Integer-exact PageRank from SQL text — the graph family's first SQL
    // row: three unrolled power iterations in pure bigint arithmetic
    // (truncating div contributions, the overflow-safe ·17/20 damping
    // split), interpolating RankScale/base from graft.operators.Graph so
    // the three surfaces (DataFrame op, DuckDB oracle, this text) share
    // one set of constants.
    ("sql_graph_pagerank", "graph_pagerank", Seq("lineitem", "orders"),
      sqlPageRank),

    // The eval family from SQL text: hashed-bag classifier margins (the
    // portable-hash conv(substr(md5)) chain, weights inline), the quality
    // gate label, then the full threshold sweep — cumulative sums over the
    // DISTINCT-score frame, each ratio one IEEE division of exact longs.
    ("sql_eval_pr_curve", "eval_pr_curve", Seq("documents"),
      s"""WITH nt AS (
        |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\\\s+', ' ') AS norm
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, norm, split(norm, ' ') AS toks FROM nt),
        |cm AS (
        |  -- bind the per-token bucket ids ONCE via the single-element
        |  -- array+lambda trick (TextOps.hashVectorize's binding): inlining
        |  -- the md5 chain inside the per-bucket filter would re-hash every
        |  -- token 16x per document (the HOF re-evaluation lesson)
        |  SELECT doc_id,
        |         element_at(transform(array(
        |             transform(toks, tok ->
        |               pmod(CAST(conv(substr(md5(CAST(tok AS binary)), 1, 15), 16, 10) AS bigint), 16))), bs ->
        |           aggregate(
        |             zip_with(
        |               transform(sequence(0, 15), b -> size(filter(bs, x -> x = b))),
        |               array(5L, -3L, 7L, 2L, -8L, 4L, 1L, -2L, 6L, -5L, 3L, 9L, -1L, -4L, 8L, 2L),
        |               (c, w) -> CAST(c AS bigint) * w),
        |             CAST(-40 AS bigint), (acc, x) -> acc + x)), 1) AS margin
        |  FROM tk),
        |qm AS (
        |  SELECT doc_id,
        |         size(toks) AS n_tokens,
        |         CAST(length(norm) - (size(toks) - 1) AS double) / size(toks) AS avg_token_len,
        |         CAST(regexp_count(norm, '[^a-z0-9 ]') AS double) / size(toks) AS symbol_ratio,
        |         CAST(size(filter(toks, x -> x rlike '[0-9]')) AS double) / size(toks) AS digit_token_ratio,
        |         size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS n_stopwords
        |  FROM tk),
        |lbl AS (
        |  SELECT doc_id,
        |         CAST(n_tokens >= 20 AND n_tokens <= 80
        |              AND avg_token_len >= 3.0D AND avg_token_len <= 8.0D
        |              AND symbol_ratio <= 0.1D AND digit_token_ratio <= 0.2D
        |              AND n_stopwords >= 1 AS int) AS label
        |  FROM qm),
        |joined AS (SELECT cm.margin AS score, lbl.label FROM cm JOIN lbl USING (doc_id)),
        |bysc AS (SELECT score, count(*) AS c, sum(CAST(label AS bigint)) AS p
        |         FROM joined GROUP BY score),
        |cum AS (
        |  SELECT score,
        |         sum(p) OVER (ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |         sum(c) OVER (ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
        |         sum(p) OVER () AS n_pos
        |  FROM bysc)
        |SELECT score AS threshold, tp, pp - tp AS fp, n_pos - tp AS fn,
        |       CAST(tp AS double) / pp AS precision_at,
        |       CASE WHEN n_pos <> 0 THEN CAST(tp AS double) / n_pos END AS recall_at,
        |       CASE WHEN n_pos + pp <> 0
        |            THEN CAST(2 * tp AS double) / (n_pos + pp) END AS f1_at
        |FROM cum""".stripMargin),

    // Cross-modal asset dedup from SQL text: synthesize BOTH container
    // families (GVID with its uint32 offset index unrolled to literal
    // bytes, standalone GIMG), then decode them generically — the offset
    // reads, per-frame GIMG validation, whole-video reject on any bad
    // frame (count(valid)=count(*) per container), strict full-length
    // image check, and the (shape, md5(pixels)) digest equi-join — all
    // drivable from a SQL cell. The synthesis avoids aggregate-HOF concat
    // (the video_near_dup re-evaluation lesson: SQL text cannot
    // localCheckpoint, so the payload expression must be cheap to
    // re-evaluate) by unrolling the ≤3-frame schedule into plain concat.
    ("sql_multimodal_video_image_match", "multimodal_video_image_match",
      Seq("documents"),
      """WITH sd AS (
        |  SELECT doc_id,
        |         md5(CAST(concat(source, ':', CAST(n_chars AS string)) AS binary)) AS seed,
        |         CAST(doc_id % 3 + 1 AS int) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |vsrc AS (
        |  SELECT doc_id,
        |         concat(
        |           CAST(CASE WHEN doc_id % 13 = 0 THEN 'XVID' ELSE 'GVID' END AS binary),
        |           unhex(lpad(hex(n), 4, '0')),
        |           CASE n WHEN 1 THEN unhex('00000000')
        |                  WHEN 2 THEN unhex('000000000000000D')
        |                  ELSE unhex('000000000000000D0000001A') END,
        |           concat(CAST('GIMG' AS binary), unhex('0002'), unhex('0002'), unhex('01'),
        |                  CAST(substring(seed, 1, 4) AS binary)),
        |           CASE WHEN n >= 2
        |                THEN concat(CAST('GIMG' AS binary), unhex('0002'), unhex('0002'), unhex('01'),
        |                            CAST(substring(seed, 5, 4) AS binary))
        |                ELSE CAST('' AS binary) END,
        |           CASE WHEN n >= 3
        |                THEN concat(CAST('GIMG' AS binary), unhex('0002'), unhex('0002'), unhex('01'),
        |                            CAST(substring(seed, 9, 4) AS binary))
        |                ELSE CAST('' AS binary) END) AS payload
        |  FROM sd),
        |isrc AS (
        |  SELECT doc_id,
        |         concat(CAST(CASE WHEN doc_id % 7 = 0 THEN 'XIMG' ELSE 'GIMG' END AS binary),
        |                unhex('0002'), unhex('0002'), unhex('01'),
        |                CAST(substring(seed, CAST((doc_id % 3) * 4 + 1 AS int), 4) AS binary)) AS payload
        |  FROM sd),
        |vok AS (
        |  SELECT doc_id, payload,
        |         CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint) AS nf
        |  FROM vsrc
        |  WHERE substring(payload, 1, 4) = CAST('GVID' AS binary)
        |    AND length(payload) >= 6
        |    AND CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint) > 0
        |    AND CAST(length(payload) AS bigint) >= 6 + 4 * CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint)),
        |vframe AS (
        |  SELECT doc_id, i, nf, payload,
        |         7 + 4 * nf + CAST(conv(hex(substring(payload, CAST(7 + 4 * i AS int), 4)), 16, 10) AS bigint) AS fpos
        |  FROM vok LATERAL VIEW explode(sequence(0, CAST(nf AS int) - 1)) t AS i),
        |vhdr AS (
        |  SELECT doc_id, i, payload, fpos,
        |         CAST(conv(hex(substring(payload, CAST(fpos + 4 AS int), 2)), 16, 10) AS bigint) AS w,
        |         CAST(conv(hex(substring(payload, CAST(fpos + 6 AS int), 2)), 16, 10) AS bigint) AS h,
        |         CAST(conv(hex(substring(payload, CAST(fpos + 8 AS int), 1)), 16, 10) AS bigint) AS c
        |  FROM vframe),
        |vpix AS (
        |  SELECT doc_id, i AS frame_idx, w, h, c,
        |         CASE WHEN substring(payload, CAST(fpos AS int), 4) = CAST('GIMG' AS binary)
        |               AND w > 0 AND h > 0 AND c > 0
        |               AND CAST(length(payload) AS bigint) >= fpos + 8 + w * h * c
        |              THEN md5(substring(payload, CAST(fpos + 9 AS int), CAST(w * h * c AS int)))
        |         END AS content_key
        |  FROM vhdr),
        |vkeys AS (
        |  SELECT doc_id AS video_id, frame_idx, w, h, c AS channels, content_key
        |  FROM vpix
        |  WHERE doc_id IN (SELECT doc_id FROM vpix GROUP BY doc_id
        |                   HAVING count(content_key) = count(*))),
        |ikeys AS (
        |  SELECT doc_id AS image_id,
        |         CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint) AS w,
        |         CAST(conv(hex(substring(payload, 7, 2)), 16, 10) AS bigint) AS h,
        |         CAST(conv(hex(substring(payload, 9, 1)), 16, 10) AS bigint) AS channels,
        |         md5(substring(payload, 10,
        |           CAST(CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint)
        |                * CAST(conv(hex(substring(payload, 7, 2)), 16, 10) AS bigint)
        |                * CAST(conv(hex(substring(payload, 9, 1)), 16, 10) AS bigint) AS int))) AS content_key
        |  FROM isrc
        |  WHERE substring(payload, 1, 4) = CAST('GIMG' AS binary)
        |    AND length(payload) >= 9
        |    AND CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint) > 0
        |    AND CAST(conv(hex(substring(payload, 7, 2)), 16, 10) AS bigint) > 0
        |    AND CAST(conv(hex(substring(payload, 9, 1)), 16, 10) AS bigint) > 0
        |    AND CAST(length(payload) AS bigint) >=
        |          9 + CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS bigint)
        |              * CAST(conv(hex(substring(payload, 7, 2)), 16, 10) AS bigint)
        |              * CAST(conv(hex(substring(payload, 9, 1)), 16, 10) AS bigint))
        |SELECT v.video_id, v.frame_idx, i.image_id, v.w, v.h, v.channels
        |FROM vkeys v JOIN ikeys i
        |  ON v.w = i.w AND v.h = i.h AND v.channels = i.channels
        |     AND v.content_key = i.content_key""".stripMargin)
  )

  /** Spark-SQL text for the integer-exact 3-iteration PageRank, constants
    * interpolated from [[graft.operators.Graph]] (one source of truth with
    * the DataFrame operator and the DuckDB oracle). */
  private lazy val sqlPageRank: String = {
    import graft.operators.Graph
    val scale = Graph.RankScale
    val base = (scale * 3) / 20
    def iter(prev: String, k: Int): String =
      s"""c$k AS (SELECT src, rank div outdeg AS contrib
         |        FROM $prev JOIN outdeg ON node = src),
         |i$k AS (SELECT dst, sum(contrib) AS inb
         |        FROM edges JOIN c$k USING (src) GROUP BY dst),
         |r$k AS (SELECT node,
         |               ${base}L + (coalesce(inb, 0L) div 20) * 17
         |                 + ((coalesce(inb, 0L) % 20) * 17) div 20 AS rank
         |        FROM nodes LEFT JOIN i$k ON node = dst),
         |""".stripMargin
    s"""WITH lo AS (
       |  SELECT DISTINCT concat('c', CAST(o_custkey AS string)) AS c,
       |         concat('s', CAST(l_suppkey AS string)) AS sv
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT c AS src, sv AS dst FROM lo
       |          UNION
       |          SELECT sv AS src, c AS dst FROM lo),
       |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT node
       |          FROM (SELECT src AS node FROM edges
       |                UNION SELECT dst FROM edges)),
       |r0 AS (SELECT node, ${scale}L AS rank FROM nodes),
       |${iter("r0", 1)}${iter("r1", 2)}${iter("r2", 3).stripSuffix(",\n")}
       |SELECT node, rank,
       |       CAST(rank AS double) / ${scale}.0D AS rank_norm
       |FROM r3""".stripMargin
  }

  /** Spark-SQL text for the corrected HLL estimate over customer nations —
    * the α_64·64²·2⁵⁵ constant and the 64-entry linear-counting table
    * interpolate from the SAME driver-rendered literals the DataFrame
    * operator and the DuckDB oracle embed (Double.toString shortest
    * round-trip, `D`-suffixed for Spark's parser). */
  private lazy val hllSmallRangeSql: String = {
    import graft.operators.Sketches
    val c = Sketches.hllConstLiteral(6)
    val tbl = Sketches.hllLinearTable(6)
      .map(v => java.lang.Double.toString(v) + "D")
      .mkString("array(", ", ", ")")
    s"""WITH hv AS (
       |  SELECT c_mktsegment AS grp,
       |         CAST(conv(substr(md5(CAST(CAST(c_nationkey AS string) AS binary)), 1, 15), 16, 10) AS bigint) AS h
       |  FROM customer),
       |regs AS (
       |  SELECT grp, h % 64 AS bucket,
       |         max(CASE WHEN shiftright(h, 6) = 0 THEN CAST(55 AS bigint)
       |                  ELSE 55 - length(conv(CAST(shiftright(h, 6) AS string), 10, 2)) END) AS register
       |  FROM hv WHERE h IS NOT NULL GROUP BY 1, 2),
       |est AS (
       |  SELECT grp, 64 - count(*) AS n_zero,
       |         sum(shiftleft(CAST(1 AS bigint), CAST(55 - register AS int)))
       |           + (64 - count(*)) * shiftleft(CAST(1 AS bigint), 55) AS s_num
       |  FROM regs GROUP BY grp),
       |est2 AS (
       |  SELECT grp, n_zero, s_num,
       |         ${c}D / CAST(s_num AS double) AS est_raw
       |  FROM est),
       |x AS (
       |  SELECT c_mktsegment AS grp,
       |         count(DISTINCT c_nationkey) AS exact_nations
       |  FROM customer GROUP BY 1)
       |SELECT e.grp AS c_mktsegment, e.n_zero, e.s_num, e.est_raw,
       |       CASE WHEN e.n_zero > 0 AND e.est_raw <= 160.0D
       |            THEN element_at($tbl, CAST(e.n_zero AS int))
       |            ELSE e.est_raw END AS est,
       |       x.exact_nations
       |FROM est2 e JOIN x ON e.grp = x.grp""".stripMargin
  }

  /** Spark-SQL text for the retrieval-eval twin (`sql_eval_ndcg_retrieval`):
    * the [[Queries.retrievalNdcgPerQuery]] chain — per-query BM25 scoring
    * (same expression association order as the DataFrame operator and the
    * DuckDB oracle), term-coverage relevance, rank/irank windows, and the
    * SAME [[graft.operators.Eval.dcgWeights]] plan literals — so all three
    * frontends hash against one oracle. */
  private lazy val retrievalNdcgSparkSql: String = {
    val wArr = graft.operators.Eval.dcgWeights(5)
      .mkString("array(", "L, ", "L)")
    val perQueryCtes = Queries.retrievalQueries.map { case (qid, terms) =>
      val inList = terms.map(t => s"'$t'").mkString(", ")
      val mix = terms.map(t =>
        s"coalesce(max(CASE WHEN token = '$t' THEN term_score END), 0.0D)")
        .mkString("\n|         + ")
      s"""tf_$qid AS (
         |  SELECT doc_id, dl, token, CAST(count(*) AS bigint) AS tf
         |  FROM (SELECT doc_id, dl, token
         |        FROM dl LATERAL VIEW explode(toks) t AS token)
         |  WHERE token IN ($inList) GROUP BY 1, 2, 3),
         |df_$qid AS (
         |  SELECT token, CAST(count(*) AS bigint) AS df FROM tf_$qid GROUP BY 1),
         |sc_$qid AS (
         |  SELECT tf.doc_id, tf.token,
         |         ((CAST(s.n_docs - df.df AS double) + 0.5D)
         |            / (CAST(df.df AS double) + 0.5D))
         |           * (CAST(tf.tf AS double) * (1.2D + 1.0D))
         |           / (CAST(tf.tf AS double) + 1.2D * ((1.0D - 0.75D)
         |                + 0.75D * (CAST(tf.dl AS double)
         |                            / (CAST(s.sum_dl AS double)
         |                                 / CAST(s.n_docs AS double))))) AS term_score
         |  FROM tf_$qid tf CROSS JOIN stats s JOIN df_$qid df ON tf.token = df.token),
         |agg_$qid AS (
         |  SELECT doc_id,
         |         $mix AS score
         |  FROM sc_$qid GROUP BY 1),
         |top_$qid AS (
         |  SELECT '$qid' AS query, doc_id, score FROM agg_$qid
         |  ORDER BY score DESC, doc_id LIMIT 20)""".stripMargin
    }.mkString(",\n")
    val hitsUnion = Queries.retrievalQueries
      .map { case (qid, _) => s"SELECT * FROM top_$qid" }
      .mkString("\n|  UNION ALL ")
    val relCase = Queries.retrievalQueries.map { case (qid, terms) =>
      val cover = terms.map(t =>
        s"(CASE WHEN array_contains(d.toks, '$t') THEN 1L ELSE 0L END)")
        .mkString(" + ")
      s"WHEN h.query = '$qid' THEN $cover"
    }.mkString("\n|              ")
    s"""WITH lens AS (
       |  SELECT doc_id,
       |         split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' ') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(size(toks) AS bigint) AS dl, toks FROM lens),
       |stats AS (
       |  SELECT CAST(count(*) AS bigint) AS n_docs,
       |         CAST(sum(size(toks)) AS bigint) AS sum_dl
       |  FROM lens),
       |$perQueryCtes,
       |hits AS (
       |  $hitsUnion),
       |hr AS (
       |  SELECT h.query, h.doc_id, h.score,
       |         CASE $relCase
       |              END AS rel
       |  FROM hits h JOIN dl d ON d.doc_id = h.doc_id),
       |ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank,
       |         row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc_id) AS irank
       |  FROM hr),
       |perq AS (
       |  SELECT query, count(*) AS n_hits,
       |         CAST(sum(CASE WHEN rank <= 5
       |                  THEN rel * element_at($wArr, CAST(rank AS int))
       |                  ELSE 0L END) AS bigint) AS dcg_scaled,
       |         CAST(sum(CASE WHEN irank <= 5
       |                  THEN rel * element_at($wArr, CAST(irank AS int))
       |                  ELSE 0L END) AS bigint) AS idcg_scaled,
       |         min(CASE WHEN rel > 0L THEN rank END) AS first_rel_rank
       |  FROM ranked GROUP BY 1)
       |SELECT query, n_hits, dcg_scaled, idcg_scaled,
       |       CASE WHEN idcg_scaled > 0L
       |            THEN (dcg_scaled * 1048576L) div idcg_scaled END AS ndcg_scaled,
       |       CASE WHEN idcg_scaled > 0L
       |            THEN CAST(dcg_scaled AS double) / idcg_scaled END AS ndcg,
       |       first_rel_rank,
       |       1048576L div first_rel_rank AS rr_scaled
       |FROM perq""".stripMargin
  }

  /** Register the views a battery entry reads, plus the native functions,
    * then run the SQL. Idempotent per session — safe to call per query. */
  def run(spark: SparkSession, dir: String, views: Seq[String],
      sql: String): DataFrame = {
    graft.plans.GraftExtensions.registerAll(spark)
    views.foreach {
      case "events" =>
        Tables.events(spark, dir).createOrReplaceTempView("events")
      case "documents" =>
        Tables.documents(spark, dir).createOrReplaceTempView("documents")
      case "embeddings" =>
        Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
      case other =>
        Tables.table(spark, dir, other).createOrReplaceTempView(other)
    }
    spark.sql(sql)
  }

  /** Catalog-shaped entries: name → (session, dir) => DataFrame. */
  def entries: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    battery.map { case (name, twin, views, sql) =>
      (name, (s: SparkSession, d: String) => run(s, d, views, sql), twin)
    }
}
