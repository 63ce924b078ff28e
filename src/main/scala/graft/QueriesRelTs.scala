package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Queries._

/** Web, window shapes, relational breadth, CEP/time-series/entity, sketches — one slice of the driver-facing catalog, mechanically moved out
  * of Queries.scala in the round-15 maintainability split (verdict-r14
  * item 8). Rows are UNCHANGED; shared helpers and the cross-engine
  * determinism conventions live in [[Queries]]; the one `queries` map is
  * composed there. */
object QueriesRelTs {

  /** The CUSUM scorer with the catalog's pinned parameters, shared by the
    * training row (profile computed in-query) and the served row (profile
    * read from the Artifacts parquet). */
  private def cusumScored(ev: DataFrame, profile: DataFrame): DataFrame =
    TimeSeries.cusumChangepoints(ev, profile,
        keyCol = col("user_id"), idCol = col("event_id"),
        tsCol = col("ts"), tieCol = col("event_id"),
        valueCol = col("value"), quantScale = 1000L,
        slackScaled = 20000L, hScaled = 200000L)
      .select(col("key").as("user_id"), col("id").as("event_id"),
        col("qv"), col("cusum_up"), col("cusum_dn"),
        col("is_shift_up"), col("is_shift_dn"))

  /** One oracle for both CUSUM rows — the served twin's artifact derives
    * from the same corpus, so the scored frame is bit-identical. */
  private lazy val cusumOracleSql: String = cusumOracleCtes +
    """
      |SELECT k AS user_id, id AS event_id, qv,
      |       cusum_up::bigint AS cusum_up, cusum_dn::bigint AS cusum_dn,
      |       (CASE WHEN cusum_up > 200000 * s_cnt THEN 1 ELSE 0 END)::int
      |         AS is_shift_up,
      |       (CASE WHEN cusum_dn > 200000 * s_cnt THEN 1 ELSE 0 END)::int
      |         AS is_shift_dn
      |FROM c""".stripMargin

  /** The CUSUM CTE chain through the per-reading frame `c` — shared by
    * the scored rows and the peak-localization row. */
  private lazy val cusumOracleCtes: String =
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
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** The rolling-forecast CTE chain through the per-reading frame `f`
    * (W = 8 ⇒ SI = 36, SII = 204, D = 336 — the plan literals both
    * engines share) — shared by the forecast row and its MASE backtest.
    * siy re-bases the sliding position-weighted sum exactly:
    * Σ i·y = s2 − (rn − 9)·sy. */
  private lazy val forecastOracleCtes: String =
    """WITH s AS (
      |  SELECT user_id AS k, event_id AS id, ts,
      |         floor(value * 1000)::bigint AS qv,
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
      |           (204 * sy - 36 * (s2 - (rn - 9) * sy))
      |           + (8 * (s2 - (rn - 9) * sy) - 36 * sy) * 9 END AS fc_num
      |  FROM w)""".stripMargin

  private[graft] def rows
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

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
        cusumScored(ev,
          TimeSeries.keyProfile(ev, col("user_id"), col("value"), 1000L))
      },
      Some(cusumOracleSql)),

    // The SERVED twin (the train-once/score-many ladder): the baseline
    // profile is an Artifacts-persisted parquet — this row's plan is the
    // scorer alone (scan + broadcastable join + two window passes), no
    // profile aggregation subtree (PlanAuditSpec pins it). Same oracle:
    // the artifact derives from the same corpus, so labels are identical.
    // The streaming form (StatefulOps.cusumStream) joins the SAME
    // artifact with O(1) state per key.
    ("events_ts_changepoints_served",
      (s: SparkSession, d: String) =>
        cusumScored(Tables.events(s, d),
          s.read.parquet(Artifacts.keyProfile(s, d))),
      Some(cusumOracleSql)),

    // Changepoint LOCALIZATION: per (key, side), WHERE the regime change
    // most likely sits — the flagged reading with the maximal CUSUM
    // excursion (ties to the earliest event id). The per-key answer a
    // dashboard wants ("this metric stepped HERE"), one rank window over
    // the already-flagged subset per side.
    ("events_ts_changepoint_peaks",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val scored = cusumScored(ev,
          TimeSeries.keyProfile(ev, col("user_id"), col("value"), 1000L))
        import org.apache.spark.sql.expressions.Window
        def peak(flag: String, cusum: String, side: String): DataFrame = {
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col(cusum).desc, col("event_id"))
          scored.filter(col(flag) === 1)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(col("user_id"), lit(side).as("side"), col("event_id"),
              col(cusum).as("cusum"))
        }
        peak("is_shift_up", "cusum_up", "up")
          .unionByName(peak("is_shift_dn", "cusum_dn", "dn"))
      },
      Some(cusumOracleCtes +
        """,
          |up AS (
          |  SELECT k, id, cusum_up,
          |         row_number() OVER (PARTITION BY k
          |                            ORDER BY cusum_up DESC, id) AS rn
          |  FROM c WHERE cusum_up > 200000 * s_cnt),
          |dn AS (
          |  SELECT k, id, cusum_dn,
          |         row_number() OVER (PARTITION BY k
          |                            ORDER BY cusum_dn DESC, id) AS rn
          |  FROM c WHERE cusum_dn > 200000 * s_cnt)
          |SELECT k AS user_id, 'up' AS side, id AS event_id,
          |       cusum_up::bigint AS cusum
          |FROM up WHERE rn = 1
          |UNION ALL
          |SELECT k AS user_id, 'dn' AS side, id AS event_id,
          |       cusum_dn::bigint AS cusum
          |FROM dn WHERE rn = 1""".stripMargin)),

    // Seasonal-trend decomposition (TimeSeries.decompose — the STL idea,
    // integer-exact): every reading splits into a centered-window trend
    // numerator, a cross-multiplied detrended value, the per-(key, hour)
    // seasonal mean in (sum, count) form, and the exact residual
    // (qv − trend − seasonal)·window·cnt. Edge rows (< window neighbors)
    // are NULL — the honest undecomposable verdict. One key shuffle, one
    // map-side (key, phase) aggregation, one broadcastable join.
    ("events_ts_decompose",
      (s: SparkSession, d: String) =>
        TimeSeries.decompose(Tables.events(s, d),
            keyCol = col("user_id"), idCol = col("event_id"),
            tsCol = col("ts"), tieCol = col("event_id"),
            phaseCol = hour(col("ts")), valueCol = col("value"),
            window = 25, quantScale = 1000L)
          .select(col("key").as("user_id"), col("id").as("event_id"),
            col("phase").as("hr"), col("qv"), col("trend_num"),
            col("d_scaled"), col("s_cnt"), col("resid_scaled")),
      Some(
        """WITH s AS (
          |  SELECT user_id AS k, event_id AS id, ts,
          |         extract(hour FROM ts)::int AS hr,
          |         floor(value * 1000)::bigint AS qv
          |  FROM events),
          |t AS (
          |  SELECT *, sum(qv) OVER w AS t_num, count(*) OVER w AS t_cnt
          |  FROM s
          |  WINDOW w AS (PARTITION BY k ORDER BY ts, id
          |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
          |dt AS (
          |  SELECT *, CASE WHEN t_cnt = 25 THEN qv * 25 - t_num END AS d_scaled
          |  FROM t),
          |seas AS (
          |  SELECT k, hr, sum(d_scaled)::bigint AS s_num,
          |         count(*)::bigint AS s_cnt
          |  FROM dt WHERE d_scaled IS NOT NULL GROUP BY 1, 2)
          |SELECT dt.k AS user_id, dt.id AS event_id, dt.hr, dt.qv,
          |       (CASE WHEN dt.t_cnt = 25 THEN dt.t_num END)::bigint AS trend_num,
          |       dt.d_scaled::bigint AS d_scaled,
          |       seas.s_cnt,
          |       (dt.d_scaled * seas.s_cnt - seas.s_num)::bigint AS resid_scaled
          |FROM dt LEFT JOIN seas ON seas.k = dt.k AND seas.hr = dt.hr""".stripMargin)),

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

    // Rolling-origin one-step FORECAST (TimeSeries.forecastRolling —
    // verdict-r15 item 3, the fifth TS quarter: the family covers shape/
    // level/regime/decomposition; this projects FORWARD): at every
    // reading, an exact OLS line (the Holt-linear level+trend shape) over
    // the trailing 8 STRICTLY PRIOR readings predicts the next step, all
    // in exact numerators — the normal-equation sums over positions 1..8
    // are plan literals (SI=36, SII=204, D=336), the data sums are two
    // sliding-window longs over ONE key shuffle, fc_num = forecast·336,
    // err_scaled = (actual − forecast)·336. Short-history rows are NULL
    // (the decompose edge discipline).
    ("events_ts_forecast",
      (s: SparkSession, d: String) =>
        TimeSeries.forecastRolling(Tables.events(s, d),
            keyCol = col("user_id"), idCol = col("event_id"),
            tsCol = col("ts"), tieCol = col("event_id"),
            valueCol = col("value"), window = 8, quantScale = 1000L)
          .select(col("key").as("user_id"), col("id").as("event_id"),
            col("qv"), col("fc_num"), col("err_scaled")),
      Some(forecastOracleCtes +
        """
          |SELECT k AS user_id, id AS event_id, qv,
          |       fc_num::bigint AS fc_num,
          |       (CASE WHEN fc_num IS NOT NULL THEN qv * 336 - fc_num END)::bigint
          |         AS err_scaled
          |FROM f""".stripMargin)),

    // Rolling-origin BACKTEST of the forecaster: per-key MASE in exact
    // numerator/denominator form — Σ|forecast error| against Σ|naive
    // one-step error| over the SAME evaluable rows (the row count
    // cancels, so MASE = sae_fc_scaled / (336·sae_naive), ONE final IEEE
    // division). The metric that says whether the trend line beats the
    // random walk ("MASE < 1") — per key, so regressing keys surface
    // individually. One aggregation over the forecast frame.
    ("events_ts_forecast_eval",
      (s: SparkSession, d: String) =>
        TimeSeries.forecastBacktest(Tables.events(s, d),
            keyCol = col("user_id"), idCol = col("event_id"),
            tsCol = col("ts"), tieCol = col("event_id"),
            valueCol = col("value"), window = 8, quantScale = 1000L)
          .select(col("key").as("user_id"), col("n_eval"),
            col("sae_fc_scaled"), col("sae_naive"), col("mase")),
      Some(forecastOracleCtes +
        """
          |SELECT k AS user_id, count(*)::bigint AS n_eval,
          |       sum(abs(qv * 336 - fc_num))::bigint AS sae_fc_scaled,
          |       sum(abs(nd))::bigint AS sae_naive,
          |       CASE WHEN sum(abs(nd)) > 0
          |            THEN sum(abs(qv * 336 - fc_num))::double
          |                 / (sum(abs(nd)) * 336) END AS mase
          |FROM f WHERE fc_num IS NOT NULL GROUP BY 1""".stripMargin)),

    // Forecast SERVING against the persistable level/trend artifact
    // (TimeSeries.trendProfile → forecastAgainstProfile): train on each
    // key's first 80% (the artifact keeps the OLS sufficient statistics
    // of the last 64 training readings — bounding the tail is both the
    // long-range guarantee, the global normal equations grow like n⁴·qv,
    // AND the right serving semantics: extrapolate the RECENT trend),
    // then score the held-out 20% h steps past the training end, exact
    // cross-multiplied integers throughout; |err| > tau·den flags the
    // surprises. The streaming twin (StatefulOps.forecastScoreStream)
    // holds ONE long of state per key — the arrival counter — against the
    // same artifact; parity is spec-pinned. Keys too short to train
    // (cut = 0) drop at the profile join; artifacts with n < 2 score NULL
    // (no line through one point).
    ("events_ts_forecast_served",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))))
          .withColumn("cut", expr(
            "(4 * count(*) OVER (PARTITION BY user_id)) div 5"))
        val profile = TimeSeries.trendProfile(
          base.filter(col("rn") <= col("cut")), col("user_id"), col("ts"),
          col("event_id"), col("value"), lastN = 64, quantScale = 1000L)
        TimeSeries.forecastAgainstProfile(
            base.filter(col("rn") > col("cut"))
              .withColumn("h", col("rn") - col("cut")),
            profile, keyCol = col("user_id"), idCol = col("event_id"),
            hCol = col("h"), valueCol = col("value"), quantScale = 1000L,
            tauScaled = 200000L)
          .select(col("key").as("user_id"), col("id").as("event_id"),
            col("h"), col("qv"), col("n"), col("den"), col("fc_num"),
            col("err_scaled"), col("is_surprise"))
      },
      Some(
        """WITH s AS (
          |  SELECT user_id AS k, event_id AS id, ts,
          |         floor(value * 1000)::bigint AS qv,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY ts, event_id) AS rn,
          |         (4 * count(*) OVER (PARTITION BY user_id)) // 5 AS cut
          |  FROM events),
          |tl AS (
          |  SELECT k, qv,
          |         row_number() OVER (PARTITION BY k
          |                            ORDER BY ts DESC, id DESC) AS rd
          |  FROM s WHERE rn <= cut),
          |ti AS (
          |  SELECT k, qv,
          |         row_number() OVER (PARTITION BY k ORDER BY rd DESC) AS i
          |  FROM tl WHERE rd <= 64),
          |prof AS (
          |  SELECT k, count(*)::bigint AS n, sum(qv)::bigint AS s_y,
          |         sum(i * qv)::bigint AS s_iy
          |  FROM ti GROUP BY 1),
          |t AS (SELECT k, id, qv, rn - cut AS h FROM s WHERE rn > cut),
          |j AS (
          |  SELECT t.*, p.n, p.s_y, p.s_iy,
          |         n * (n + 1) // 2 AS si,
          |         n * (n + 1) * (2 * n + 1) // 6 AS sii
          |  FROM t JOIN prof p ON p.k = t.k),
          |g AS (
          |  SELECT *,
          |         CASE WHEN n >= 2 THEN n * sii - si * si END AS den,
          |         CASE WHEN n >= 2 THEN (sii * s_y - si * s_iy)
          |              + (n * s_iy - si * s_y) * (n + h) END AS fc_num
          |  FROM j)
          |SELECT k AS user_id, id AS event_id, h::bigint AS h, qv,
          |       n, den::bigint AS den, fc_num::bigint AS fc_num,
          |       (qv * den - fc_num)::bigint AS err_scaled,
          |       (CASE WHEN den IS NULL THEN NULL
          |             WHEN abs(qv * den - fc_num) > 200000 * den THEN 1
          |             ELSE 0 END)::int AS is_surprise
          |FROM g""".stripMargin)),

    // ALL-MATCHES CEP (Cep.allSeqMatches — verdict-r15 item 2, the
    // AFTER MATCH SKIP TO NEXT ROW policy; lastSeqMatchN pins
    // skip-till-last): every purchase reports EVERY view anchor (up to
    // the 8 most recent within the 7-day window, capped by recency
    // BEFORE validity — deterministic) that chains through the latest
    // click with no error after the anchor. The anchor state is a
    // range-frame collect bounded by the match window (retention-horizon
    // state, not key history); still one key shuffle, no NFA, no
    // self-join. span_rank numbers anchors by recency within the capped
    // set; skip-till-last ⊆ all-matches is property-pinned (CepSpec).
    ("events_cep_all_matches",
      (s: SparkSession, d: String) =>
        Cep.allSeqMatches(Tables.events(s, d),
            keyCol = col("user_id"), tsCol = col("ts"), tieCol = col("event_id"),
            steps = Seq(col("event_type") === "view",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            negation = col("event_type") === "error",
            windowSeconds = 604800L, maxSpans = 8)
          .select(col("key").as("user_id"), col("close_id").as("purchase_id"),
            ntz(col("ts_1")).as("view_ts"), ntz(col("ts_2")).as("click_ts"),
            ntz(col("ts_3")).as("purchase_ts"), col("gap_seconds"),
            col("span_rank")),
      Some(
        """WITH o AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER w_run AS n_upto
          |  FROM events
          |  WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |l AS (
          |  SELECT *,
          |         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
          |           OVER w AS l1_ts
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
          |  SELECT cl.*, an.a_ts, an.a_id, an.a_n,
          |         row_number() OVER (PARTITION BY cl.user_id, cl.purchase_id
          |                            ORDER BY an.a_ts DESC, an.a_id DESC) AS rk
          |  FROM cl JOIN an ON an.user_id = cl.user_id
          |   AND an.a_ts <= cl.c_ts
          |   AND epoch_us(cl.c_ts) - epoch_us(an.a_ts) <= 604800000000)
          |SELECT user_id, purchase_id, a_ts AS view_ts, l1_ts AS click_ts,
          |       c_ts AS purchase_ts,
          |       (epoch_us(c_ts) - epoch_us(a_ts)) // 1000000 AS gap_seconds,
          |       rk::int AS span_rank
          |FROM cand
          |WHERE rk <= 8 AND a_ts < l1_ts AND c_n = a_n""".stripMargin)),

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
}
