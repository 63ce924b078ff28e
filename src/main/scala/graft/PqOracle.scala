package graft

/**
 * DuckDB oracle SQL for the product-quantization catalog rows — the PQ
 * analogue of the unrolled-Lloyd CTEs in `sim_ivf_kmeans_cells` /
 * `sim_recall_ivf`. Codebooks are retrained from scratch inside the oracle
 * (every Lloyd iteration unrolled), so training, encoding, and search are
 * pinned end-to-end, cross-engine — including the full IVF-PQ composite
 * (coarse quantizer → integer residuals → residual codebook → probed ADC).
 *
 * Everything runs in the INTEGER-QUANTIZED space of
 * `Similarity.quantizeVec` — floor(x · 2^20) per dimension, truncated
 * integer-division centroid means (DuckDB `//` ≡ Spark `div`, both toward
 * zero), integer sums of squares for distances. There is no double or
 * decimal anywhere in the compared values, so cross-engine equality is by
 * construction, not by matched rounding (a decimal-routed double version
 * of this oracle measurably diverged by 1 ulp — Spark's and DuckDB's
 * decimal→double conversions round differently).
 *
 * Fixed parameters mirror the catalog rows: dim 64, m=4 subspaces × 16
 * dims, ksub=16 cells, 2 iterations, queries vec_id < 5, k=5; IVF-PQ adds
 * nCells=16 coarse cells, nProbe=4.
 */
object PqOracle {

  /** Integer squared L2 between two bigint-list columns over dims 1..n
    * (1-based inclusive DuckDB indexing). Exact — order-free. */
  private def d2(a: String, b: String, n: Int): String =
    s"list_sum(list_transform(range(1, ${n + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))::bigint"

  /** Seed codebook: per sub_id, the k lowest-vec_id subvectors of `sv`
    * (cell_id = seed rank). */
  private def seeds(sv: String, out: String, k: Int): String =
    s"""$out AS (SELECT sub_id, (rk - 1)::int AS cell_id, subv AS cellv FROM (
       |         SELECT sub_id, subv,
       |                row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) AS rk
       |         FROM $sv)
       |       WHERE rk <= $k)""".stripMargin

  /** One Lloyd assignment over `sv` against `cents`: nearest cell per
    * (vec, sub) by integer squared L2 over `dims` dims, cell_id tie-break.
    * `extra` columns of `sv` pass through. */
  private def assign(sv: String, cents: String, out: String, dims: Int,
      extra: Seq[String] = Nil): String = {
    val ex = extra.map(c => s", s.$c").mkString
    val exOut = extra.map(c => s", $c").mkString
    s"""$out AS (SELECT vec_id, sub_id, subv, cell_id$exOut FROM (
       |  SELECT s.vec_id, s.sub_id, s.subv$ex, c.cell_id,
       |         row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
       |           ${d2("s.subv", "c.cellv", dims)},
       |           c.cell_id) AS rn
       |  FROM $sv s JOIN $cents c ON c.sub_id = s.sub_id) WHERE rn = 1)""".stripMargin
  }

  /** One Lloyd update: per-dimension truncated integer-division means over
    * `dims` dims. */
  private def update(from: String, out: String, dims: Int): String =
    s"""$out AS (
       |  SELECT sub_id, cell_id, list(cx ORDER BY dim) AS cellv FROM (
       |    SELECT sub_id, cell_id, d AS dim,
       |           sum(subv[d + 1])::bigint // count(*) AS cx
       |    FROM $from CROSS JOIN (SELECT unnest(range(0, $dims)) AS d)
       |    GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2)""".stripMargin

  /** Two unrolled Lloyd iterations + final assignment: seeds `c0x` →
    * trained `c2x` → assignment `a2x`. */
  private def lloyd2(sv: String, tag: String, k: Int, dims: Int,
      extra: Seq[String] = Nil): String =
    s"""${seeds(sv, s"c0$tag", k)},
       |${assign(sv, s"c0$tag", s"a0$tag", dims, extra)},
       |${update(s"a0$tag", s"c1$tag", dims)},
       |${assign(sv, s"c1$tag", s"a1$tag", dims, extra)},
       |${update(s"a1$tag", s"c2$tag", dims)},
       |${assign(sv, s"c2$tag", s"a2$tag", dims, extra)}""".stripMargin

  /** Shared prelude: quantized view + plain-PQ subspace view. */
  private val prelude =
    """v AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> cast(floor(x::double * 1048576.0) AS bigint)) AS vq
      |      FROM embeddings),
      |sv AS (SELECT vec_id, s AS sub_id, vq[s * 16 + 1 : s * 16 + 16] AS subv
      |       FROM v CROSS JOIN (SELECT unnest(range(0, 4)) AS s))""".stripMargin

  /** Trained plain-PQ codebook (c2) + final encoding (a2), shared by the
    * non-composite rows. */
  private val trained =
    s"""$prelude,
       |${lloyd2("sv", "", 16, 16)}""".stripMargin

  /** ADC scoring CTEs on top of [[trained]]: per-query lookup table and the
    * per-(query, vec) integer sum over subspaces. */
  private val adcScored =
    s"""q AS (SELECT vec_id AS query_id, sub_id, subv FROM sv WHERE vec_id < 5),
       |lut AS (SELECT q.query_id, c.sub_id, c.cell_id AS code,
       |               ${d2("q.subv", "c.cellv", 16)} AS pd2
       |        FROM q JOIN c2 c ON c.sub_id = q.sub_id),
       |scored AS (SELECT l.query_id, k.vec_id, sum(l.pd2)::bigint AS adc_d2
       |           FROM (SELECT vec_id, sub_id, cell_id AS code FROM a2) k
       |           JOIN lut l ON l.sub_id = k.sub_id AND l.code = k.code
       |           WHERE k.vec_id != l.query_id
       |           GROUP BY 1, 2),
       |approx AS (SELECT query_id, rank, neighbor_id, adc_d2 FROM (
       |  SELECT query_id, vec_id AS neighbor_id, adc_d2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored) WHERE rank <= 5)""".stripMargin

  /** Exact-recall epilogue shared by the recall rows: brute top-5 in the
    * quantized space, hit counts against `approxRel(query_id,
    * neighbor_id)`. */
  private def recallAgainst(approxRel: String): String =
    s"""brute AS (SELECT query_id, neighbor_id FROM (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |           ${d2("qq.vq", "c.vq", 64)},
       |           c.vec_id) AS rnk
       |  FROM (SELECT * FROM v WHERE vec_id < 5) qq
       |  CROSS JOIN v c WHERE c.vec_id != qq.vec_id)
       |  WHERE rnk <= 5)
       |SELECT b.query_id,
       |       count(*) AS n_true,
       |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |            AS bigint) AS n_hit,
       |       cast(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |            AS double) / count(*) AS recall
       |FROM brute b
       |LEFT JOIN $approxRel a
       |  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
       |GROUP BY 1""".stripMargin

  val codesSql: String =
    s"""WITH $trained
       |SELECT vec_id, sub_id, cell_id AS code FROM a2""".stripMargin

  /** PQ codes restricted to the snapshot-diff RE-ENCODE set (added/changed
    * docs of crawl B vs crawl A, the corpus_snapshot_diff schedule) — the
    * incremental-serving oracle: same trained codebook, delta-only encode. */
  val incrementalCodesSql: String =
    s"""WITH $trained,
       |sa AS (SELECT doc_id, md5(text) AS fp_a FROM documents WHERE doc_id % 10 <> 0),
       |sb AS (SELECT doc_id,
       |              md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS fp_b
       |       FROM documents WHERE doc_id % 7 <> 3),
       |delta AS (
       |  SELECT doc_id FROM sa FULL OUTER JOIN sb USING (doc_id)
       |  WHERE fp_a IS NULL OR (fp_b IS NOT NULL AND fp_a <> fp_b))
       |SELECT a2.vec_id, a2.sub_id, a2.cell_id AS code
       |FROM a2 JOIN delta ON delta.doc_id = a2.vec_id""".stripMargin

  val adcSql: String =
    s"""WITH $trained,
       |$adcScored
       |SELECT query_id, rank, neighbor_id, adc_d2 FROM approx""".stripMargin

  val recallSql: String =
    s"""WITH $trained,
       |$adcScored,
       |${recallAgainst("approx")}""".stripMargin

  /** ADC shortlist (50) → exact re-rank top-5 → recall vs brute. */
  val rerankRecallSql: String =
    s"""WITH $trained,
       |$adcScored,
       |cand AS (SELECT query_id, vec_id AS neighbor_id FROM (
       |  SELECT query_id, vec_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored) WHERE rank <= 50),
       |rr AS (SELECT c.query_id, c.neighbor_id,
       |              ${d2("qv.vq", "nv.vq", 64)} AS d2
       |       FROM cand c
       |       JOIN v qv ON qv.vec_id = c.query_id
       |       JOIN v nv ON nv.vec_id = c.neighbor_id),
       |rtop AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY d2, neighbor_id) AS rank
       |  FROM rr) WHERE rank <= 5),
       |${recallAgainst("rtop")}""".stripMargin

  /**
   * The full IVF-PQ composite: coarse 16-cell quantizer over the whole
   * 64-dim vector (one-subspace Lloyd, tag `cc`), integer residuals per
   * inverted list, residual codebook (tag `rc`), nProbe=4 probed cells per
   * query, ADC over probed members only. Output matches the Spark
   * `ivfPqTopK` contract exactly.
   */
  /** The IVF-PQ chain through `scored` (per-(query, vec) probed ADC sums) —
    * shared by the top-k row and the re-rank recall row. */
  private val ivfPqScored: String =
    s"""v AS (SELECT vec_id,
       |             list_transform(embedding,
       |               x -> cast(floor(x::double * 1048576.0) AS bigint)) AS vq
       |      FROM embeddings),
       |sv1 AS (SELECT vec_id, 0 AS sub_id, vq AS subv FROM v),
       |${lloyd2("sv1", "cc", 16, 64)},
       |resid AS (SELECT a.vec_id, a.cell_id AS cell0,
       |                 list_transform(range(1, 65),
       |                   i -> a.subv[i] - c.cellv[i]) AS rq
       |          FROM a2cc a JOIN c2cc c ON c.cell_id = a.cell_id),
       |rsv AS (SELECT vec_id, cell0, s AS sub_id,
       |               rq[s * 16 + 1 : s * 16 + 16] AS subv
       |        FROM resid CROSS JOIN (SELECT unnest(range(0, 4)) AS s)),
       |${lloyd2("rsv", "rc", 16, 16, extra = Seq("cell0"))},
       |codes AS (SELECT vec_id, sub_id, cell_id AS code, cell0 FROM a2rc),
       |q AS (SELECT vec_id AS query_id, vq FROM v WHERE vec_id < 5),
       |probes AS (SELECT query_id, cell0, rq FROM (
       |  SELECT q.query_id, c.cell_id AS cell0,
       |         list_transform(range(1, 65), i -> q.vq[i] - c.cellv[i]) AS rq,
       |         row_number() OVER (PARTITION BY q.query_id ORDER BY
       |           ${d2("q.vq", "c.cellv", 64)},
       |           c.cell_id) AS pr
       |  FROM q CROSS JOIN c2cc c) WHERE pr <= 4),
       |qsub AS (SELECT query_id, cell0, s AS sub_id,
       |                rq[s * 16 + 1 : s * 16 + 16] AS subv
       |         FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS s)),
       |lut AS (SELECT qs.query_id, qs.cell0, r.sub_id, r.cell_id AS code,
       |               ${d2("qs.subv", "r.cellv", 16)} AS pd2
       |        FROM qsub qs JOIN c2rc r ON r.sub_id = qs.sub_id),
       |scored AS (SELECT l.query_id, k.vec_id, sum(l.pd2)::bigint AS adc_d2
       |           FROM codes k
       |           JOIN lut l ON l.cell0 = k.cell0 AND l.sub_id = k.sub_id
       |                     AND l.code = k.code
       |           WHERE k.vec_id != l.query_id
       |           GROUP BY 1, 2)""".stripMargin

  val ivfPqSql: String =
    s"""WITH $ivfPqScored
       |SELECT query_id, rank, neighbor_id, adc_d2 FROM (
       |  SELECT query_id, vec_id AS neighbor_id, adc_d2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored) WHERE rank <= 5""".stripMargin

  /** IVF-PQ probe → ADC shortlist (50) → exact re-rank top-5 → recall vs
    * brute: the complete production query path, quality-pinned. */
  val ivfPqRerankRecallSql: String =
    s"""WITH $ivfPqScored,
       |cand AS (SELECT query_id, vec_id AS neighbor_id FROM (
       |  SELECT query_id, vec_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored) WHERE rank <= 50),
       |rr AS (SELECT c.query_id, c.neighbor_id,
       |              ${d2("qv.vq", "nv.vq", 64)} AS d2
       |       FROM cand c
       |       JOIN v qv ON qv.vec_id = c.query_id
       |       JOIN v nv ON nv.vec_id = c.neighbor_id),
       |rtop AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY d2, neighbor_id) AS rank
       |  FROM rr) WHERE rank <= 5),
       |${recallAgainst("rtop")}""".stripMargin

  /**
   * Recall@5 + MAP of EVERY pruning/compression tier (LSH / IVF / PQ /
   * IVF-PQ) against the ONE exact-L2 baseline, in one result frame — the
   * eval_recall_map_ann row: a tier regression surfaces as its row moving.
   * Each tier's chain is the same machinery its own recall row pins
   * (LSH planes + cosine rank, double-space Lloyd IVF, integer-quantized
   * PQ/IVF-PQ); queries vec_id < 5 everywhere; metrics in the 2^20
   * fixed-point discipline of `Eval.recallApAtK` (floor `//` ≡ Spark
   * `div` on these non-negative values). Queries a tier returns nothing
   * for still count, with zero hits.
   */
  val recallMapAnnSql: String = {
    val s20 = 1L << 20
    // double-space cosine helpers (the sim_recall_lsh / sim_recall_ivf
    // oracle idiom, verbatim)
    val cos = (a: String, b: String) =>
      s"""list_dot_product($a, $b)
         |               / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
    def assignD(cents: String, out: String) =
      s"""$out AS (SELECT vec_id, ve, cell_id FROM (
         |  SELECT vd.vec_id, vd.ve, c.cell_id,
         |         row_number() OVER (PARTITION BY vd.vec_id ORDER BY
         |           ${cos("vd.ve", "c.cellv")} DESC,
         |           c.cell_id) AS rn
         |  FROM vd CROSS JOIN $cents c) WHERE rn = 1)"""
    def updateD(from: String, out: String) =
      s"""$out AS (
         |  SELECT cell_id, list(cx ORDER BY dim) AS cellv FROM (
         |    SELECT cell_id, d AS dim,
         |           cast(sum(cast(ve[d + 1] AS decimal(30,15))) AS double) / count(*) AS cx
         |    FROM $from CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)"""
    s"""WITH $trained,
       |qp AS (SELECT vec_id AS query_id, sub_id, subv FROM sv WHERE vec_id < 5),
       |lutp AS (SELECT q.query_id, c.sub_id, c.cell_id AS code,
       |               ${d2("q.subv", "c.cellv", 16)} AS pd2
       |        FROM qp q JOIN c2 c ON c.sub_id = q.sub_id),
       |scoredp AS (SELECT l.query_id, k.vec_id, sum(l.pd2)::bigint AS adc_d2
       |           FROM (SELECT vec_id, sub_id, cell_id AS code FROM a2) k
       |           JOIN lutp l ON l.sub_id = k.sub_id AND l.code = k.code
       |           WHERE k.vec_id != l.query_id
       |           GROUP BY 1, 2),
       |pqap AS (SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scoredp) WHERE rank <= 5),
       |sv1 AS (SELECT vec_id, 0 AS sub_id, vq AS subv FROM v),
       |${lloyd2("sv1", "cc", 16, 64)},
       |resid AS (SELECT a.vec_id, a.cell_id AS cell0,
       |                 list_transform(range(1, 65),
       |                   i -> a.subv[i] - c.cellv[i]) AS rq
       |          FROM a2cc a JOIN c2cc c ON c.cell_id = a.cell_id),
       |rsv AS (SELECT vec_id, cell0, s AS sub_id,
       |               rq[s * 16 + 1 : s * 16 + 16] AS subv
       |        FROM resid CROSS JOIN (SELECT unnest(range(0, 4)) AS s)),
       |${lloyd2("rsv", "rc", 16, 16, extra = Seq("cell0"))},
       |codes AS (SELECT vec_id, sub_id, cell_id AS code, cell0 FROM a2rc),
       |q2 AS (SELECT vec_id AS query_id, vq FROM v WHERE vec_id < 5),
       |probes AS (SELECT query_id, cell0, rq FROM (
       |  SELECT q.query_id, c.cell_id AS cell0,
       |         list_transform(range(1, 65), i -> q.vq[i] - c.cellv[i]) AS rq,
       |         row_number() OVER (PARTITION BY q.query_id ORDER BY
       |           ${d2("q.vq", "c.cellv", 64)},
       |           c.cell_id) AS pr
       |  FROM q2 q CROSS JOIN c2cc c) WHERE pr <= 4),
       |qsub AS (SELECT query_id, cell0, s AS sub_id,
       |                rq[s * 16 + 1 : s * 16 + 16] AS subv
       |         FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS s)),
       |lut2 AS (SELECT qs.query_id, qs.cell0, r.sub_id, r.cell_id AS code,
       |               ${d2("qs.subv", "r.cellv", 16)} AS pd2
       |        FROM qsub qs JOIN c2rc r ON r.sub_id = qs.sub_id),
       |scored2 AS (SELECT l.query_id, k.vec_id, sum(l.pd2)::bigint AS adc_d2
       |           FROM codes k
       |           JOIN lut2 l ON l.cell0 = k.cell0 AND l.sub_id = k.sub_id
       |                     AND l.code = k.code
       |           WHERE k.vec_id != l.query_id
       |           GROUP BY 1, 2),
       |ivfpqap AS (SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored2) WHERE rank <= 5),
       |vd AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ve
       |       FROM embeddings),
       |bk AS (
       |  SELECT vec_id,
       |         list_sum(list_transform(generate_series(0, 7), p ->
       |           CASE WHEN list_sum(list_transform(generate_series(0, len(ve) - 1), d ->
       |                  ve[d + 1] * ((('0x' || substr(md5(p || ':' || d), 1, 15))::bigint
       |                                / 1.152921504606846976e18) * 2 - 1))) >= 0
       |                THEN cast(pow(2.0, p) AS bigint) ELSE 0 END))::bigint AS bucket
       |  FROM vd),
       |qd AS (SELECT * FROM vd WHERE vec_id < 5),
       |lshap AS (
       |  SELECT query_id, neighbor_id, rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             ${cos("q.ve", "c.ve")} DESC,
       |             c.vec_id) AS rank
       |    FROM qd q
       |    JOIN bk qb ON qb.vec_id = q.vec_id
       |    JOIN bk cb ON cb.bucket = qb.bucket AND cb.vec_id != q.vec_id
       |    JOIN vd c ON c.vec_id = cb.vec_id)
       |  WHERE rank <= 5),
       |c0f AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::int AS cell_id, ve AS cellv
       |        FROM (SELECT * FROM vd ORDER BY vec_id LIMIT 16)),
       |${assignD("c0f", "a0f")},
       |${updateD("a0f", "c1f")},
       |${assignD("c1f", "a1f")},
       |${updateD("a1f", "c2f")},
       |rankedf AS (
       |  SELECT vd.vec_id, vd.ve, c.cell_id,
       |         row_number() OVER (PARTITION BY vd.vec_id ORDER BY
       |           ${cos("vd.ve", "c.cellv")} DESC,
       |           c.cell_id) AS cell_rank
       |  FROM vd CROSS JOIN c2f c),
       |assignedf AS (SELECT vec_id, ve, cell_id FROM rankedf WHERE cell_rank = 1),
       |probesf AS (SELECT vec_id, ve, cell_id FROM rankedf
       |            WHERE cell_rank <= 4 AND vec_id < 5),
       |ivfap AS (
       |  SELECT query_id, neighbor_id, rank FROM (
       |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |             ${cos("p.ve", "a.ve")} DESC,
       |             a.vec_id) AS rank
       |    FROM probesf p JOIN assignedf a
       |      ON a.cell_id = p.cell_id AND a.vec_id != p.vec_id)
       |  WHERE rank <= 5),
       |allap AS (
       |  SELECT 'lsh' AS tier, * FROM lshap
       |  UNION ALL SELECT 'ivf' AS tier, * FROM ivfap
       |  UNION ALL SELECT 'pq' AS tier, * FROM pqap
       |  UNION ALL SELECT 'ivfpq' AS tier, * FROM ivfpqap),
       |tru AS (SELECT query_id, neighbor_id FROM (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |           ${d2("qq.vq", "c.vq", 64)},
       |           c.vec_id) AS rnk
       |  FROM (SELECT * FROM v WHERE vec_id < 5) qq
       |  CROSS JOIN v c WHERE c.vec_id != qq.vec_id)
       |  WHERE rnk <= 5),
       |hits AS (
       |  SELECT a.tier, a.query_id, a.rank,
       |         CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM allap a LEFT JOIN tru t
       |    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
       |rh AS (
       |  SELECT *, sum(hit) OVER (PARTITION BY tier, query_id ORDER BY rank
       |                           ROWS BETWEEN UNBOUNDED PRECEDING
       |                           AND CURRENT ROW) AS hits_upto
       |  FROM hits),
       |perq0 AS (
       |  SELECT tier, query_id, sum(hit)::bigint AS n_hits,
       |         sum(CASE WHEN hit = 1 THEN (hits_upto * $s20) // rank
       |                  ELSE 0 END)::bigint AS ap_sum
       |  FROM rh GROUP BY 1, 2),
       |ntrue AS (SELECT query_id, count(*)::bigint AS n_true FROM tru GROUP BY 1),
       |tq AS (
       |  SELECT t.tier, n.query_id, n.n_true,
       |         coalesce(p.n_hits, 0) AS n_hits,
       |         (coalesce(p.n_hits, 0) * $s20) // n.n_true AS recall_scaled,
       |         coalesce(p.ap_sum, 0) // n.n_true AS ap_scaled
       |  FROM (VALUES ('lsh'), ('ivf'), ('pq'), ('ivfpq')) t(tier)
       |  CROSS JOIN ntrue n
       |  LEFT JOIN perq0 p ON p.tier = t.tier AND p.query_id = n.query_id)
       |SELECT tier, count(*)::bigint AS n_queries,
       |       sum(recall_scaled)::bigint AS sum_recall_scaled,
       |       sum(recall_scaled)::double / (${s20}.0 * count(*)) AS mean_recall,
       |       sum(ap_scaled)::bigint AS sum_ap_scaled,
       |       sum(ap_scaled)::double / (${s20}.0 * count(*)) AS map
       |FROM tq GROUP BY 1""".stripMargin
  }

  /** NDCG@5 / MRR of the IVF-PQ ranking against exact-L2 relevance (the
    * eval_ndcg_ann row): graded relevance = 6 − exact rank for the true
    * top-5, 0 otherwise — so the metric rewards ORDER, where recall only
    * counts membership. Same [[graft.operators.Eval.dcgWeights]] plan
    * literals as every NDCG frontend. */
  val ndcgAnnSql: String = {
    val w = graft.operators.Eval.dcgWeights(5).mkString("[", ", ", "]")
    s"""WITH $ivfPqScored,
       |top AS (SELECT query_id, neighbor_id, adc_d2, rank FROM (
       |  SELECT query_id, vec_id AS neighbor_id, adc_d2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_d2, vec_id) AS rank
       |  FROM scored) WHERE rank <= 5),
       |brute AS (SELECT query_id, neighbor_id, rnk FROM (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |           ${d2("qq.vq", "c.vq", 64)},
       |           c.vec_id) AS rnk
       |  FROM (SELECT * FROM v WHERE vec_id < 5) qq
       |  CROSS JOIN v c WHERE c.vec_id != qq.vec_id)
       |  WHERE rnk <= 5),
       |hr AS (
       |  SELECT t.query_id, t.neighbor_id, t.rank,
       |         coalesce(6 - b.rnk, 0)::bigint AS rel
       |  FROM top t LEFT JOIN brute b
       |    ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY rel DESC, neighbor_id) AS irank
       |  FROM hr),
       |perq AS (
       |  SELECT query_id, count(*)::bigint AS n_hits,
       |         sum(rel * list_extract($w, rank::int))::bigint AS dcg_scaled,
       |         sum(CASE WHEN irank <= 5
       |                  THEN rel * list_extract($w, irank::int)
       |                  ELSE 0 END)::bigint AS idcg_scaled,
       |         min(CASE WHEN rel > 0 THEN rank END)::int AS first_rel_rank
       |  FROM ranked GROUP BY 1)
       |SELECT query_id, n_hits, dcg_scaled, idcg_scaled,
       |       CASE WHEN idcg_scaled > 0
       |            THEN CAST((dcg_scaled * 1048576) // idcg_scaled AS bigint)
       |            END AS ndcg_scaled,
       |       CASE WHEN idcg_scaled > 0
       |            THEN dcg_scaled::double / idcg_scaled END AS ndcg,
       |       first_rel_rank,
       |       CAST(1048576 // first_rel_rank AS bigint) AS rr_scaled
       |FROM perq""".stripMargin
  }
}
