package graft

/**
 * DuckDB oracle SQL for the product-quantization catalog rows — the PQ
 * analogue of the unrolled-Lloyd CTEs in `sim_ivf_kmeans_cells` /
 * `sim_recall_ivf`. The codebook is retrained from scratch inside the
 * oracle (both Lloyd iterations unrolled), so the check pins training,
 * encoding, and ADC search end-to-end, cross-engine.
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
 * dims, ksub=16 cells, 2 iterations, queries vec_id < 5, k=5.
 */
object PqOracle {

  /** Integer squared L2 between two bigint-list columns over dims 1..n
    * (1-based inclusive DuckDB indexing). Exact — order-free. */
  private def d2(a: String, b: String, n: Int): String =
    s"list_sum(list_transform(range(1, ${n + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))::bigint"

  /** Shared prelude: quantized view, subspace view, seed codebook. */
  private val prelude =
    """v AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> cast(floor(x::double * 1048576.0) AS bigint)) AS vq
      |      FROM embeddings),
      |sv AS (SELECT vec_id, s AS sub_id, vq[s * 16 + 1 : s * 16 + 16] AS subv
      |       FROM v CROSS JOIN (SELECT unnest(range(0, 4)) AS s)),
      |c0 AS (SELECT sub_id, (rk - 1)::int AS cell_id, subv AS cellv FROM (
      |         SELECT sub_id, subv,
      |                row_number() OVER (PARTITION BY sub_id ORDER BY vec_id) AS rk
      |         FROM sv)
      |       WHERE rk <= 16)""".stripMargin

  /** One Lloyd assignment: nearest cell per (vec, sub) by integer squared
    * L2, cell_id tie-break. */
  private def assign(cents: String, out: String): String =
    s"""$out AS (SELECT vec_id, sub_id, subv, cell_id FROM (
       |  SELECT s.vec_id, s.sub_id, s.subv, c.cell_id,
       |         row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
       |           ${d2("s.subv", "c.cellv", 16)},
       |           c.cell_id) AS rn
       |  FROM sv s JOIN $cents c ON c.sub_id = s.sub_id) WHERE rn = 1)""".stripMargin

  /** One Lloyd update: per-dimension truncated integer-division means over
    * the 16 subspace dims. */
  private def update(from: String, out: String): String =
    s"""$out AS (
       |  SELECT sub_id, cell_id, list(cx ORDER BY dim) AS cellv FROM (
       |    SELECT sub_id, cell_id, d AS dim,
       |           sum(subv[d + 1])::bigint // count(*) AS cx
       |    FROM $from CROSS JOIN (SELECT unnest(range(0, 16)) AS d)
       |    GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2)""".stripMargin

  /** Trained codebook (c2) + final encoding (a2), shared by all three
    * rows. */
  private val trained =
    s"""$prelude,
       |${assign("c0", "a0")},
       |${update("a0", "c1")},
       |${assign("c1", "a1")},
       |${update("a1", "c2")},
       |${assign("c2", "a2")}""".stripMargin

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

  /** Exact-recall epilogue shared by the two recall rows: brute top-5 in
    * the quantized space, hit counts against `approxRel(query_id,
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
}
