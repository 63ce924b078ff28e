package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling/splitting for training-data pipelines. Everything
 * keys off [[TextOps.portableHash]] of a stable id — NOT `rand()` — so
 * assignments are reproducible across runs, engines (oracle-verifiable), and
 * cluster sizes, and a re-run after adding data never reshuffles existing
 * rows between splits (the property that keeps eval sets uncontaminated).
 *
 * Scale shape: [[hashSplit]] is a pure projection (no shuffle at all);
 * [[quotaPerGroup]] is one hash exchange on the group key + a per-group
 * top-k window.
 */
object Sampling {

  /**
   * Hash-split rows into named buckets, e.g. `Seq("train" -> 80, "val" -> 10,
   * "test" -> 10)` (percents must sum to 100). Adds a `split` column; every
   * row's assignment is a pure function of its key.
   */
  def hashSplit(df: DataFrame, keyCol: Column,
      fractions: Seq[(String, Int)]): DataFrame = {
    require(fractions.map(_._2).sum == 100, "split percents must sum to 100")
    val bucket = TextOps.portableHash(keyCol.cast("string")) % 100
    val cumulative = fractions.scanLeft(0)(_ + _._2).tail
    val split = fractions.zip(cumulative).init.foldRight(
      lit(fractions.last._1)) { case (((name, _), cum), acc) =>
      when(bucket < cum, lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /**
   * Leakage-safe train/val/test split: assign splits by the hash of each
   * document's NEAR-DUP COMPONENT, not its own id, so near-duplicates can
   * never straddle the train/test boundary — the contamination mode a
   * per-doc [[hashSplit]] cannot prevent (a test document's near-copy in
   * train is memorization leakage that survives exact dedup). Components
   * come from the standard capped LSH → exact-Jaccard-verify → min-label
   * chain (`Dedup.lshCandidates` / `ngramJaccard` / `connectedComponents`),
   * so the pair space is bounded and singleton docs (the vast majority)
   * flow through as their own component. Output: (doc_id, component,
   * split); split is a pure function of the component id, so re-runs after
   * adding data never reshuffle existing components between splits.
   */
  def leakageSafeSplit(docs: DataFrame, idCol: Column, textCol: Column,
      fractions: Seq[(String, Int)], tau: Double = 0.8): DataFrame = {
    val cands = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashSignatures(docs, textCol, idCol)))
    val dupPairs = Dedup.ngramJaccard(cands, docs, textCol, idCol)
      .filter(col("jaccard") >= tau).select(col("doc_a"), col("doc_b"))
    val comp = Dedup.connectedComponents(docs.select(idCol.as("id")), dupPairs)
    hashSplit(comp, col("component"), fractions)
      .select(col("id").as("doc_id"), col("component"), col("split"))
  }

  /**
   * Priority sampling (Duffield–Lund–Thorup, "Priority sampling for
   * estimation of arbitrary subset sums", JACM 2007): a weighted sample of
   * `k` rows WITHOUT replacement. Each row draws a deterministic uniform
   * `u` from the portable hash of its id and gets priority `u / w`; the k
   * smallest priorities win, so heavier rows win proportionally more often —
   * the "sample long/high-quality documents preferentially" primitive.
   *
   * Two deliberate choices:
   *  - Priorities, not exponential clocks: the textbook weighted-sample key
   *    is `-ln(u)/w`, but `ln` is not correctly-rounded-identical across
   *    engines, which would break exact oracle verification. Priority
   *    sampling needs ONE division of two exactly-representable doubles
   *    (`u` is capped at 2^50 so it is exact), and IEEE division IS
   *    correctly rounded — bit-identical in Spark and DuckDB.
   *  - `orderBy(...).limit(k)` plans as TakeOrderedAndProject: each
   *    partition keeps a k-heap and the driver merges partitions' heaps —
   *    O(k) memory per partition, no global sort exchange. The scale shape
   *    for "pick 10k docs from 10B".
   *
   * Determinism: priority is a pure function of (id, weight), ties broken by
   * id — same sample on every run, partition count, and engine.
   */
  def prioritySample(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    // u in [1, 2^50]: exact in double, never zero (priority stays finite)
    val u = pmod(TextOps.portableHash(idCol.cast("string")),
      lit(1125899906842624L)) + lit(1L)
    df.withColumn("priority", u.cast("double") / weightCol.cast("double"))
      .orderBy(col("priority"), idCol)
      .limit(k)
  }

  /**
   * Weighted sample without replacement PER GROUP: [[prioritySample]]'s
   * priority key (u/w from the portable hash — one IEEE division,
   * bit-identical cross-engine) ranked inside each group, keeping the k
   * smallest. The balanced-and-weighted corpus-construction primitive:
   * "per language, sample documents proportional to length". One hash
   * exchange on the group key + a per-group top-k window — same shape as
   * [[quotaPerGroup]], weighted.
   */
  def priorityPerGroup(df: DataFrame, groupCols: Seq[Column], idCol: Column,
      weightCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = pmod(TextOps.portableHash(idCol.cast("string")),
      lit(1125899906842624L)) + lit(1L)
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(u.cast("double") / weightCol.cast("double"), idCol)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("sample_rank")
  }

  /**
   * Stratified quota sample: at most `k` rows per group, selected in
   * portable-hash order of the id (a deterministic uniform draw) with the id
   * itself as tie-break. The classic "cap boilerplate domains" /
   * "balance classes" primitive.
   */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[Column], idCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(TextOps.portableHash(idCol.cast("string")), idCol)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("sample_rank")
  }

  /**
   * Per-source corpus balancing: resample to TARGET PROPORTIONS — the
   * domain-mix step every web-corpus recipe runs ("30% curated, 70% crawl",
   * per-domain caps). Given target weights per source and a total budget,
   * each listed source's quota is floor(budget · w / Σw) — exact integer
   * arithmetic, computed at plan time — and its documents are drawn in
   * portable-hash order of the id (deterministic uniform draw, id
   * tie-break). A source with fewer documents than its quota contributes
   * what it has; sources absent from the mix are dropped (quota 0).
   *
   * Scale shape: identical to [[quotaPerGroup]] — one hash exchange on the
   * source key + a per-group rank window. Per-source row counts are the
   * corpus's own source distribution; a pathologically hot source is
   * exactly what the quota caps, and the window's per-task work is bounded
   * by that source's pre-cap rows in the partition (rank windows stream —
   * no per-key buffering beyond the sort).
   */
  def sourceMix(df: DataFrame, sourceCol: Column, idCol: Column,
      mix: Seq[(String, Long)], budget: Long): DataFrame = {
    require(mix.nonEmpty && mix.forall(_._2 > 0), "mix weights must be positive")
    val total = mix.map(_._2).sum
    val quota = mix.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(sourceCol === s, lit(budget * w / total)).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    val wnd = Window.partitionBy(sourceCol)
      .orderBy(TextOps.portableHash(idCol.cast("string")), idCol)
    df.withColumn("mix_quota", quota)
      .withColumn("sample_rank", row_number().over(wnd))
      .filter(col("sample_rank") <= col("mix_quota"))
      .drop("mix_quota", "sample_rank")
  }

  /**
   * TOKEN-budgeted sampling per group: training mixes are specified in
   * tokens ("1B tokens of code, 500M of forums"), not documents, so the cap
   * must bind on the running token sum, not a row count. Documents are drawn
   * in portable-hash order of the id (deterministic uniform draw, id
   * tie-break) and kept while the inclusive running sum of `tokenCol` stays
   * within `budget` — the greedy prefix rule, so a long document that would
   * cross the budget is dropped along with everything after it (exactly
   * reproducible; no "partial document" ambiguity). `cum_tokens` stays on
   * the output: it is the audit trail ("how full is this source's budget")
   * a mix designer reads.
   *
   * Scale shape: one hash exchange on the group key + a running-sum window
   * in hash order — rank windows stream, so per-task memory is the sort
   * buffer, not the group. The group count is the source/domain count
   * (thousands), each group's budget caps its useful prefix, and the
   * filter drops the tail before anything downstream shuffles again.
   */
  def tokenBudgetPerGroup(df: DataFrame, groupCols: Seq[Column], idCol: Column,
      tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(TextOps.portableHash(idCol.cast("string")), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null token counts coalesce to 0: the document is kept and consumes no
    // budget — one deterministic treatment regardless of where the null
    // lands in the hash order (a head-of-group null would otherwise null
    // the whole running sum and drop the row, while a mid-group null
    // inherited the prior cum and was kept)
    df.withColumn("cum_tokens",
        sum(coalesce(tokenCol.cast("long"), lit(0L))).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /**
   * GLOBAL token-budget source mixing — the form real training mixes are
   * specified in: one total token budget ("2T tokens") split across sources
   * by target weights ("code 3 : forums 1"), each source then filled by the
   * greedy-prefix token rule. Composition of [[sourceMix]]'s plan-time
   * quota arithmetic with [[tokenBudgetPerGroup]]'s running-sum cap:
   * source s's token quota is floor(totalBudget · w_s / Σw) — exact integer
   * arithmetic folded to a literal per source at plan time — and its
   * documents are drawn in portable-hash order of the id while the
   * inclusive running token sum stays within that quota. Sources absent
   * from the mix get quota 0 (dropped). Null token counts consume no budget
   * ([[tokenBudgetPerGroup]]'s contract). `mix_token_quota` and
   * `cum_tokens` stay on the output — the audit trail a mix designer reads
   * ("how full is each source's allocation").
   *
   * Scale shape: identical to [[tokenBudgetPerGroup]] — ONE hash exchange
   * on the source key + a streaming running-sum window; the quota CASE is a
   * zero-cost literal projection, so specifying the mix globally costs
   * nothing over the per-group form.
   */
  /**
   * Percentile-band gate per group — "keep documents between the p10 and
   * p90 of their source's length distribution", the outlier-trimming
   * curation gate (too-short = fragments, too-long = concatenation junk),
   * generalized to any numeric column. A row is kept when its exact
   * `percent_rank` within the group — (min-rank − 1)/(n − 1), ties share a
   * rank, single-row groups rank 0 — lies in [lo, hi]. The rank is an
   * exact integer ratio, so the double it lands in is identical in every
   * engine (correctly-rounded integer division — no transcendental hazard).
   *
   * Scale shape — the skew discipline: a direct `percent_rank() OVER
   * (PARTITION BY group ORDER BY value)` sorts each ENTIRE group in one
   * task (a billion-doc source = one straggler). Instead the rank comes
   * from the group's value HISTOGRAM: aggregate (group, value) counts
   * (map-side-combinable — the exchange carries distinct values, not
   * documents), run the running-sum window over histogram rows (bounded by
   * distinct values per group), and equi-join the rank back. Documents
   * never sort; the window input is the histogram.
   */
  def percentileGate(df: DataFrame, groupCol: Column, idCol: Column,
      valueCol: Column, lo: Double, hi: Double): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, "need 0 <= lo <= hi <= 1")
    val base = df.select(idCol.as("doc_id"), groupCol.as("grp"),
      valueCol.cast("long").as("gate_value"))
    base.join(rankHistogram(base), Seq("grp", "gate_value"))
      .filter(col("pct_rank") >= lo && col("pct_rank") <= hi)
      .select(col("doc_id"), col("grp"), col("gate_value"), col("pct_rank"))
  }

  /** Per-(group, value) exact percent_rank from the value histogram — the
    * shared core of [[percentileGate]] and [[percentileThresholds]].
    * Input needs `grp` and `gate_value` columns. */
  private def rankHistogram(base: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col("grp")).orderBy(col("gate_value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("grp"))
    base.groupBy(col("grp"), col("gate_value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byVal))
      .withColumn("n_total", sum(col("cnt")).over(whole))
      .withColumn("pct_rank",
        when(col("n_total") === 1, lit(0.0))
          .otherwise((col("cum") - col("cnt")).cast("double") /
            (col("n_total") - 1).cast("double")))
      .select(col("grp"), col("gate_value"), col("pct_rank"))
  }

  /**
   * The percentile band as a per-group VALUE-THRESHOLD artifact —
   * `[v_lo, v_hi]` = the smallest value at-or-above rank `lo` and the
   * largest at-or-below `hi`. Because percent_rank is monotone in the value
   * and ties share a rank, `value BETWEEN v_lo AND v_hi` admits EXACTLY the
   * rows [[percentileGate]] keeps — but as a tiny static table (one row per
   * group) a STREAMING gate broadcast-joins against arriving documents, the
   * operational train-then-serve shape (thresholds freeze at training time;
   * re-derive on drift). A group whose histogram leaves the band empty
   * yields null thresholds — `between` is then never true, matching the
   * batch gate dropping every row.
   */
  def percentileThresholds(df: DataFrame, groupCol: Column, valueCol: Column,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, "need 0 <= lo <= hi <= 1")
    val base = df.select(groupCol.as("grp"), valueCol.cast("long").as("gate_value"))
    rankHistogram(base)
      .groupBy(col("grp"))
      .agg(min(when(col("pct_rank") >= lo, col("gate_value"))).as("v_lo"),
        max(when(col("pct_rank") <= hi, col("gate_value"))).as("v_hi"))
  }

  def tokenMix(df: DataFrame, sourceCol: Column, idCol: Column,
      tokenCol: Column, mix: Seq[(String, Long)], totalBudget: Long): DataFrame = {
    require(mix.nonEmpty && mix.forall(_._2 > 0), "mix weights must be positive")
    require(totalBudget > 0, "token budget must be positive")
    val total = mix.map(_._2).sum
    val quota = mix.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(sourceCol === s, lit(totalBudget * w / total)).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sourceCol)
      .orderBy(TextOps.portableHash(idCol.cast("string")), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("mix_token_quota", quota)
      .withColumn("cum_tokens",
        sum(coalesce(tokenCol.cast("long"), lit(0L))).over(w))
      .filter(col("cum_tokens") <= col("mix_token_quota"))
  }
}
