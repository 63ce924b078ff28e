package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Complex event processing: sequence-pattern detection over keyed event
 * streams — the MATCH_RECOGNIZE / FlinkCEP capability expressed as running
 * window state instead of an NFA. Reference point: the reference's Flink
 * ecosystem ships CEP as a headline library; this is the batch/SQL-window
 * re-expression of its most-used shape (ordered steps + a NOT pattern +
 * a time bound).
 *
 * The encoding trick: per key, in (ts, tie) order, track the LAST row
 * matching each step with `last(..., ignoreNulls)` running windows, plus a
 * running count of negation rows. A closing row then decides the whole
 * match from ITS OWN window values — no joins, no per-match backtracking,
 * one shuffle on the key total. That is the 100 TB shape: an NFA engine
 * holds per-key partial-match state; this holds three scalars per row and
 * lets the window machinery (spillable, codegen'd) do the work.
 */
object Cep {

  /**
   * Last-match sequence detection `A → B → C` with negation `N` and a time
   * window, per key: a row satisfying `stepC` CLOSES a match iff
   *
   *  - the latest `stepA` row and latest `stepB` row both precede it, with
   *    the A row strictly before the B row (strict `ts` inequalities — rows
   *    sharing a timestamp do not chain);
   *  - `c.ts − a.ts ≤ windowSeconds`;
   *  - NO `negation` row falls after that A row up to the closing row.
   *
   * "Latest A / latest B" is the skip-till-last (greedy) CEP variant —
   * every closing row reports exactly one match, so the result is a
   * deterministic function of the input (no after-match-skip policy
   * needed). Step/negation predicates are expected to be mutually
   * exclusive on any one row.
   *
   * Determinism: row order is (ts, tieCol) — pass a unique tie column.
   * Output: (key, close_id, a_ts, b_ts, c_ts, gap_seconds).
   */
  def lastSeqMatch(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, stepA: Column, stepB: Column, stepC: Column,
      negation: Column, windowSeconds: Long): DataFrame =
    lastSeqMatchN(events, keyCol, tsCol, tieCol, Seq(stepA, stepB, stepC),
        negation, windowSeconds)
      .withColumnRenamed("ts_1", "a_ts")
      .withColumnRenamed("ts_2", "b_ts")
      .withColumnRenamed("ts_3", "c_ts")

  /**
   * N-step generalization (the FlinkCEP / MATCH_RECOGNIZE pattern surface):
   * ordered step predicates `steps(0) → … → steps(K-1)`, skip-till-last.
   * A row satisfying the FINAL step closes a match iff the latest matches
   * of steps 0..K-2 have strictly increasing timestamps, all precede it,
   * the close is within `windowSeconds` of the step-0 match, and no
   * `negation` row falls after that step-0 match up to the close — the
   * same global-negation contract as the 3-step form (K = 3 reproduces it
   * plan-for-plan: one key shuffle, K last-match running windows + one
   * negation counter in ONE Window operator, no NFA, no join).
   *
   * Output: (key, close_id, ts_1 … ts_K, gap_seconds) where ts_i is the
   * matched step-i row's timestamp (ts_K = the closing row's own).
   */
  def lastSeqMatchN(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, steps: Seq[Column], negation: Column,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "need a positive match window")
    require(steps.size >= 2, "need at least two pattern steps")
    val k = steps.size
    val prior = 0 until (k - 1)       // steps tracked by running last-match
    val e = events.select((Seq(keyCol.as("key"), tsCol.as("ts"),
      tieCol.as("tie")) ++
      steps.zipWithIndex.map { case (c, i) => c.as(s"is_$i") } :+
      negation.as("is_n")): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tracked = prior.foldLeft(
        e.withColumn("n_upto", sum(when(col("is_n"), 1L).otherwise(0L)).over(w))) {
      (acc, i) =>
        val withTs = acc.withColumn(s"l${i}_ts",
          last(when(col(s"is_$i"), col("ts")), ignoreNulls = true).over(w))
        // the negation counter is only needed at the FIRST step's match
        if (i == 0) withTs.withColumn("l0_n",
          last(when(col("is_0"), col("n_upto")), ignoreNulls = true).over(w))
        else withTs
    }
    val tsSeq = prior.map(i => col(s"l${i}_ts")) :+ col("ts")
    val chain = prior.map(i => col(s"l${i}_ts").isNotNull).reduce(_ && _) &&
      tsSeq.zip(tsSeq.tail).map { case (a, b) => a < b }.reduce(_ && _)
    // exact MICROSECOND arithmetic: a long cast of a timestamp floors the
    // fractional second while other engines' epoch() rounds — integer
    // micros are the only representation both sides agree on bit-for-bit
    tracked.filter(col(s"is_${k - 1}") && chain &&
        unix_micros(col("ts")) - unix_micros(col("l0_ts"))
          <= windowSeconds * 1000000L &&
        col("n_upto") === col("l0_n"))
      .select((Seq(col("key"), col("tie").as("close_id")) ++
        prior.map(i => col(s"l${i}_ts").as(s"ts_${i + 1}")) ++ Seq(
        col("ts").as(s"ts_$k"),
        expr("(unix_micros(ts) - unix_micros(l0_ts)) div 1000000")
          .as("gap_seconds"))): _*)
  }

  /**
   * Per-GAP negation (the full MATCH_RECOGNIZE "NOT between specific
   * steps" shape): `gapNegations(j)` must not occur between the matched
   * step-j row and the matched step-(j+1) row (the last gap ends at the
   * closing row). [[lastSeqMatchN]]'s global negation is the special case
   * where every gap carries the same predicate — for ONE predicate the two
   * forms are provably identical (the gaps tile [t_0, close], so the
   * per-gap zero-count conjunction collapses to the global zero count);
   * distinct per-gap predicates are what this surface adds.
   *
   * Encoding: one running counter per gap predicate; each tracked step
   * records the counter values of its ADJACENT gaps at its last match
   * (left end of gap i, right end of gap i−1) — still O(K) window columns,
   * one key shuffle, no NFA. A gap-j negation row landing between the
   * matched endpoints makes `right − left ≠ 0` and blocks the close.
   * Steps must be mutually exclusive per row; gap negations may overlap
   * anything (a row can be both a step and another gap's negation — both
   * effects apply, deterministically).
   *
   * Output: (key, close_id, ts_1 … ts_K, gap_seconds).
   */
  def lastSeqMatchGaps(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, steps: Seq[Column], gapNegations: Seq[Column],
      windowSeconds: Long): DataFrame = {
    require(gapNegations.size == steps.size - 1,
      s"need one negation predicate per gap: ${steps.size - 1}")
    // negation is the (min=0, max=0) occurrence bound — the Kleene core's
    // degenerate case; drop the count columns to keep this surface's
    // original output schema
    lastSeqMatchKleene(events, keyCol, tsCol, tieCol, steps,
        gapNegations.map(p => Seq(GapBound(p, 0L, Some(0L)))), windowSeconds)
      .drop((0 until steps.size - 1).map(j => s"n_${j}_0"): _*)
  }

  /**
   * ALL-MATCHES sequence detection — the `AFTER MATCH SKIP TO NEXT ROW`
   * after-match policy ([[lastSeqMatchN]] pins skip-till-last): a closing
   * row reports EVERY step-0 anchor that completes a match, not just the
   * latest — up to `maxSpans` most-recent anchors per close, the bounded
   * enumeration a production engine ships (MATCH_RECOGNIZE row-pattern
   * engines bound overlapping-match fan-out the same way).
   *
   * Semantics per closing row (a row satisfying the FINAL step): the
   * INTERMEDIATE steps 1..K-2 stay skip-till-last — their latest matches
   * must chain strictly ascending below the close, shared by every
   * reported span (varying them too would be the exponential all-
   * combinations policy no engine enumerates unbounded). The anchor set
   * is the `maxSpans` most-recent step-0 rows within `windowSeconds` of
   * the close — capped by RECENCY BEFORE validity filtering, so the cap
   * is a deterministic function of the input, oracle-replayable — and an
   * anchor reports a span iff it precedes the first intermediate match
   * (strict ts), lies within the window, and no `negation` row falls
   * after it up to the close (the global-negation contract, per anchor).
   *
   * Encoding: the [[lastSeqMatchN]] counter/last-match machinery, plus
   * ONE running `collect_list` of anchor snapshots (ts, tie, negation
   * count) over a RANGE frame bounded by `windowSeconds` — anchors older
   * than the window can never match, so the collected state is bounded
   * by (arrival rate × window), the standard streaming-retention bound,
   * NOT the key's history; `maxSpans` caps what survives into the
   * explode. Still ONE key shuffle, no NFA, no self-join; the close
   * explodes its capped anchor array (≤ maxSpans rows out per close).
   *
   * SHARP EDGE (r16 verdict note): the range frame BUILDS the anchor
   * array on EVERY row of a key inside the window — the `maxSpans` cap
   * applies at the close-row slice, not at the collect — so the per-row
   * transient is the full retention-horizon anchor count (arrival rate ×
   * `windowSeconds`). Acceptable for batch replay over bounded windows;
   * production unbounded streams with adversarial arrival rates should
   * use the streaming twin ([[graft.streaming.StatefulOps.cepStreamAll]]),
   * which holds only the capped ≤ `maxSpans` anchor snapshots in state.
   *
   * `span_rank` numbers the emitted spans by anchor recency within the
   * CAPPED anchor set (1 = most recent capped anchor, valid or not —
   * computed from the slice position, no second shuffle); gaps in the
   * sequence mean nearer anchors failed validity. Every [[lastSeqMatchN]]
   * match appears here with its same chain (skip-till-last ⊆
   * all-matches — property-pinned); the converse fails exactly when the
   * latest anchor is negation-poisoned but an earlier one is clean.
   *
   * Output: (key, close_id, ts_1 … ts_K, gap_seconds, span_rank).
   */
  def allSeqMatches(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, steps: Seq[Column], negation: Column,
      windowSeconds: Long, maxSpans: Int = 16): DataFrame = {
    require(windowSeconds > 0, "need a positive match window")
    require(steps.size >= 2, "need at least two pattern steps")
    require(maxSpans >= 1, "need a positive span cap")
    val k = steps.size
    val mids = 1 until (k - 1)        // intermediate steps, skip-till-last
    val e = events.select((Seq(keyCol.as("key"), tsCol.as("ts"),
      tieCol.as("tie")) ++
      steps.zipWithIndex.map { case (c, i) => c.as(s"is_$i") } :+
      negation.as("is_n")): _*)
      .withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // anchors collect over a TIME-bounded range frame: out-of-window
    // anchors are invalid by construction, so the running array carries
    // only the retention horizon
    val wr = Window.partitionBy(col("key")).orderBy(col("us"))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    val withAnchors = mids.foldLeft(
        e.withColumn("n_upto", sum(when(col("is_n"), 1L).otherwise(0L)).over(w))
          .withColumn("aws_all", collect_list(when(col("is_0"),
            struct(col("ts").as("a_ts"), col("us").as("a_us"),
              col("tie").as("a_tie"), col("n_upto").as("a_n")))).over(wr))) {
      (acc, i) =>
        acc.withColumn(s"l${i}_ts",
          last(when(col(s"is_$i"), col("ts")), ignoreNulls = true).over(w))
    }
    val midTs = mids.map(i => col(s"l${i}_ts")) :+ col("ts")
    val midChain =
      if (mids.isEmpty) lit(true)
      else mids.map(i => col(s"l${i}_ts").isNotNull).reduce(_ && _) &&
        midTs.zip(midTs.tail).map { case (a, b) => a < b }.reduce(_ && _)
    val firstAfterAnchor = if (mids.isEmpty) col("ts") else col("l1_ts")
    // the range frame orders by `us` alone, so same-microsecond anchors
    // collect in nondeterministic relative order — array_sort (struct
    // lexicographic: a_ts, a_us, a_tie) restores the (ts, tie) total
    // order BEFORE the recency cap; sort + slice run on CLOSE rows only
    withAnchors.filter(col(s"is_${k - 1}") && midChain)
      .withColumn("aws", slice(array_sort(col("aws_all")),
        greatest(size(col("aws_all")) - maxSpans + 1, lit(1)),
        lit(maxSpans)))
      .select((Seq(col("key"), col("ts"), col("us"), col("tie"),
        col("n_upto"), col("aws"), size(col("aws")).as("n_aws")) ++
        mids.map(i => col(s"l${i}_ts"))): _*)
      .select(col("*"), posexplode(col("aws")).as(Seq("a_pos", "a")))
      .filter(col("a.a_ts") < firstAfterAnchor &&
        col("us") - col("a.a_us") <= windowSeconds * 1000000L &&
        col("n_upto") === col("a.a_n"))
      .select((Seq(col("key"), col("tie").as("close_id"),
        col("a.a_ts").as("ts_1")) ++
        mids.map(i => col(s"l${i}_ts").as(s"ts_${i + 1}")) ++ Seq(
        col("ts").as(s"ts_$k"),
        expr("(us - a.a_us) div 1000000").as("gap_seconds"),
        (col("n_aws") - col("a_pos")).cast("int").as("span_rank"))): _*)
  }

  /** One occurrence constraint on a pattern gap: rows satisfying `pred`
    * strictly after the matched left step up to and including the matched
    * right step (the closing row for the final gap), in (ts, tie) order,
    * must number in [minCount, maxCount] (maxCount None = unbounded). */
  final case class GapBound(pred: Column, minCount: Long,
      maxCount: Option[Long] = None) {
    require(minCount >= 0, s"minCount must be >= 0, got $minCount")
    maxCount.foreach(m => require(m >= minCount,
      s"maxCount $m must be >= minCount $minCount"))
  }

  /**
   * Kleene-quantified CEP — the MATCH_RECOGNIZE `A B+ C` / `A B{n,m} C`
   * quantifier surface: ordered step predicates as in [[lastSeqMatchN]],
   * plus per-gap OCCURRENCE BOUNDS — `gapBounds(j)` is the (possibly
   * empty) list of constraints on gap j, each requiring the count of its
   * `pred` rows between the matched step-j row (exclusive) and the matched
   * step-(j+1) row (inclusive; the closing row for the final gap) to fall
   * in [minCount, maxCount]. "view, then ≥3 clicks and no error, then
   * purchase" is steps (view, purchase) with gap 0 bounds
   * [(click, 3, ∞), (error, 0, 0)] — the B+ body never becomes a step, so
   * there is no per-repetition state. [[lastSeqMatchGaps]] is the
   * all-(0,0) special case.
   *
   * Encoding: the [[lastSeqMatchGaps]] counter machinery verbatim — ONE
   * running counter per constraint, each tracked step snapshotting its
   * adjacent gaps' counters at its last match — so the plan stays one key
   * shuffle and one Window operator, shape independent of both K and the
   * constraint count, no NFA. Counter intervals are half-open
   * (t_left, t_right] in (ts, tie) order: an endpoint row counts per its
   * own predicate (steps and gap predicates may overlap; steps must be
   * mutually exclusive with each other per row).
   *
   * Output: (key, close_id, ts_1 … ts_K, gap_seconds, n_j_c …) where
   * n_j_c is the matched count of gap j's constraint c — exposed so
   * callers can grade quantifier intensity (how many B's), not just
   * pass/fail.
   */
  def lastSeqMatchKleene(events: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, steps: Seq[Column], gapBounds: Seq[Seq[GapBound]],
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "need a positive match window")
    require(steps.size >= 2, "need at least two pattern steps")
    require(gapBounds.size == steps.size - 1,
      s"need one (possibly empty) bound list per gap: ${steps.size - 1}")
    val k = steps.size
    val prior = 0 until (k - 1)
    // flatten (gap, constraint) to global counter ids m = 0..C-1
    val flat: Seq[(Int, Int, GapBound)] = gapBounds.zipWithIndex.flatMap {
      case (bs, j) => bs.zipWithIndex.map { case (b, c) => (j, c, b) }
    }
    val e = events.select((Seq(keyCol.as("key"), tsCol.as("ts"),
      tieCol.as("tie")) ++
      steps.zipWithIndex.map { case (c, i) => c.as(s"is_$i") } ++
      flat.zipWithIndex.map { case ((_, _, b), m) => b.pred.as(s"gp_$m") }): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCounters = flat.indices.foldLeft(e) { (acc, m) =>
      acc.withColumn(s"n$m",
        sum(when(col(s"gp_$m"), 1L).otherwise(0L)).over(w))
    }
    // step i snapshots the counters of its ADJACENT gaps at its last
    // match: left ends of gap i's constraints (every tracked step i ≤ k-2
    // opens gap i), right ends of gap i-1's (for i >= 1)
    val tracked = prior.foldLeft(withCounters) { (acc, i) =>
      val withTs = acc.withColumn(s"l${i}_ts",
        last(when(col(s"is_$i"), col("ts")), ignoreNulls = true).over(w))
      flat.zipWithIndex.foldLeft(withTs) { case (a2, ((j, _, _), m)) =>
        if (j == i || j == i - 1)
          a2.withColumn(s"l${i}_n$m",
            last(when(col(s"is_$i"), col(s"n$m")), ignoreNulls = true).over(w))
        else a2
      }
    }
    val tsSeq = prior.map(i => col(s"l${i}_ts")) :+ col("ts")
    val chain = prior.map(i => col(s"l${i}_ts").isNotNull).reduce(_ && _) &&
      tsSeq.zip(tsSeq.tail).map { case (a, b) => a < b }.reduce(_ && _)
    def gapCount(j: Int, m: Int): Column = {
      val left = col(s"l${j}_n$m")
      val right = if (j + 1 == k - 1) col(s"n$m") else col(s"l${j + 1}_n$m")
      right - left
    }
    val boundsOk = flat.zipWithIndex.map { case ((j, _, b), m) =>
      val cnt = gapCount(j, m)
      b.maxCount.fold(cnt >= b.minCount)(mx =>
        cnt >= b.minCount && cnt <= mx)
    }.reduceOption(_ && _).getOrElse(lit(true))
    tracked.filter(col(s"is_${k - 1}") && chain &&
        unix_micros(col("ts")) - unix_micros(col("l0_ts"))
          <= windowSeconds * 1000000L && boundsOk)
      .select((Seq(col("key"), col("tie").as("close_id")) ++
        prior.map(i => col(s"l${i}_ts").as(s"ts_${i + 1}")) ++ Seq(
        col("ts").as(s"ts_$k"),
        expr("(unix_micros(ts) - unix_micros(l0_ts)) div 1000000")
          .as("gap_seconds")) ++
        flat.zipWithIndex.map { case ((j, c, _), m) =>
          gapCount(j, m).as(s"n_${j}_$c") }): _*)
  }
}
