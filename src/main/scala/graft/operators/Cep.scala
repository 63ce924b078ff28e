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
    require(windowSeconds > 0, "need a positive match window")
    require(steps.size >= 2, "need at least two pattern steps")
    require(gapNegations.size == steps.size - 1,
      s"need one negation predicate per gap: ${steps.size - 1}")
    val k = steps.size
    val prior = 0 until (k - 1)
    val e = events.select((Seq(keyCol.as("key"), tsCol.as("ts"),
      tieCol.as("tie")) ++
      steps.zipWithIndex.map { case (c, i) => c.as(s"is_$i") } ++
      gapNegations.zipWithIndex.map { case (c, j) => c.as(s"ng_$j") }): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCounters = prior.foldLeft(e) { (acc, j) =>
      acc.withColumn(s"n$j",
        sum(when(col(s"ng_$j"), 1L).otherwise(0L)).over(w))
    }
    // step i records gap-i's counter at its match (left end; every
    // tracked step i ≤ k-2 opens gap i) and, for i >= 1, gap-(i-1)'s
    // counter (right end)
    val tracked = prior.foldLeft(withCounters) { (acc, i) =>
      val withLeft = acc
        .withColumn(s"l${i}_ts",
          last(when(col(s"is_$i"), col("ts")), ignoreNulls = true).over(w))
        .withColumn(s"l${i}_n$i",
          last(when(col(s"is_$i"), col(s"n$i")), ignoreNulls = true).over(w))
      if (i >= 1) withLeft.withColumn(s"l${i}_n${i - 1}",
        last(when(col(s"is_$i"), col(s"n${i - 1}")), ignoreNulls = true).over(w))
      else withLeft
    }
    val tsSeq = prior.map(i => col(s"l${i}_ts")) :+ col("ts")
    val chain = prior.map(i => col(s"l${i}_ts").isNotNull).reduce(_ && _) &&
      tsSeq.zip(tsSeq.tail).map { case (a, b) => a < b }.reduce(_ && _)
    val gapsClean = (0 until k - 1).map { j =>
      val left = col(s"l${j}_n$j")
      val right = if (j + 1 == k - 1) col(s"n$j") else col(s"l${j + 1}_n$j")
      right === left
    }.reduce(_ && _)
    tracked.filter(col(s"is_${k - 1}") && chain &&
        unix_micros(col("ts")) - unix_micros(col("l0_ts"))
          <= windowSeconds * 1000000L && gapsClean)
      .select((Seq(col("key"), col("tie").as("close_id")) ++
        prior.map(i => col(s"l${i}_ts").as(s"ts_${i + 1}")) ++ Seq(
        col("ts").as(s"ts_$k"),
        expr("(unix_micros(ts) - unix_micros(l0_ts)) div 1000000")
          .as("gap_seconds"))): _*)
  }
}
