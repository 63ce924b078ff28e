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
      negation: Column, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "need a positive match window")
    val e = events.select(keyCol.as("key"), tsCol.as("ts"), tieCol.as("tie"),
      stepA.as("is_a"), stepB.as("is_b"), stepC.as("is_c"),
      negation.as("is_n"))
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("n_upto", sum(when(col("is_n"), 1L).otherwise(0L)).over(w))
      .withColumn("la_ts", last(when(col("is_a"), col("ts")), ignoreNulls = true).over(w))
      .withColumn("la_n", last(when(col("is_a"), col("n_upto")), ignoreNulls = true).over(w))
      .withColumn("lb_ts", last(when(col("is_b"), col("ts")), ignoreNulls = true).over(w))
      // exact MICROSECOND arithmetic: a long cast of a timestamp floors the
      // fractional second while other engines' epoch() rounds — integer
      // micros are the only representation both sides agree on bit-for-bit
      .filter(col("is_c") &&
        col("la_ts").isNotNull && col("lb_ts").isNotNull &&
        col("la_ts") < col("lb_ts") && col("lb_ts") < col("ts") &&
        unix_micros(col("ts")) - unix_micros(col("la_ts"))
          <= windowSeconds * 1000000L &&
        col("n_upto") === col("la_n"))
      .select(col("key"), col("tie").as("close_id"),
        col("la_ts").as("a_ts"), col("lb_ts").as("b_ts"), col("ts").as("c_ts"),
        expr("(unix_micros(ts) - unix_micros(la_ts)) div 1000000")
          .as("gap_seconds"))
  }
}
