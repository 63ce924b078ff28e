package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join: for each left row, attach the payload of the *latest* right row
 * with `right.time <= left.time` within the same key (inclusive; ties between
 * a left and right row at the same instant match). Spark has no native as-of
 * join, and the naive formulation (range join + per-key max) explodes into a
 * cartesian-per-key. This implementation is the scalable union-and-sweep:
 *
 *   1. union both sides tagged with a side flag (right=0, left=1),
 *   2. one hash-shuffle on the key, sort within partition by (time, side),
 *   3. running `last(payload, ignoreNulls)` over the sorted stream,
 *   4. keep the left rows.
 *
 * Cost: ONE shuffle of |L|+|R| rows, no join blow-up, no skew amplification
 * beyond the key's own skew — the shape that survives 100 TB. (DuckDB's
 * native ASOF JOIN is the oracle for this operator.)
 *
 * Determinism contract: (keys, rightTime) should uniquely identify right
 * rows; with duplicates the last-in-sort wins (same caveat as any as-of).
 */
object AsofJoin {

  def asofLast(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(right.columns.contains), "payload not in right")

    val l = rightPayload.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
    val r = rBase.select(
      (keys.map(col) :+ col("__t") :+ col("__side")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val u = l.select(r.columns.toIndexedSeq.map(col): _*).unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(u) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
