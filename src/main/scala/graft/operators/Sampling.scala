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
}
