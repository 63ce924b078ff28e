package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling for pipeline ingest gates: per-column null counts
 * and distinct cardinalities in long format (one row per column), computed
 * in a single pass over the data (one aggregation, no per-column scans).
 * The numeric/temporal extrema are exposed for the caller's chosen columns.
 *
 * At 100 TB: `exact = false` (default) uses HLL distinct counts — one
 * aggregation whose state is 16 KB per column rather than a distinct-shuffle
 * per column; `exact = true` keeps exact distincts for test-scale gates.
 * Passing `percentiles` adds a bounded-error quantile sketch per numeric
 * column (see [[approxPercentiles]] for the error contract) in the same
 * single aggregation pass.
 */
object Profile {

  def columnProfile(df: DataFrame, exact: Boolean = true,
      percentiles: Seq[Double] = Nil, accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    def distinctCount(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val numeric = df.schema.fields
      .collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSet
    val pctArray = array(percentiles.map(lit): _*)
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        distinctCount(c).as(s"__distinct_$c")) ++
        (if (percentiles.nonEmpty && numeric(c))
          Seq(percentile_approx(col(c).cast("double"), pctArray, lit(accuracy))
            .as(s"__pcts_$c"))
        else Nil)
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val perCol = df.columns.map { c =>
      val base = Seq(lit(c).as("column_name"), col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"), col("__n").as("n_rows"))
      val pcts =
        if (percentiles.isEmpty) Nil
        else if (numeric(c)) Seq(col(s"__pcts_$c").as("approx_percentiles"))
        else Seq(lit(null).cast("array<double>").as("approx_percentiles"))
      struct((base ++ pcts): _*)
    }
    // approx_percentiles is opt-in so the zero-percentile profile keeps its
    // historical schema (the events_profile oracle pins it)
    val projected =
      Seq(col("p.column_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct")) ++
        (if (percentiles.isEmpty) Nil else Seq(col("p.approx_percentiles")))
    total.select(explode(array(perCol.toIndexedSeq: _*)).as("p"))
      .select(projected: _*)
      // when() guard: ANSI mode throws DIVIDE_BY_ZERO even for doubles, and
      // an EMPTY table is legal profiler input (n_rows = 0 → ratio NULL)
      .withColumn("null_ratio",
        when(col("n_rows") > 0,
          col("n_nulls").cast("double") / col("n_rows")))
  }

  /**
   * Grouped bounded-error percentile sketch — the 100 TB path for quantiles.
   * One hash aggregation on `keys`; per-group state is the GK/KLL-style
   * summary `percentile_approx` maintains, O(accuracy) not O(rows), with
   * map-side partial merge (the exact window formulation in
   * `events_value_percentiles` sorts every partition — right for an oracle,
   * wrong at scale).
   *
   * Error contract (Spark's `percentile_approx`): the returned value is a
   * REAL element of the column whose rank is within `n/accuracy` of the
   * requested rank. The bound is on rank, not value — the spec checks it by
   * rank-distance against the exactly-ranked oracle.
   */
  def approxPercentiles(df: DataFrame, valueCol: Column, keys: Seq[Column],
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keys: _*)
      .agg(percentile_approx(valueCol, array(percentiles.map(lit): _*),
        lit(accuracy)).as("approx_values"))
      .select((keys :+ posexplode(col("approx_values"))): _*)
      .select((keys :+ col("pos") :+ col("col").as("approx_value")): _*)
      .withColumn("pct", element_at(
        array(percentiles.map(lit): _*), col("pos") + 1))
      .drop("pos")
}
