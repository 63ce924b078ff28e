package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions.col

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's A1 per-airline windowed delay stats over the synthesized
    * flight-event stream (JSON parse → derive → window → aggregate). */
  def entry(spark: SparkSession): DataFrame =
    operators.FlightOps.airlineStats(
      Queries.parsedFlights(spark, "/root/testdata/sf0.001"),
      col("scheduled_time"), "2 minutes")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
