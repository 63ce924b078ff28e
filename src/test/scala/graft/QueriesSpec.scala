package graft

/** Smoke: every catalog query runs and returns rows on sf0.001, and every
  * query has matching column names with its oracle's SELECT list (full value
  * equivalence is checked by tools/compare.py + the driver's DuckDB gate). */
class QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.catalog.foreach { case (name, fn, _) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val missing = Queries.queries.keySet -- Queries.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("approx_distinct_users: the 3σ bounded-error contract holds") {
    val rows = Queries.queries("approx_distinct_users")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("within_bound") == 1,
        s"estimate out of the 3·rsd bound for ${r.getAs[String]("event_type")}" +
          s" (exact ${r.getAs[Long]("exact_users")})")
    }
  }
}
