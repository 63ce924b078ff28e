package graft

/**
 * SQL-frontend parity: every [[QueriesSql.battery]] entry, run as pure
 * `spark.sql(...)` text on a session WITHOUT build-time extensions (the
 * runtime `registerAll` path), must return row-for-row identical results to
 * its DataFrame twin — same schema column names, same values. The driver's
 * DuckDB gate holds both to the shared oracle; this spec pins the two
 * frontends to EACH OTHER so an oracle edit can't let them drift apart
 * unnoticed.
 */
class QueriesSqlSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  QueriesSql.battery.foreach { case (name, twin, views, sql) =>
    test(s"$name ≡ $twin (SQL text vs DataFrame API)") {
      val viaSql = QueriesSql.run(spark, sfDir, views, sql)
      val viaDf = Queries.queries(twin)(spark, sfDir)
      assert(viaSql.columns.sorted.toSeq == viaDf.columns.sorted.toSeq,
        s"column sets differ: ${viaSql.columns.toSeq} vs ${viaDf.columns.toSeq}")
      val (a, b) = (canon(viaSql), canon(viaDf))
      assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      if (firstDiff != -1)
        fail(s"first differing row #$firstDiff:\n  sql: ${a(firstDiff)}\n  df : ${b(firstDiff)}")
    }
  }
}
