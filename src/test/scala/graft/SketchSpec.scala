package graft

import org.apache.spark.sql.functions._

/**
 * Probabilistic-sketch surface: the bloom membership filter (Spark's
 * internal BloomFilterAggregate/BloomFilterMightContain exposed to SQL via
 * GraftExtensions) and the count-min frequency sketch (public
 * DataFrameStatFunctions). Both are bounded against exact answers — the
 * sketch contract is one-sided error, which is what makes them usable as
 * scale primitives (join pre-filters, frequency triage) at 100 TB.
 */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def withExtSession[A](f: org.apache.spark.sql.SparkSession => A): A = {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      f(SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("bloom_agg/bloom_might_contain: no false negatives, bounded FPR") {
    withExtSession { ext =>
      ext.range(0, 10000).selectExpr("id * 2 AS x") // members: even ids
        .createOrReplaceTempView("bloom_in")
      ext.sql("SELECT bloom_agg(x, 10000L) AS bf FROM bloom_in")
        .createOrReplaceTempView("bloom_bf")
      // every member must hit (the one-sided guarantee)
      val misses = ext.sql(
        """SELECT count(*) FROM bloom_in
          |WHERE NOT bloom_might_contain((SELECT bf FROM bloom_bf), x)""".stripMargin)
        .head().getLong(0)
      assert(misses == 0L, "bloom filters must never produce false negatives")
      // non-members (odd ids) may hit, but rarely: default FPP is 3%,
      // assert a generous 3× bound so the test is not flaky-by-design
      val fp = ext.sql(
        """SELECT count(*) FROM (SELECT id * 2 + 1 AS y FROM range(10000))
          |WHERE bloom_might_contain((SELECT bf FROM bloom_bf), y)""".stripMargin)
        .head().getLong(0)
      assert(fp < 900, s"false-positive rate out of bounds: $fp / 10000")
    }
  }

  test("bloom pre-filter is a superset of the exact semi-join (join pruning)") {
    withExtSession { ext =>
      ext.range(0, 5000).selectExpr("id AS k", "id % 100 AS payload")
        .createOrReplaceTempView("facts")
      ext.range(0, 50).selectExpr("id * 7 AS k").createOrReplaceTempView("dim")
      ext.sql("SELECT bloom_agg(k, 50L) AS bf FROM dim")
        .createOrReplaceTempView("dim_bf")
      val exact = ext.sql(
        "SELECT count(*) FROM facts WHERE k IN (SELECT k FROM dim)")
        .head().getLong(0)
      val filtered = ext.sql(
        """SELECT count(*) FROM facts
          |WHERE bloom_might_contain((SELECT bf FROM dim_bf), k)""".stripMargin)
        .head().getLong(0)
      // sound (keeps every true match) and effective (prunes most of the rest)
      assert(filtered >= exact)
      assert(filtered < 1000, s"pre-filter kept $filtered of 5000 rows")
    }
  }

  test("countMinSketch: never underestimates; error bounded by eps·N") {
    // skewed stream: 'hot' 1000×, 200 singletons
    val rows = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"r$i")
    val df = rows.toDF("k").repartition(8)
    val eps = 0.01
    val cms = df.stat.countMinSketch("k", eps, 0.99, seed = 42)
    val n = rows.length
    assert(cms.estimateCount("hot") >= 1000L)
    assert(cms.estimateCount("hot") <= 1000L + (eps * n).toLong + 1)
    (1 to 20).foreach { i =>
      val est = cms.estimateCount(s"r$i")
      assert(est >= 1L && est <= 1L + (eps * n).toLong + 1)
    }
  }

  test("countMinSketch: mergeable across partitions (distributed build)") {
    val left = Seq.fill(300)("hot").toDF("k")
      .stat.countMinSketch("k", 0.01, 0.99, seed = 42)
    val right = Seq.fill(700)("hot").toDF("k")
      .stat.countMinSketch("k", 0.01, 0.99, seed = 42)
    val merged = left.mergeInPlace(right)
    assert(merged.estimateCount("hot") >= 1000L)
  }
}
