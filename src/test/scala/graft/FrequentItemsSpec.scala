package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/**
 * Misra-Gries frequent-items sketch: guarantee, merge path, and the two-pass
 * exact-heavy-hitters shape the `events_frequent_users` catalog query uses.
 */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: 2 heavy keys + a long uniform tail, shuffled
  // deterministically so partition contents are adversarial-ish
  private def skewed = {
    val rows =
      Seq.fill(500)("hot_a") ++ Seq.fill(300)("hot_b") ++
        (1 to 1000).map(i => s"rare_$i")
    rows.sortBy(s => s.hashCode).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("key", "row_id")
  }

  test("mg guarantee: every key with freq > n/(cap+1) survives eviction and merge") {
    val n = 1800
    val cap = 16
    // hot_a (500) and hot_b (300) are both > 1800/17 ≈ 106
    val got = skewed.repartition(8) // force partial buffers + serde + merge
      .agg(GraftFunctions.mg_candidates(col("key"), cap).as("cands"))
      .select(explode(col("cands")).as("key"))
      .as[String].collect().toSet
    assert(got.contains("hot_a") && got.contains("hot_b"))
    assert(got.size <= cap) // bounded state actually bounded
  }

  test("two-pass recount is exact and partition-invariant on skewed data") {
    val support = 10 // keep keys with freq >= n/10
    def twoPass(parts: Int): Set[(String, Long)] = {
      val df = skewed.repartition(parts)
      val cands = df
        .agg(count(lit(1)).as("total"),
          GraftFunctions.mg_candidates(col("key"), 32).as("cands"))
        .select(col("total"), explode(col("cands")).as("key"))
      df.join(broadcast(cands), Seq("key"))
        .groupBy(col("key"), col("total"))
        .agg(count(lit(1)).as("freq"))
        .filter(col("freq") * support >= col("total"))
        .select(col("key"), col("freq"))
        .as[(String, Long)].collect().toSet
    }
    val exact = skewed.groupBy(col("key")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 10 >= lit(1800L))
      .as[(String, Long)].collect().toSet
    assert(exact == Set(("hot_a", 500L), ("hot_b", 300L))) // fixture sanity
    assert(twoPass(1) == exact)   // single partition: pure update path
    assert(twoPass(13) == exact)  // many partitions: eviction + merge offsets
  }

  test("mg_candidates resolves from SQL via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSpark = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      extSpark.range(0, 100).selectExpr("CASE WHEN id < 60 THEN 'hot' ELSE concat('r', id) END AS k")
        .createOrReplaceTempView("mg_t")
      val cands = extSpark.sql("SELECT mg_candidates(k, 8) AS c FROM mg_t")
        .collect()(0).getSeq[String](0)
      assert(cands.contains("hot") && cands.size <= 8)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("nulls are ignored, empty input yields empty candidate array") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("key")
    val got = df.agg(GraftFunctions.mg_candidates(col("key"), 4).as("c"))
      .select(explode(col("c")).as("k")).as[String].collect().toSet
    assert(got == Set("a", "b"))
    val empty = df.filter(col("key").isNull && col("key").isNotNull)
      .agg(GraftFunctions.mg_candidates(col("key"), 4).as("c"))
      .select(size(col("c"))).as[Int].collect()(0)
    assert(empty == 0)
  }
}
