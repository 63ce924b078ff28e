package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the plain-join result under heavy skew") {
    // one hot key (90% of rows) + long tail
    val large = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("key", "row_id")
    val small = (Seq("hot") ++ (0 until 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 100) }.toDF("key", "dim_value")

    val plain = large.join(small, "key")
      .select("key", "row_id", "dim_value").collect().toSet
    val salted = Skew.saltedJoin(large, small, "key", col("row_id"), saltFactor = 8)
      .select("key", "row_id", "dim_value").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("saltedCount equals plain count per key") {
    val df = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("cold", i.toLong))).toDF("key", "row_id")
    val got = Skew.saltedCount(df, col("key"), col("row_id"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 500L, "cold" -> 50L))
  }
}
