package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: pre-shuffling both sides into the
  * same bucket layout removes the Exchange from the join entirely — at
  * 100 TB the difference between re-shuffling 100 TB per join and none. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // (uses the default spark-warehouse dir — static conf, gitignored)
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    new scala.reflect.io.Directory(new java.io.File("spark-warehouse/li_b")).deleteRecursively()
    new scala.reflect.io.Directory(new java.io.File("spark-warehouse/ord_b")).deleteRecursively()
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // at this fixture size Catalyst would (rightly) broadcast instead;
    // disable it so the test exercises the big-big bucketed join shape
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))

    // and it computes the right thing (execute first — under AQE the final
    // plan only materializes after execution)
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // the join itself must not introduce a shuffle: with both sides bucketed
    // on the key, the only Exchange in the whole plan is the one feeding the
    // final aggregation (an un-bucketed plan has three)
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==")(0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a bucketed shuffle join in:\n$plan")
    // shuffle exchanges only ("+- Exchange (n)"); BroadcastExchange excluded
    val nExchanges = "[+:]- Exchange ".r.findAllIn(plan).length
    assert(nExchanges == 1, s"bucketed join still shuffles ($nExchanges exchanges):\n$plan")
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaBuckets == direct)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    new scala.reflect.io.Directory(new java.io.File("spark-warehouse/li_b")).deleteRecursively()
    new scala.reflect.io.Directory(new java.io.File("spark-warehouse/ord_b")).deleteRecursively()
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
