package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partitioned parquet layout: writing with partitionBy lets every
  * downstream filter on the partition column prune whole directories — at
  * 100 TB the difference between listing five directories and scanning all
  * of them. */
class PartitionedWriteSpec extends SparkSpec {

  test("partitionBy write + filter read prunes to the matching partition") {
    val out = Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    val back = spark.read.parquet(out).filter(col("event_type") === "error")
    assert(back.count() == ev.filter(col("event_type") === "error").count())

    // the scan must carry a partition filter, not a data filter
    back.count() // materialize for AQE
    val plan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n$plan")
  }
}
