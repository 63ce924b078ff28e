package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dev-only spot-bench for the BPE trainer pair: exact ([[TextOps.bpeTrain]],
  * one corpus pass per merge) vs batched ([[TextOps.bpeTrainBatched]], one
  * pass per committed batch) at growing merge counts — the evidence that
  * batched training scales ≪ linearly in merges. Results recorded in
  * BASELINE.md. Run: `sbt "runMain graft.BpePerf"` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.01). */
object BpePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"spot":"$label","rules":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    time("exact_m8")(TextOps.bpeTrain(docs, col("text"), 8).count())
    time("batched_m8")(TextOps.bpeTrainBatched(docs, col("text"), 8).count())
    time("exact_m32")(TextOps.bpeTrain(docs, col("text"), 32).count())
    time("batched_m32")(TextOps.bpeTrainBatched(docs, col("text"), 32).count())
    time("batched_m64")(TextOps.bpeTrainBatched(docs, col("text"), 64).count())
    time("batched_m256_b64")(
      TextOps.bpeTrainBatched(docs, col("text"), 256, batchSize = 64).count())
    spark.stop()
  }
}
